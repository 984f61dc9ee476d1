-- DuckDB oracle SQL for the 'pack' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::sequencePacking
WITH toks AS (
  SELECT doc_id, source,
    CAST(doc_id % 8 AS INT) AS shard,
    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
  FROM documents),
cum AS (
  SELECT *,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY source, shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before
  FROM toks)
SELECT doc_id, source, shard, n_tokens,
  CAST(FLOOR(cum_before / 2048.0) AS BIGINT) AS pack_id,
  CAST(cum_before % 2048 AS BIGINT) AS pack_offset
FROM cum

-- ::embeddingQuantize
WITH mm AS (
  SELECT vec_id, label, embedding,
    CAST(list_min(embedding) AS DOUBLE) AS mn,
    CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings)
SELECT vec_id, label,
  mn AS zero_point,
  (mx - mn) / 255.0 AS scale,
  CASE WHEN mx = mn
    THEN array_to_string(list_transform(embedding, x -> '0'), ',')
    ELSE array_to_string(list_transform(embedding, x ->
      CAST(CAST(LEAST(255.0, FLOOR(
        (CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn))) AS INT) AS VARCHAR)), ',')
  END AS quant
FROM mm

-- ::contextFit
WITH d AS (
  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
    AS n_tokens
  FROM documents),
spine(ctx_len) AS (VALUES (CAST(128 AS BIGINT)), (256), (512), (1024), (2048))
SELECT ctx_len,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN n_tokens <= ctx_len THEN 1 ELSE 0 END) AS BIGINT)
    AS n_fit,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(LEAST(n_tokens, ctx_len)) AS BIGINT) AS kept_tokens,
  CAST((SUM(n_tokens) - SUM(LEAST(n_tokens, ctx_len))) * 1000000
    // SUM(n_tokens) AS BIGINT) AS trunc_ppm
FROM d CROSS JOIN spine
GROUP BY ctx_len

-- ::docChunks
WITH d AS (
  SELECT doc_id,
    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
      AS n
  FROM documents),
c AS (
  SELECT doc_id, n,
    CAST(1 + (GREATEST(0, n - 64) + 47) // 48 AS BIGINT) AS n_chunks
  FROM d)
SELECT doc_id,
  CAST(i + 1 AS BIGINT) AS chunk_id,
  CAST(i * 48 + 1 AS BIGINT) AS start_tok,
  CAST(LEAST(64, n - i * 48) AS BIGINT) AS chunk_len,
  n_chunks
FROM c, unnest(generate_series(0, n_chunks - 1)) t(i)

-- ::quantError
WITH v AS (
  SELECT label, embedding::DOUBLE[] AS dv,
    CAST(list_min(embedding) AS DOUBLE) AS mn,
    CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM embeddings),
e AS (
  SELECT label,
    CASE WHEN mx = mn THEN [CAST(0 AS BIGINT)]
    ELSE list_transform(dv, x -> CAST(floor(abs(
      x - (mn + LEAST(255.0, FLOOR((x - mn) * 255.0 / (mx - mn)))
           * ((mx - mn) / 255.0))) * 1000000000.0 + 0.5) AS BIGINT))
    END AS earr
  FROM v),
pv AS (
  SELECT label, CAST(list_sum(earr) AS BIGINT) AS s_abs,
    CAST(list_max(earr) AS BIGINT) AS m_abs
  FROM e)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(s_abs) // (COUNT(*) * 64) AS BIGINT) AS mean_abs_err_nano,
  CAST(MAX(m_abs) AS BIGINT) AS max_abs_err_nano
FROM pv GROUP BY label


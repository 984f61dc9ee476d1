-- DuckDB oracle SQL for the 'text' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::cleanText
SELECT doc_id,
  substr(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    lower(text), 'http\S+', '', 'g'), '`', '', 'g'), '\bthe\b', '', 'g'),
    '\s+', ' ', 'g')), 1, 30) AS clean_text
FROM documents

-- ::sizeExtract
SELECT p_partkey,
  regexp_extract(p_name, '(?i)(small|large|big|mini|red|blue|hot)', 0) AS size_token,
  trim(regexp_replace(regexp_replace(p_name, '(?i)(small|large|big|mini|red|blue|hot)', '', 'g'), '\s+', ' ', 'g')) AS base_name
FROM part

-- ::stringNormalize
SELECT p_partkey, lower(trim(p_name)) AS p_name, lower(trim(p_brand)) AS p_brand,
  lower(trim(p_type)) AS p_type, p_size, p_retailprice
FROM part

-- ::tokenStats
WITH base AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(length(text) AS INT) AS n_chars_measured,
  (CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(toks)) AS avg_token_len,
  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS punct_count,
  CAST(len(list_filter(toks, x -> lower(x) IN ({{e1}}))) AS INT) AS stopword_count,
  (CAST(len(list_filter(toks, x -> lower(x) IN ({{e1}}))) AS DOUBLE) / len(toks)) AS stopword_ratio
FROM base

-- ::fingerprint
SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
FROM documents

-- ::jsonExtract
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
  COUNT(*) AS n_events
FROM events GROUP BY 1

-- ::multimodalMeta
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INT) AS byte_len,
  sha256(text) AS content_sha256
FROM documents

-- ::bpeTokens
WITH toks AS (
  SELECT doc_id, length(text) AS n_chars,
    regexp_extract_all(text,
      '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+') AS bpe_toks
  FROM documents
)
SELECT doc_id,
  CAST(len(bpe_toks) AS INT) AS n_bpe_tokens,
  CAST(len(list_filter(bpe_toks, x -> regexp_matches(x, '^ ?\p{N}+$'))) AS INT) AS n_number_tokens,
  (CAST(n_chars AS DOUBLE) / len(bpe_toks)) AS chars_per_token
FROM toks

-- ::rollingHash
SELECT doc_id,
  list_reduce(
    list_transform(range(1, length(text) + 1), i -> CAST(ord(text[i]) AS BIGINT)),
    (a, b) -> (a * 31 + b) % 1000000007) AS rolling_hash
FROM documents WHERE length(text) >= 1

-- ::wordFrequencies
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
      FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 20

-- ::piiRedact
WITH seeded AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0
         THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
         THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END
    || CASE WHEN doc_id % 7 = 0
         THEN ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
         ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text, '\+?\d{1,2}-\d{3}-\d{4}')) AS INT) AS n_phones,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
    '\+?\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
FROM seeded

-- ::repetitionRatio
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents),
tris AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1), i ->
        toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
    ELSE [] END AS tris
  FROM toks)
SELECT doc_id,
  CAST(len(tris) AS INT) AS n_trigrams,
  CAST(len(list_distinct(tris)) AS INT) AS n_distinct,
  CASE WHEN len(tris) > 0
    THEN round(1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / len(tris), 6)
    ELSE 0.0 END AS rep_ratio
FROM tris

-- ::qualityClassifier
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents
), per AS (
  SELECT doc_id,
    SUM(('0x' || substr(md5('w:' ||
          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 256)), 1, 15))::BIGINT
        % 1000001 - 500000) AS wsum
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(len(regexp_split_to_array(lower(trim(d.text)), '\s+')) AS INT) AS n_tokens,
  CAST(per.wsum AS BIGINT) AS logit_u,
  per.wsum > 0 AS keep
FROM documents d JOIN per USING (doc_id)

-- ::filterFunnel
WITH d AS (
  SELECT n_chars,
    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_tokens,
    CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
      AS BIGINT) AS n_distinct
  FROM documents),
cls AS (
  SELECT CASE
    WHEN n_chars < 100 THEN 1
    WHEN n_tokens < 15 THEN 2
    WHEN n_chars > n_tokens * 12 THEN 3
    WHEN n_distinct * 10 < n_tokens * 3 THEN 4
    ELSE 0 END AS first_fail
  FROM d),
counts AS (SELECT first_fail, COUNT(*) AS n FROM cls GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts),
stages(stage, rule) AS (VALUES
  (1, 'too_short'), (2, 'too_few_tokens'),
  (3, 'long_words'), (4, 'low_diversity'))
SELECT stage, rule,
  CAST(n_total - COALESCE(SUM(n_dropped) OVER
    (ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    AS BIGINT) AS n_in,
  CAST(n_dropped AS BIGINT) AS n_dropped,
  CAST(n_total - COALESCE(SUM(n_dropped) OVER
    (ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    - n_dropped AS BIGINT) AS n_out
FROM (
  SELECT s.stage, s.rule, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_dropped
  FROM stages s LEFT JOIN counts c ON c.first_fail = s.stage)
CROSS JOIN tot

-- ::thresholdSweep
WITH d AS (
  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
    AS BIGINT) AS n_tokens
  FROM documents),
fan AS (
  SELECT t.min_tokens, d.n_tokens
  FROM d CROSS JOIN (VALUES (20), (40), (60), (80), (100)) t(min_tokens))
SELECT min_tokens,
  CAST(SUM(CASE WHEN n_tokens >= min_tokens THEN 1 ELSE 0 END) AS BIGINT)
    AS docs_kept,
  CAST(SUM(CASE WHEN n_tokens >= min_tokens THEN 1 ELSE 0 END) * 1000000
    // COUNT(*) AS BIGINT) AS docs_ppm,
  CAST(SUM(CASE WHEN n_tokens >= min_tokens THEN n_tokens ELSE 0 END)
    AS BIGINT) AS tokens_kept,
  CAST(SUM(CASE WHEN n_tokens >= min_tokens THEN n_tokens ELSE 0 END)
    * 1000000 // SUM(n_tokens) AS BIGINT) AS tokens_ppm
FROM fan GROUP BY min_tokens

-- ::tokenFertility
WITH d AS (
  SELECT lang, n_chars,
    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_words,
    CAST(len(regexp_extract_all(text,
      '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
      AS BIGINT) AS n_bpe
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_words) AS BIGINT) AS n_words,
  CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
  CAST(SUM(n_bpe) * 1000000 // SUM(n_words) AS BIGINT) AS fertility_ppm,
  CAST(SUM(n_chars) * 1000000 // SUM(n_bpe) AS BIGINT)
    AS chars_per_token_ppm
FROM d GROUP BY lang

-- ::curriculumPhases
WITH d AS (
  SELECT doc_id,
    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_tokens,
    CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
      AS BIGINT) AS n_distinct
  FROM documents),
scored AS (
  SELECT doc_id, n_tokens,
    CAST(n_distinct * 1000000 // n_tokens AS BIGINT) AS score_ppm
  FROM d),
phased AS (
  SELECT n_tokens, score_ppm,
    CAST(ntile(4) OVER (ORDER BY score_ppm, doc_id) AS INT) AS phase
  FROM scored)
SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
  CAST(MAX(score_ppm) AS BIGINT) AS max_score_ppm
FROM phased GROUP BY phase

-- ::boilerplatePrefixes
WITH d AS (
  SELECT doc_id, source,
    list_aggregate(regexp_split_to_array(lower(trim(text)), '\s+')[1:4],
      'string_agg', ' ') AS prefix
  FROM documents)
SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(MIN(doc_id) AS BIGINT) AS example_doc_id
FROM d GROUP BY prefix
HAVING COUNT(*) >= 2

-- ::sourceQualityMatrix
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents
), per AS (
  SELECT doc_id,
    SUM(('0x' || substr(md5('w:' ||
          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 256)), 1, 15))::BIGINT
        % 1000001 - 500000) AS wsum
  FROM toks GROUP BY doc_id
), scored AS (
  SELECT d.source,
    CAST(len(regexp_split_to_array(lower(trim(d.text)), '\s+')) AS BIGINT)
      AS n_tokens,
    CASE WHEN per.wsum < -500000 THEN 'strong_drop'
         WHEN per.wsum < 0 THEN 'drop'
         WHEN per.wsum < 500000 THEN 'keep'
         ELSE 'strong_keep' END AS band
  FROM documents d JOIN per USING (doc_id)
), m AS (
  SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM scored GROUP BY source, band)
SELECT source, band, n_docs, n_tokens,
  CAST(n_docs * 1000000 // SUM(n_docs) OVER (PARTITION BY source)
    AS BIGINT) AS share_ppm
FROM m

-- ::gopherRepetition
WITH base AS (
  SELECT doc_id, source,
    regexp_split_to_array(lower(trim(text)), '\s+') AS tk
  FROM documents),
g AS (
  SELECT doc_id, 2 AS n, tk[i] || ' ' || tk[i + 1] AS g
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM base)
  UNION ALL
  SELECT doc_id, 3, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i FROM base)),
c AS (SELECT doc_id, n, g, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
m AS (SELECT doc_id, n, MAX(c) AS max_c FROM c GROUP BY 1, 2),
d AS (
  SELECT doc_id,
    MAX(CASE WHEN n = 2 THEN max_c END) AS m2,
    MAX(CASE WHEN n = 3 THEN max_c END) AS m3
  FROM m GROUP BY 1),
p AS (
  SELECT b.doc_id, b.source,
    COALESCE(CAST(1000000 * 2 * d.m2 AS BIGINT) // CAST(len(b.tk) AS BIGINT), 0)
      AS frac2_ppm,
    COALESCE(CAST(1000000 * 3 * d.m3 AS BIGINT) // CAST(len(b.tk) AS BIGINT), 0)
      AS frac3_ppm
  FROM base b LEFT JOIN d USING (doc_id))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN frac2_ppm > 200000 THEN 1 ELSE 0 END) AS BIGINT)
    AS flagged_2g,
  CAST(SUM(CASE WHEN frac3_ppm > 180000 THEN 1 ELSE 0 END) AS BIGINT)
    AS flagged_3g,
  CAST(CAST(SUM(frac2_ppm) AS BIGINT) // COUNT(*) AS BIGINT)
    AS mean_frac2_ppm,
  CAST(CAST(SUM(frac3_ppm) AS BIGINT) // COUNT(*) AS BIGINT)
    AS mean_frac3_ppm
FROM p GROUP BY source

-- ::qualityLengthCorr
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents
), per AS (
  SELECT doc_id,
    CAST(SUM(('0x' || substr(md5('w:' ||
          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 256)), 1, 15))::BIGINT
        % 1000001 - 500000) AS BIGINT) AS logit_u
  FROM toks GROUP BY doc_id
), r AS (
  SELECT d.source,
    row_number() OVER (PARTITION BY d.source
      ORDER BY per.logit_u, d.doc_id) AS rx,
    row_number() OVER (PARTITION BY d.source
      ORDER BY d.n_chars, d.doc_id) AS ry
  FROM documents d JOIN per ON per.doc_id = d.doc_id)
SELECT source, COUNT(*) AS n,
  CAST(CAST(SUM(CAST((rx - ry) * (rx - ry) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_d2,
  1.0 - 6.0 * CAST(SUM(CAST((rx - ry) * (rx - ry) AS BIGINT)) AS DOUBLE) /
    (CAST(COUNT(*) AS DOUBLE) *
      (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) - 1.0)) AS rho
FROM r GROUP BY 1

-- ::sentenceStats
WITH s AS (
  SELECT source,
    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
      s -> trim(s)), s -> s <> '') AS sents
  FROM documents),
p AS (
  SELECT source, CAST(len(sents) AS BIGINT) AS n_sents,
    CAST(COALESCE(list_sum(list_transform(sents,
      x -> len(regexp_split_to_array(x, '\s+')))), 0) AS BIGINT)
      AS n_toks
  FROM s)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_sents) AS BIGINT) AS n_sents,
  CAST(SUM(n_toks) AS BIGINT) AS n_sent_toks,
  CAST(CAST(SUM(n_sents) * 100 AS BIGINT) // COUNT(*) AS BIGINT)
    AS mean_sents_per_doc_c,
  CAST(CASE WHEN SUM(n_sents) > 0
       THEN CAST(SUM(n_toks) * 100 AS BIGINT) // CAST(SUM(n_sents) AS BIGINT)
       ELSE 0 END AS BIGINT) AS mean_toks_per_sent_c
FROM p GROUP BY source


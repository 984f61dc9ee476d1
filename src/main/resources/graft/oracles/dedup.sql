-- DuckDB oracle SQL for the 'dedup' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::dedupExact
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)

-- ::minhashPairs
{{minhashCtes}}
SELECT doc_a, doc_b FROM pairs

-- ::ngramJaccardPairs
{{minhashCtes}}, shs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM w WHERE len(toks) >= 3
), jac AS (
  SELECT doc_a, doc_b,
    (CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))) AS jaccard
  FROM pairs JOIN shs sa ON doc_a = sa.doc_id JOIN shs sb ON doc_b = sb.doc_id
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.3

-- ::neardupComponents
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
)
SELECT src AS id, LEAST(src, MIN(dst)) AS component
FROM reach GROUP BY src

-- ::simhashSigs
WITH toks AS (
  SELECT DISTINCT doc_id,
    unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, j, CAST((h >> j) & 1 AS INT) AS bitval
  FROM hashed CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
), votes AS (
  SELECT doc_id, j, SUM(bitval) AS cnt, COUNT(*) AS n
  FROM bits GROUP BY doc_id, j
)
SELECT doc_id,
  CAST(SUM(CASE WHEN cnt * 2 >= n THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id

-- ::fuzzyPartNames
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
  a.p_name AS name_a, b.p_name AS name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
FROM part a JOIN part b
  ON a.p_type = b.p_type AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey AND a.p_name <> b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3

-- ::decontamination
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents),
sh AS (
  SELECT doc_id, source, unnest(list_distinct(list_transform(range(1, len(w) - 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM toks WHERE len(w) >= 3),
freq AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50),
ev AS (SELECT doc_id AS eval_id, shingle FROM sh JOIN freq USING (shingle)
       WHERE source = 'src0'),
tr AS (SELECT doc_id AS train_id, shingle FROM sh JOIN freq USING (shingle)
       WHERE source <> 'src0'),
etot AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_eval FROM ev GROUP BY eval_id),
pairs AS (
  SELECT eval_id, train_id, CAST(count(*) AS BIGINT) AS shared
  FROM ev JOIN tr USING (shingle) GROUP BY eval_id, train_id)
SELECT pairs.eval_id, train_id, shared, n_eval,
  round(CAST(shared AS DOUBLE) / n_eval, 6) AS containment
FROM pairs JOIN etot USING (eval_id)
WHERE CAST(shared AS DOUBLE) / n_eval >= 0.5

-- ::curateAndPack
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
), surv AS (
  SELECT * FROM documents
  WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
), toks AS (
  SELECT doc_id, source,
    CAST(doc_id % 8 AS INT) AS shard,
    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
  FROM surv),
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

-- ::qualitySurvivor
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
), logits AS (
  SELECT doc_id,
    CAST(SUM(('0x' || substr(md5('w:' ||
          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 256)), 1, 15))::BIGINT
        % 1000001 - 500000) AS BIGINT) AS logit_u
  FROM (
    SELECT doc_id,
      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
    FROM documents) GROUP BY doc_id
), scored AS (
  SELECT comp.component, comp.id, logits.logit_u
  FROM comp JOIN logits ON logits.doc_id = comp.id)
SELECT component, id AS survivor_id, logit_u AS survivor_logit_u,
  cluster_size
FROM (
  SELECT component, id, logit_u,
    COUNT(*) OVER (PARTITION BY component) AS cluster_size,
    row_number() OVER (PARTITION BY component
                       ORDER BY logit_u DESC, id) AS rn
  FROM scored)
WHERE rn = 1

-- ::dedupImpact
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
), logits AS (
  SELECT doc_id,
    CAST(SUM(('0x' || substr(md5('w:' ||
          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 256)), 1, 15))::BIGINT
        % 1000001 - 500000) AS BIGINT) AS logit_u
  FROM (
    SELECT doc_id,
      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
    FROM documents) GROUP BY doc_id
), surv AS (
  SELECT component, id AS survivor_id
  FROM (
    SELECT comp.component, comp.id,
      row_number() OVER (PARTITION BY comp.component
        ORDER BY logits.logit_u DESC, comp.id) AS rn
    FROM comp JOIN logits ON logits.doc_id = comp.id)
  WHERE rn = 1
), j AS (
  SELECT d.source, d.n_chars,
    (c.component IS NULL OR s.survivor_id = d.doc_id) AS kept
  FROM documents d
  LEFT JOIN comp c ON c.id = d.doc_id
  LEFT JOIN surv s ON s.component = c.component)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before,
  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
  CAST(SUM(n_chars) AS BIGINT) AS chars_before,
  CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT)
    AS chars_after,
  CAST(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1000000 AS BIGINT)
    // COUNT(*) AS BIGINT) AS retained_ppm
FROM j GROUP BY source

-- ::curateV2
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
), logits AS (
  SELECT doc_id,
    CAST(SUM(('0x' || substr(md5('w:' ||
          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 256)), 1, 15))::BIGINT
        % 1000001 - 500000) AS BIGINT) AS logit_u
  FROM (
    SELECT doc_id,
      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
    FROM documents) GROUP BY doc_id
), losers AS (
  SELECT id FROM (
    SELECT comp.id,
      row_number() OVER (PARTITION BY comp.component
                         ORDER BY logits.logit_u DESC, comp.id) AS rn
    FROM comp JOIN logits ON logits.doc_id = comp.id)
  WHERE rn > 1
), surv AS (
  SELECT * FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
), per AS (
  SELECT source, SUM(n_chars) AS chars_s,
    GREATEST(1, SUM(n_chars) // 1000) AS ks_s,
    ('0x' || substr(md5(source), 1, 15))::BIGINT % 5 + 1 AS w_s
  FROM surv GROUP BY source
), tot AS (SELECT SUM(n_chars) // 1000 AS ks_tot FROM surv),
sw AS (SELECT SUM(w_s) AS sum_w FROM per),
rates AS (
  SELECT source,
    LEAST(1000000, (ks_tot * 2 // 5) * w_s // sum_w * 1000000 // ks_s)
      AS rate_u
  FROM per CROSS JOIN tot CROSS JOIN sw
), kept AS (
  SELECT s.* FROM surv s JOIN rates r USING (source)
  WHERE (('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT
         % 1000000) < r.rate_u
), toks AS (
  SELECT doc_id, source,
    CAST(doc_id % 8 AS INT) AS shard,
    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
  FROM kept
), cum AS (
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

-- ::clusterSizes
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
), sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM documents),
cov AS (SELECT COUNT(*) AS n_cov FROM comp)
SELECT CAST(sz AS BIGINT) AS cluster_size,
  CAST(COUNT(*) AS BIGINT) AS n_clusters,
  CAST(sz * COUNT(*) AS BIGINT) AS n_docs
FROM sizes GROUP BY sz
UNION ALL
SELECT CAST(1 AS BIGINT), CAST(n_total - n_cov AS BIGINT),
  CAST(n_total - n_cov AS BIGINT)
FROM tot CROSS JOIN cov

-- ::crossSourceDups
{{minhashCtes}}
SELECT LEAST(da.source, db.source) AS source_x,
  GREATEST(da.source, db.source) AS source_y,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY 1, 2

-- ::ngramNovelty
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
  FROM w WHERE len(toks) >= 3),
own AS (SELECT shingle, MIN(doc_id) AS owner FROM sh GROUP BY 1)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(SUM(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  CAST(SUM(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) * 1000000
    // COUNT(*) AS BIGINT) AS novelty_ppm
FROM sh JOIN own USING (shingle)
GROUP BY doc_id

-- ::lshCalibration
{{minhashCtes}}, pc AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  JOIN ok_buckets k ON a.band = k.band AND a.band_key = k.band_key
  GROUP BY 1, 2),
shs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM w WHERE len(toks) >= 3),
jac AS (
  SELECT pc.n_bands,
    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4)
      AS jr
  FROM pc
  JOIN shs sa ON sa.doc_id = pc.doc_a
  JOIN shs sb ON sb.doc_id = pc.doc_b)
SELECT CAST(n_bands AS BIGINT) AS n_bands,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  round(CAST(SUM(CAST(jr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
    AS mean_jaccard
FROM jac GROUP BY n_bands

-- ::splitLeakage
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
  FROM w WHERE len(toks) >= 3),
spd AS (
  SELECT doc_id,
    CASE WHEN v < 3435973836 THEN 'train'
         WHEN v < 3865470566 THEN 'val'
         ELSE 'test' END AS split
  FROM (
    SELECT DISTINCT doc_id,
      ('0x' || substr(md5('split' || '|' || CAST(doc_id AS VARCHAR)),
                      1, 8))::BIGINT AS v
    FROM sh)),
tr AS (
  SELECT DISTINCT shingle FROM sh JOIN spd USING (doc_id)
  WHERE split = 'train'),
leaked AS (
  SELECT DISTINCT s.doc_id
  FROM sh s JOIN spd p ON s.doc_id = p.doc_id AND p.split = 'test'
  WHERE EXISTS (SELECT 1 FROM tr WHERE tr.shingle = s.shingle))
SELECT
  CAST((SELECT COUNT(*) FROM spd WHERE split = 'train') AS BIGINT)
    AS n_train_docs,
  CAST((SELECT COUNT(*) FROM spd WHERE split = 'test') AS BIGINT)
    AS n_test_docs,
  CAST((SELECT COUNT(*) FROM leaked) AS BIGINT) AS n_leaked_test_docs,
  CAST((SELECT COUNT(*) FROM leaked) * 1000000
    // (SELECT COUNT(*) FROM spd WHERE split = 'test') AS BIGINT)
    AS leak_ppm

-- ::clusterSourcePurity
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
)
SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
  (COUNT(DISTINCT d.source) > 1) AS cross_source
FROM comp c JOIN documents d ON d.doc_id = c.id
GROUP BY component
HAVING COUNT(*) >= 2

-- ::hashCollisionAudit
WITH pre AS (
  SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv,
    md5(text) AS tm, COUNT(*) AS c
  FROM documents GROUP BY 1, 2),
per AS (
  SELECT hv, COUNT(DISTINCT tm) AS n_texts, SUM(c) AS n_docs
  FROM pre GROUP BY hv)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
  CAST(SUM(CASE WHEN n_texts > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_colliding_hashes,
  CAST(MAX(n_texts) AS BIGINT) AS max_group_texts,
  CAST(SUM(n_docs) AS BIGINT) AS n_docs_total
FROM per

-- ::bloomDecontam
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
sh AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(range(1, len(toks) - 3),
      i -> array_to_string(toks[i:i+4], ' ')))) AS shingle
  FROM w WHERE len(toks) >= 5),
spd AS (
  SELECT doc_id, source,
    CASE WHEN v < 3435973836 THEN 'train'
         WHEN v < 3865470566 THEN 'val'
         ELSE 'test' END AS split
  FROM (
    SELECT doc_id, source,
      ('0x' || substr(md5('split' || '|' || CAST(doc_id AS VARCHAR)),
                      1, 8))::BIGINT AS v
    FROM documents)),
ev AS (
  SELECT DISTINCT shingle FROM sh JOIN spd USING (doc_id)
  WHERE split = 'test'),
hs AS (
  SELECT shingle,
    ('0x' || substr(md5('bf1:' || shingle), 1, 15))::BIGINT % 1048576 AS i1,
    ('0x' || substr(md5('bf2:' || shingle), 1, 15))::BIGINT % 1048576 AS i2
  FROM ev),
bloom AS (
  SELECT wd, bit_or(bv) AS bits FROM (
    SELECT i1 // 32 AS wd, 1::BIGINT << CAST(i1 % 32 AS INT) AS bv FROM hs
    UNION ALL
    SELECT i2 // 32, 1::BIGINT << CAST(i2 % 32 AS INT) FROM hs)
  GROUP BY wd),
tr AS (
  SELECT s.doc_id, s.shingle,
    ('0x' || substr(md5('bf1:' || s.shingle), 1, 15))::BIGINT % 1048576 AS i1,
    ('0x' || substr(md5('bf2:' || s.shingle), 1, 15))::BIGINT % 1048576 AS i2
  FROM sh s JOIN spd USING (doc_id) WHERE split = 'train'),
bfdocs AS (
  SELECT DISTINCT p.doc_id FROM tr p
  LEFT JOIN bloom b1 ON b1.wd = p.i1 // 32
  LEFT JOIN bloom b2 ON b2.wd = p.i2 // 32
  WHERE (COALESCE(b1.bits, 0) & (1::BIGINT << CAST(p.i1 % 32 AS INT))) != 0
    AND (COALESCE(b2.bits, 0) & (1::BIGINT << CAST(p.i2 % 32 AS INT))) != 0),
exdocs AS (
  SELECT DISTINCT s.doc_id FROM tr s
  WHERE EXISTS (SELECT 1 FROM ev WHERE ev.shingle = s.shingle))
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_train_docs,
  CAST(SUM(CASE WHEN bf.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS bloom_flagged,
  CAST(SUM(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS exact_hits,
  CAST(SUM(CASE WHEN bf.doc_id IS NOT NULL THEN 1 ELSE 0 END)
     - SUM(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS fp_docs,
  CAST((SUM(CASE WHEN bf.doc_id IS NOT NULL THEN 1 ELSE 0 END)
      - SUM(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END)) * 1000000
    // COUNT(*) AS BIGINT) AS fp_ppm
FROM spd d
LEFT JOIN bfdocs bf ON bf.doc_id = d.doc_id
LEFT JOIN exdocs ex ON ex.doc_id = d.doc_id
WHERE d.split = 'train'
GROUP BY d.source

-- ::cdcChunks
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
cu AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) >= 5 THEN
      list_filter(list_transform(range(4, len(toks)), i ->
        CASE WHEN ('0x' || substr(md5('cdc:' ||
            array_to_string(toks[i-3:i], ' ')), 1, 15))::BIGINT % 16 = 0
        THEN i END), x -> x IS NOT NULL)
    ELSE [] END AS cuts
  FROM w),
b AS (
  SELECT doc_id, toks,
    list_concat(list_concat([0], cuts), [len(toks)]) AS bounds
  FROM cu),
ch AS (
  SELECT doc_id,
    unnest(list_transform(range(2, len(bounds) + 1), j ->
      array_to_string(toks[bounds[j-1]+1:bounds[j]], ' '))) AS txt
  FROM b),
g AS (
  SELECT CASE WHEN len(string_split(txt, ' ')) <= 8 THEN '01-08'
              WHEN len(string_split(txt, ' ')) <= 16 THEN '09-16'
              WHEN len(string_split(txt, ' ')) <= 32 THEN '17-32'
              ELSE '33+' END AS bucket,
    md5(txt) AS h
  FROM ch),
per AS (SELECT bucket, h, COUNT(*) AS c FROM g GROUP BY 1, 2)
SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_chunks,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
  CAST(MAX(c) AS BIGINT) AS max_copies,
  CAST((SUM(c) - COUNT(*)) * 1000000 // SUM(c) AS BIGINT) AS dup_ppm
FROM per GROUP BY bucket

-- ::winnowing
WITH w AS (
  SELECT doc_id, source,
    regexp_split_to_array(lower(trim(text)), '\s+') AS ws
  FROM documents),
e AS (
  SELECT doc_id, source, CAST(len(ws) - 2 AS BIGINT) AS g, ws
  FROM w WHERE len(ws) >= 6),
kh AS (
  SELECT doc_id, source, g, unnest(range(1, len(ws) - 1)) AS i, ws
  FROM e),
kv AS (
  SELECT doc_id, source, g, i,
    ('0x' || substr(md5(ws[CAST(i AS INT)] || ' ' ||
       ws[CAST(i AS INT) + 1] || ' ' ||
       ws[CAST(i AS INT) + 2]), 1, 15))::BIGINT AS h
  FROM kh),
mn AS (
  SELECT doc_id, source, g, i,
    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
  FROM kv),
sel AS (
  SELECT DISTINCT doc_id, source, mh
  FROM mn WHERE i <= g - 3),
perdoc AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS s
  FROM sel GROUP BY 1, 2),
dfreq AS (SELECT mh, COUNT(*) AS df FROM sel GROUP BY mh),
dup AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS dup_fp
  FROM sel JOIN dfreq USING (mh) WHERE df >= 2 GROUP BY source),
per AS (
  SELECT e.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(e.g) AS BIGINT) AS n_grams,
    CAST(SUM(perdoc.s) AS BIGINT) AS n_fps
  FROM e JOIN perdoc USING (doc_id) GROUP BY e.source)
SELECT per.source, n_docs, n_grams, n_fps,
  CAST(n_fps * 1000000 // n_grams AS BIGINT) AS density_ppm,
  CAST(COALESCE(dup.dup_fp, 0) AS BIGINT) AS dup_fp,
  CAST(COALESCE(dup.dup_fp, 0) * 1000000 // n_fps AS BIGINT) AS dup_ppm
FROM per LEFT JOIN dup ON per.source = dup.source

-- ::containmentProfile
{{minhashCtes}}, shs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM w WHERE len(toks) >= 3
), prof AS (
  SELECT
    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
    CAST(len(sa.sh) AS BIGINT) AS na,
    CAST(len(sb.sh) AS BIGINT) AS nb
  FROM pairs JOIN shs sa ON doc_a = sa.doc_id
             JOIN shs sb ON doc_b = sb.doc_id
), pp AS (
  SELECT inter * 1000000 // LEAST(na, nb) AS cont_ppm,
    inter * 1000000 // (na + nb - inter) AS jac_ppm
  FROM prof)
SELECT CAST(cont_ppm // 250000 AS BIGINT) AS cont_band,
  CAST(jac_ppm // 250000 AS BIGINT) AS jac_band,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(CASE WHEN cont_ppm >= 900000 AND jac_ppm < 500000
    THEN 1 ELSE 0 END) AS BIGINT) AS n_subset_dups
FROM pp GROUP BY 1, 2

-- ::softDedupWeights
{{minhashCtes}}, edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
  ) SELECT src, dst FROM r
), comp AS (
  SELECT src AS id, LEAST(src, MIN(dst)) AS component
  FROM reach GROUP BY src
), sizes AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY 1),
ws AS (
  SELECT d.doc_id, d.source, COALESCE(s.csize, 1) AS csize
  FROM documents d LEFT JOIN
    (SELECT id, csize FROM comp JOIN sizes USING (component)) s
    ON d.doc_id = s.id)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_in_clusters,
  CAST(SUM(1000000 // csize) AS BIGINT) AS eff_docs_ppm,
  CAST(SUM(1000000 // csize) // COUNT(*) AS BIGINT) AS eff_ratio_ppm
FROM ws GROUP BY source


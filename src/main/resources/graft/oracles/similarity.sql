-- DuckDB oracle SQL for the 'similarity' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::annTopK
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings
), n AS (
  SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nrm FROM v
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
    round(list_dot_product(q.dv, c.dv) / (q.nrm * c.nrm), 4) AS sim
  FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id
)
SELECT q_id, neighbor_id, sim,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 10

-- ::embeddingNearDup
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings
), n AS (
  SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nrm FROM v
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm), 4) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm), 4) >= 0.35

-- ::lshNearDup
{{lshCtes}}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm), 4) AS cosine
FROM n a
JOIN sigs sa ON a.vec_id = sa.vec_id
JOIN bsz ON bsz.sig = sa.sig AND bsz.n BETWEEN 2 AND 4096
JOIN sigs sb ON sa.sig = sb.sig
JOIN n b ON b.vec_id = sb.vec_id AND a.vec_id < b.vec_id
WHERE list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm) >= 0.35

-- ::embeddingGramian
WITH pairs AS (
  SELECT t1.i AS i, t2.j AS j
  FROM range(1, 65) t1(i), range(1, 65) t2(j)
  WHERE t1.i <= t2.j),
terms AS (
  SELECT p.i, p.j,
    CAST(round(CAST(embedding[p.i] AS DOUBLE) *
               CAST(embedding[p.j] AS DOUBLE) * 1000000) AS BIGINT) AS u
  FROM embeddings e, pairs p)
SELECT i, j, CAST(SUM(u) AS BIGINT) AS gram_u, COUNT(*) AS n,
  CAST(SUM(u) AS BIGINT) / 1000000.0 AS gram
FROM terms GROUP BY 1, 2

-- ::effectiveRank
WITH pairs AS (
  SELECT t1.i AS i, t2.j AS j
  FROM range(1, 65) t1(i), range(1, 65) t2(j)
  WHERE t1.i <= t2.j),
terms AS (
  SELECT p.i, p.j,
    CAST(round(CAST(embedding[p.i] AS DOUBLE) *
               CAST(embedding[p.j] AS DOUBLE) * 1000000) AS BIGINT) AS u
  FROM embeddings e, pairs p),
g AS (
  SELECT i, j, CAST(SUM(u) AS BIGINT) AS gram_u
  FROM terms GROUP BY 1, 2),
tr AS (SELECT CAST(SUM(gram_u) AS BIGINT) AS trace_u FROM g WHERE i = j),
fro AS (
  SELECT SUM(CASE WHEN i = j
    THEN CAST(gram_u AS HUGEINT) * gram_u
    ELSE 2 * CAST(gram_u AS HUGEINT) * gram_u END) AS fro2
  FROM g),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings)
SELECT n_vecs, CAST(64 AS BIGINT) AS dim, trace_u,
  CAST((CAST(trace_u AS HUGEINT) * trace_u * 1000) // fro2 AS BIGINT)
    AS pr_milli
FROM n CROSS JOIN tr CROSS JOIN fro

-- ::labelEffectiveRank
WITH pairs AS (
  SELECT t1.i AS i, t2.j AS j
  FROM range(1, 65) t1(i), range(1, 65) t2(j)
  WHERE t1.i <= t2.j),
terms AS (
  SELECT e.label, p.i, p.j,
    CAST(round(CAST(embedding[p.i] AS DOUBLE) *
               CAST(embedding[p.j] AS DOUBLE) * 1000000) AS BIGINT) AS u
  FROM embeddings e, pairs p),
g AS (
  SELECT label, i, j, CAST(SUM(u) AS BIGINT) AS gram_u
  FROM terms GROUP BY 1, 2, 3),
tr AS (SELECT label, CAST(SUM(gram_u) AS BIGINT) AS trace_u
       FROM g WHERE i = j GROUP BY 1),
fro AS (
  SELECT label, SUM(CASE WHEN i = j
    THEN CAST(gram_u AS HUGEINT) * gram_u
    ELSE 2 * CAST(gram_u AS HUGEINT) * gram_u END) AS fro2
  FROM g GROUP BY 1),
n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM embeddings GROUP BY 1)
SELECT n.label, n_vecs, CAST(64 AS BIGINT) AS dim, trace_u,
  CAST((CAST(trace_u AS HUGEINT) * trace_u * 1000) // fro2 AS BIGINT)
    AS pr_milli
FROM n JOIN tr ON n.label = tr.label
JOIN fro ON n.label = fro.label

-- ::kmeansEmbed
{{kmeansCtes}}
SELECT vec_id, cluster, dist_u FROM asg

-- ::semanticDedup
{{kmeansCtes}},
nv AS (
  SELECT vec_id, embedding::DOUBLE[] AS dv,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      AS nrm
  FROM embeddings),
csz AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM asg GROUP BY 1),
m AS (
  SELECT a.cluster, n.vec_id, n.dv, n.nrm
  FROM nv n JOIN asg a USING (vec_id)
  JOIN csz USING (cluster) WHERE csz.n_vectors <= 4096),
pr AS (
  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b
  FROM m a JOIN m b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm) >= 0.35),
np AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pr GROUP BY 1),
nd AS (
  SELECT cluster, CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_dropped
  FROM pr GROUP BY 1)
SELECT csz.cluster, n_vectors,
  CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(COALESCE(n_dropped, 0) AS BIGINT) AS n_dropped,
  CAST((n_vectors - COALESCE(n_dropped, 0)) * 1000000 // n_vectors
    AS BIGINT) AS kept_ppm
FROM csz LEFT JOIN np USING (cluster) LEFT JOIN nd USING (cluster)

-- ::labelCosineAudit
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS dv, label,
    ('0x' || substr(md5('pair:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
      AS h
  FROM embeddings),
b AS (SELECT *, h % 64 AS bucket FROM v),
p AS (
  SELECT vec_id, dv, label,
    lead(dv) OVER w AS dv_b,
    lead(vec_id) OVER w AS id_b,
    lead(label) OVER w AS label_b
  FROM b WINDOW w AS (PARTITION BY bucket ORDER BY h, vec_id)),
scored AS (
  SELECT (label = label_b) AS same_label,
    CAST(round(list_dot_product(dv, dv_b)
      / (sqrt(list_dot_product(dv, dv)) * sqrt(list_dot_product(dv_b, dv_b))),
      6) AS DECIMAL(18,6)) AS cos
  FROM p WHERE id_b IS NOT NULL)
SELECT same_label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
  round(CAST(SUM(cos) AS DOUBLE) / COUNT(*), 6) AS mean_cosine
FROM scored GROUP BY same_label

-- ::hardNegatives
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS dv FROM embeddings
), n AS (
  SELECT vec_id, label, dv, sqrt(list_dot_product(dv, dv)) AS nrm FROM v
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
    c.label AS neighbor_label,
    CAST(round(list_dot_product(q.dv, c.dv) / (q.nrm * c.nrm) * 1000000)
      AS BIGINT) AS cos_u
  FROM n q JOIN n c ON q.vec_id < 20 AND c.label <> q.label
)
SELECT q_id, CAST(rank AS INT) AS rank, neighbor_id, neighbor_label,
  cos_u
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
    ORDER BY cos_u DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 5

-- ::embeddingNormAudit
WITH v AS (
  SELECT vec_id, label,
    CAST(round(sqrt(list_dot_product(embedding::DOUBLE[],
      embedding::DOUBLE[])) * 1000000) AS BIGINT) AS norm_u
  FROM embeddings
), med AS (SELECT quantile_cont(norm_u, 0.5) AS med FROM v)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(trunc(CAST(SUM(norm_u) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_u,
  CAST(MIN(norm_u) AS BIGINT) AS min_u,
  CAST(MAX(norm_u) AS BIGINT) AS max_u,
  CAST(SUM(CASE WHEN norm_u * 2 < med OR norm_u > med * 2
       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM v, med GROUP BY label

-- ::embeddingSplitLeakage
{{lshCtes}}, pr AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM n a
  JOIN sigs sa ON a.vec_id = sa.vec_id
  JOIN bsz ON bsz.sig = sa.sig AND bsz.n BETWEEN 2 AND 4096
  JOIN sigs sb ON sa.sig = sb.sig
  JOIN n b ON b.vec_id = sb.vec_id AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm) >= 0.35
), tag AS (
  SELECT vec_id,
    CASE WHEN ('0x' || substr(md5('split' || '|' ||
           CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT < 3435973836
         THEN 'train'
         WHEN ('0x' || substr(md5('split' || '|' ||
           CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT < 3865470566
         THEN 'val' ELSE 'test' END AS split
  FROM embeddings
), cr AS (
  SELECT p.id_a, p.id_b, ta.split AS sa, tb.split AS sb
  FROM pr p
  JOIN tag ta ON ta.vec_id = p.id_a
  JOIN tag tb ON tb.vec_id = p.id_b
), leaked AS (
  SELECT DISTINCT id, split FROM (
    SELECT id_b AS id, sb AS split FROM cr
    WHERE sa = 'train' AND sb <> 'train'
    UNION ALL
    SELECT id_a, sa FROM cr WHERE sb = 'train' AND sa <> 'train')
), lk AS (
  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_leaked
  FROM leaked GROUP BY 1
), tot AS (
  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM tag WHERE split <> 'train' GROUP BY 1)
SELECT tot.split, n_vectors,
  CAST(COALESCE(n_leaked, 0) AS BIGINT) AS n_leaked,
  CAST(CAST(COALESCE(n_leaked, 0) * 1000000 AS BIGINT) // n_vectors
    AS BIGINT) AS leaked_ppm
FROM tot LEFT JOIN lk USING (split)

-- ::annNdcg
{{lshCtes}},
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS id,
    CAST(round(list_dot_product(q.dv, c.dv) / (q.nrm * c.nrm) * 1000000)
      AS BIGINT) AS cos_u
  FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
ex AS (
  SELECT q_id, id, rk AS ex_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_u DESC, id) AS rk FROM scored) WHERE rk <= 10),
idcg AS (
  SELECT q_id,
    CAST(SUM(CAST(round((11 - ex_rank) * 1000000 / log2(ex_rank + 1))
      AS BIGINT)) AS BIGINT) AS idcg_u
  FROM ex GROUP BY 1),
cand AS (
  SELECT s.q_id, s.id, s.cos_u FROM scored s
  JOIN sigs sq ON sq.vec_id = s.q_id
  JOIN sigs sc ON sc.vec_id = s.id AND sc.sig = sq.sig),
ap AS (
  SELECT q_id, id, rk AS pos FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_u DESC, id) AS rk FROM cand) WHERE rk <= 10),
rel AS (
  SELECT a.q_id, a.pos, COALESCE(11 - e.ex_rank, 0) AS rel
  FROM ap a LEFT JOIN ex e ON e.q_id = a.q_id AND e.id = a.id),
per AS (
  SELECT q_id,
    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
    CAST(SUM(CAST(round(rel * 1000000 / log2(pos + 1)) AS BIGINT))
      AS BIGINT) AS dcg_u,
    CAST(MAX(CASE WHEN rel > 0 THEN 1000000 // pos ELSE 0 END)
      AS BIGINT) AS mrr_u
  FROM rel GROUP BY 1)
SELECT per.q_id, n_hits, dcg_u, idcg_u,
  CAST(dcg_u * 1000000 // idcg_u AS BIGINT) AS ndcg_ppm, mrr_u
FROM per JOIN idcg USING (q_id)


-- DuckDB oracle SQL for the 'stats' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::deterministicSample
SELECT doc_id, lang, n_chars,
  (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100) AS bucket
FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100) < 10

-- ::stratifiedSample
SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
  CAST(row_number() OVER (
    PARTITION BY l_returnflag, l_linestatus
    ORDER BY md5(l_orderkey || '|' || l_linenumber || '|' || l_partkey || '|' || l_suppkey),
      l_orderkey, l_linenumber, l_partkey, l_suppkey) AS INT) AS rk
FROM lineitem
QUALIFY rk <= 50

-- ::priceHistogram
SELECT CAST(floor(l_extendedprice / 5500.0) AS BIGINT) AS bucket,
  COUNT(*) AS n, MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
FROM lineitem GROUP BY 1

-- ::moments
SELECT l_returnflag,
  round(stddev_samp(l_extendedprice), 6) AS price_stddev,
  round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar,
  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
FROM lineitem GROUP BY l_returnflag

-- ::regionSummary
SELECT r_name,
  string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
  COUNT(s_suppkey) AS n_suppliers,
  COUNT(CASE WHEN s_acctbal > 0.0 THEN 1 END) AS n_positive_bal,
  bool_or(s_acctbal < 0.0) AS has_negative_bal
FROM nation
JOIN region ON n_regionkey = r_regionkey
LEFT JOIN supplier ON s_nationkey = n_nationkey
GROUP BY r_name

-- ::dateFunctions
SELECT o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  greatest(o_totalprice, 50000.0) AS price_floor_50k,
  nullif(o_orderstatus, 'O') AS status_non_open
FROM orders

-- ::spearman
WITH r AS (
  SELECT l_returnflag,
    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity,
      l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rx,
    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice,
      l_orderkey, l_linenumber, l_partkey, l_suppkey) AS ry
  FROM lineitem)
SELECT l_returnflag, COUNT(*) AS n,
  CAST(CAST(SUM(CAST((rx - ry) * (rx - ry) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_d2,
  1.0 - 6.0 * CAST(SUM(CAST((rx - ry) * (rx - ry) AS BIGINT)) AS DOUBLE) /
    (CAST(COUNT(*) AS DOUBLE) *
      (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) - 1.0)) AS rho
FROM r GROUP BY 1

-- ::spearmanDistributed
WITH r AS (
  SELECT l_returnflag,
    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity,
      l_orderkey, l_linenumber, l_partkey, l_suppkey,
      l_extendedprice) AS rx,
    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice,
      l_orderkey, l_linenumber, l_partkey, l_suppkey,
      l_quantity) AS ry
  FROM lineitem)
SELECT l_returnflag, COUNT(*) AS n,
  CAST(CAST(SUM(CAST((rx - ry) * (rx - ry) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_d2,
  1.0 - 6.0 * CAST(SUM(CAST((rx - ry) * (rx - ry) AS BIGINT)) AS DOUBLE) /
    (CAST(COUNT(*) AS DOUBLE) *
      (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) - 1.0)) AS rho
FROM r GROUP BY 1

-- ::tableChecksum
SELECT l_returnflag, COUNT(*) AS n_rows,
  CAST(SUM(('0x' || substr(md5(concat_ws('|',
    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
    CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
    l_returnflag, l_linestatus,
    CAST(epoch_us(l_shipdate) AS VARCHAR))), 1, 8))::BIGINT)
    AS BIGINT) AS checksum
FROM lineitem GROUP BY 1

-- ::weightedSample
SELECT doc_id, lang, n_chars,
  LEAST(1000000, n_chars * 500) AS w_u
FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       % 1000000) < LEAST(1000000, n_chars * 500)

-- ::robustOutliers
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY 1),
dev AS (
  SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
    abs(o.o_totalprice - m.med) AS absdev
  FROM orders o JOIN med m USING (o_orderpriority)),
stats AS (
  SELECT o_orderpriority, quantile_cont(absdev, 0.5) AS mad
  FROM dev GROUP BY 1)
SELECT d.o_orderkey, d.o_orderpriority, d.o_totalprice,
  CASE WHEN s.mad <> 0.0
    THEN round(d.absdev / (CAST(1.4826 AS DOUBLE) * s.mad), 6) END
    AS robust_z,
  (s.mad <> 0.0 AND d.absdev > CAST(5.1891 AS DOUBLE) * s.mad)
    AS is_outlier
FROM dev d JOIN stats s USING (o_orderpriority)

-- ::keyIntegrity
WITH b AS (
  SELECT o_orderkey // 1000 AS bucket,
    COUNT(DISTINCT o_orderkey) AS n_keys,
    COUNT(*) AS n_rows,
    MIN(o_orderkey) AS k_min,
    MAX(o_orderkey) AS k_max
  FROM orders GROUP BY 1)
SELECT bucket, n_keys, n_rows, k_min, k_max,
  k_max - k_min + 1 - n_keys AS missing_within,
  k_min - lag(k_max) OVER (ORDER BY bucket) - 1 AS gap_to_prev
FROM b

-- ::stratifiedSplit
WITH h AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5('split' || '|' || CAST(doc_id AS VARCHAR)),
                    1, 8))::BIGINT AS v
  FROM documents)
SELECT doc_id, lang,
  CASE WHEN v < 3435973836 THEN 'train'
       WHEN v < 3865470566 THEN 'val'
       ELSE 'test' END AS split
FROM h

-- ::mixtureResample
WITH per AS (
  SELECT source, SUM(n_chars) AS chars_s,
    GREATEST(1, SUM(n_chars) // 1000) AS ks_s,
    ('0x' || substr(md5(source), 1, 15))::BIGINT % 5 + 1 AS w_s
  FROM documents GROUP BY source),
tot AS (SELECT SUM(n_chars) // 1000 AS ks_tot FROM documents),
sw AS (SELECT SUM(w_s) AS sum_w FROM per),
rates AS (
  SELECT source,
    CAST(LEAST(1000000, (ks_tot * 2 // 5) * w_s // sum_w * 1000000 // ks_s)
      AS BIGINT) AS rate_u
  FROM per CROSS JOIN tot CROSS JOIN sw)
SELECT d.doc_id, d.source, d.n_chars, r.rate_u
FROM documents d JOIN rates r USING (source)
WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
       % 1000000) < r.rate_u

-- ::equidepthApproxGate
SELECT CAST(decile AS INT) AS decile, TRUE AS rank_ok
FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) t(decile)

-- ::fkAudit
SELECT 'lineitem.orderkey->orders' AS relationship,
  (SELECT COUNT(*) FROM lineitem) AS n_rows,
  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL SELECT 'lineitem.partkey->part',
  (SELECT COUNT(*) FROM lineitem),
  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
   (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL SELECT 'lineitem.suppkey->supplier',
  (SELECT COUNT(*) FROM lineitem),
  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
   (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL SELECT 'orders.custkey->customer',
  (SELECT COUNT(*) FROM orders),
  (SELECT COUNT(*) FROM orders r WHERE NOT EXISTS
   (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey))
UNION ALL SELECT 'customer.nationkey->nation',
  (SELECT COUNT(*) FROM customer),
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
   (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))

-- ::quantileNormalize
SELECT doc_id, lang, n_chars,
  percent_rank() OVER w AS pr,
  cume_dist() OVER w AS cd
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)

-- ::weightedTopkSample
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
       / 1152921504606846976.0)
      / GREATEST(n_chars, 1) AS k
  FROM documents)
SELECT doc_id, lang, n_chars, round(k, 9) AS es_key
FROM keyed ORDER BY k DESC, doc_id LIMIT 50

-- ::bootstrapCi
WITH reps AS (SELECT unnest(range(1, 41)) AS rep),
b AS (
  SELECT rep,
    (((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
        CAST((rep + 2) // 3 AS VARCHAR)), 1, 15))::BIGINT
      >> (20 * ((rep - 1) % 3))) & 1048575) / 1048576.0) AS u,
    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders CROSS JOIN reps),
w AS (
  SELECT rep, cents,
    CASE WHEN u <= 0.367879441 THEN 0
         WHEN u <= 0.735758882 THEN 1
         WHEN u <= 0.919698603 THEN 2
         WHEN u <= 0.981011843 THEN 3
         WHEN u <= 0.996340153 THEN 4
         WHEN u <= 0.999405815 THEN 5
         ELSE 6 END AS w
  FROM b),
means AS (
  SELECT rep,
    CAST(SUM(w * cents) AS DOUBLE) / 100.0 / SUM(w) AS m
  FROM w GROUP BY rep)
SELECT COUNT(*) AS n_replicas,
  round(AVG(m), 6) AS boot_mean,
  round(quantile_cont(m, 0.025), 6) AS ci_lo,
  round(quantile_cont(m, 0.975), 6) AS ci_hi
FROM means

-- ::kAnonymity
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
    COUNT(*) AS k
  FROM customer GROUP BY 1, 2, 3),
tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n_total FROM classes)
SELECT CAST(k AS BIGINT) AS k,
  CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(k) AS BIGINT) AS n_records,
  (k < 5) AS at_risk,
  CAST(SUM(k) * 1000000 // n_total AS BIGINT) AS records_ppm
FROM classes CROSS JOIN tot
GROUP BY k, n_total

-- ::lDiversity
WITH pv AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
    COUNT(*) AS c
  FROM customer GROUP BY 1, 2, 3, 4),
classes AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
    CAST(SUM(c) AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS l
  FROM pv GROUP BY 1, 2, 3),
tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n_total FROM classes)
SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(k) AS BIGINT) AS n_records,
  (l < 3) AS at_risk,
  CAST(SUM(k) * 1000000 // n_total AS BIGINT) AS records_ppm
FROM classes CROSS JOIN tot
GROUP BY l, n_total

-- ::tCloseness
WITH pv AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM customer GROUP BY 1, 2, 3),
cls AS (SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS k
        FROM pv GROUP BY 1, 2),
gl AS (SELECT bal_band, CAST(SUM(c) AS BIGINT) AS nc FROM pv GROUP BY 1),
tot AS (SELECT CAST(SUM(nc) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS m FROM gl),
grid AS (
  SELECT cls.c_nationkey, cls.c_mktsegment, cls.k, gl.bal_band,
    COALESCE(pv.c, 0) AS c, gl.nc, tot.n_total, tot.m
  FROM cls CROSS JOIN gl CROSS JOIN tot
  LEFT JOIN pv ON pv.c_nationkey = cls.c_nationkey
    AND pv.c_mktsegment = cls.c_mktsegment
    AND pv.bal_band = gl.bal_band),
cum AS (
  SELECT c_nationkey, c_mktsegment, k, m,
    SUM(c * 1000000 // k - nc * 1000000 // n_total) OVER (
      PARTITION BY c_nationkey, c_mktsegment ORDER BY bal_band
      ROWS UNBOUNDED PRECEDING) AS cum_u
  FROM grid),
sel AS (
  SELECT c_nationkey, c_mktsegment, k,
    CAST(SUM(ABS(cum_u)) // GREATEST(1, m - 1) AS BIGINT) AS emd_u
  FROM cum GROUP BY c_nationkey, c_mktsegment, k, m)
SELECT c_nationkey, c_mktsegment, k, emd_u,
  (emd_u > 200000) AS at_risk
FROM sel

-- ::dpRelease
WITH cnt AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM customer GROUP BY 1),
nz AS (
  SELECT c_nationkey, true_count,
    ('0x' || substr(md5('dp:' || c_nationkey), 1, 15))::BIGINT
      % 1000000 AS u
  FROM cnt),
mech AS (
  SELECT c_nationkey, true_count,
    CASE WHEN u < 500000 THEN -1 ELSE 1 END AS sgn,
    CASE WHEN u < 500000 THEN (500000 - u) * 2
         ELSE (u - 500000) * 2 END AS vv
  FROM nz),
noise AS (
  SELECT c_nationkey, true_count,
    CAST(sgn * CAST(floor(
      round(ln((1000000 - vv) / 1000000.0), 6) * -2.0) AS BIGINT)
      AS BIGINT) AS noise
  FROM mech)
SELECT c_nationkey, true_count, noise,
  GREATEST(0, true_count + noise) AS released,
  ABS(noise) AS abs_err,
  CAST(500 AS BIGINT) AS epsilon_milli
FROM noise

-- ::shuffleRuns
WITH d AS (
  SELECT doc_id, source, CAST(doc_id % 8 AS INT) AS shard
  FROM documents),
r AS (
  SELECT shard,
    CASE WHEN LAG(source) OVER (PARTITION BY shard ORDER BY doc_id)
      IS DISTINCT FROM source THEN 1 ELSE 0 END AS is_start
  FROM d),
runs AS (
  SELECT shard, CAST(SUM(is_start) AS BIGINT) AS n_runs
  FROM r GROUP BY shard),
pc AS (SELECT shard, source, COUNT(*) AS c FROM d GROUP BY 1, 2),
ex AS (
  SELECT shard, CAST(SUM(c) AS BIGINT) AS n_docs,
    CAST(COUNT(*) AS BIGINT) AS n_sources,
    CAST(SUM(c * c) AS BIGINT) AS sum_sq
  FROM pc GROUP BY shard),
j AS (
  SELECT runs.shard, n_docs, n_sources, n_runs,
    round(1.0 + (CAST(n_docs AS DOUBLE) * n_docs - sum_sq) / n_docs, 6)
      AS e_runs
  FROM runs JOIN ex ON runs.shard = ex.shard)
SELECT shard, n_docs, n_sources, n_runs, e_runs,
  round(CAST(n_runs AS DOUBLE) / e_runs, 6) AS runs_ratio
FROM j

-- ::temperatureMixture
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
    CAST(floor(sqrt(CAST(COUNT(*) * 1000000 AS DOUBLE))) AS BIGINT) AS w
  FROM documents GROUP BY lang),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_tot,
    CAST(SUM(w) AS BIGINT) AS w_tot FROM per)
SELECT lang, n_docs, n_chars,
  CAST(n_docs * 1000000 // n_tot AS BIGINT) AS prop_ppm,
  CAST(w * 1000000 // w_tot AS BIGINT) AS temp_ppm,
  CAST((w * 1000000 // w_tot) * 1000000
    // (n_docs * 1000000 // n_tot) AS BIGINT) AS boost_ppm
FROM per CROSS JOIN tot

-- ::epochAllocation
WITH per AS (
  SELECT source, SUM(n_chars) AS chars_s,
    CAST(GREATEST(1, SUM(n_chars) // 1000) AS BIGINT) AS ks_s,
    CAST(('0x' || substr(md5(source), 1, 15))::BIGINT % 5 + 1 AS BIGINT)
      AS w_s
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_chars) // 1000 AS BIGINT) AS ks_tot
        FROM documents),
sw AS (SELECT CAST(SUM(w_s) AS BIGINT) AS sum_w FROM per)
SELECT source, ks_s, w_s,
  CAST(2 * ks_tot * w_s // sum_w AS BIGINT) AS alloc_k,
  CAST(LEAST(4000, (2 * ks_tot * w_s // sum_w) * 1000 // ks_s) AS BIGINT)
    AS epochs_milli,
  CAST(ks_s * LEAST(4000, (2 * ks_tot * w_s // sum_w) * 1000 // ks_s)
    // 1000 AS BIGINT) AS actual_k
FROM per CROSS JOIN tot CROSS JOIN sw

-- ::shardBalance
WITH d AS (
  SELECT doc_id, n_chars,
    ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))
      ::BIGINT % 16 AS shard
  FROM documents),
per AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM d GROUP BY shard),
tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS t_chars FROM per)
SELECT shard, n_docs, n_chars,
  CAST(n_chars * 1000000 // t_chars AS BIGINT) AS chars_share_ppm,
  CAST(abs(n_chars * 1000000 // t_chars - 62500) AS BIGINT) AS dev_ppm
FROM per CROSS JOIN tot

-- ::splitFairness
WITH d AS (
  SELECT
    CASE WHEN v < 3435973836 THEN 'train'
         WHEN v < 3865470566 THEN 'val'
         ELSE 'test' END AS split,
    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_tokens,
    n_chars
  FROM (
    SELECT text, n_chars,
      ('0x' || substr(md5('split' || '|' || CAST(doc_id AS VARCHAR)),
                      1, 8))::BIGINT AS v
    FROM documents))
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(SUM(n_tokens) * 1000000 // COUNT(*) AS BIGINT)
    AS mean_tokens_micro,
  CAST(SUM(n_chars) * 1000000 // COUNT(*) AS BIGINT)
    AS mean_chars_micro
FROM d GROUP BY split


-- DuckDB oracle SQL for the 'analytics' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::cohortRetention
WITH act AS (
  SELECT DISTINCT o_custkey,
    CAST(year(o_orderdate)*12 + month(o_orderdate) AS INT) AS ym
  FROM orders),
coh AS (
  SELECT o_custkey, ym,
    min(ym) OVER (PARTITION BY o_custkey) AS cohort_ym
  FROM act),
ret AS (
  SELECT cohort_ym, ym - cohort_ym AS month_offset,
    COUNT(*) AS n_customers
  FROM coh GROUP BY 1, 2),
sized AS (
  SELECT *,
    MAX(CASE WHEN month_offset = 0 THEN n_customers END)
      OVER (PARTITION BY cohort_ym) AS cohort_size
  FROM ret)
SELECT CAST((cohort_ym - 1) // 12 AS INT) AS cohort_year,
  CAST((cohort_ym - 1) % 12 + 1 AS INT) AS cohort_mon,
  CAST(month_offset AS INT) AS month_offset,
  n_customers, cohort_size,
  round(CAST(n_customers AS DOUBLE) / cohort_size, 6) AS retention_rate
FROM sized

-- ::markovTransitions
WITH seq AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS to_type
  FROM events),
cnt AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
  round(CAST(n AS DOUBLE) /
        CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT), 6) AS p
FROM cnt

-- ::benfordAudit
WITH d AS (
  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                             AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders),
obs AS (
  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
tot AS (
  SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS total FROM obs),
p AS (
  SELECT digit, n, total,
    round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
    round(log10(1.0 + 1.0 / digit), 6) AS expected_p
  FROM tot)
SELECT digit, n, total, observed_p, expected_p,
  round(abs(observed_p - expected_p), 6) AS abs_dev
FROM p

-- ::abcClassification
WITH per_part AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) * 100 AS BIGINT)
      AS rev_u
  FROM lineitem GROUP BY 1),
cum AS (
  SELECT l_partkey, rev_u,
    CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, l_partkey
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u
  FROM per_part),
t AS (SELECT SUM(rev_u) AS total_u FROM per_part)
SELECT l_partkey, rev_u / 100.0 AS revenue, cum_u,
  CASE WHEN cum_u * 10 <= total_u * 7 THEN 'A'
       WHEN cum_u * 10 <= total_u * 9 THEN 'B'
       ELSE 'C' END AS abc_class
FROM cum CROSS JOIN t

-- ::abReadout
WITH assigned AS (
  SELECT c.c_mktsegment, o.o_totalprice,
    CASE WHEN (('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))::BIGINT % 2) = 0
         THEN 'control' ELSE 'treatment' END AS arm
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
per AS (
  SELECT c_mktsegment, arm,
    round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      / COUNT(*), 6) AS mean_rev,
    COUNT(*) AS n
  FROM assigned GROUP BY 1, 2)
SELECT c.c_mktsegment,
  c.n AS n_control, t.n AS n_treatment,
  c.mean_rev AS control_mean, t.mean_rev AS treatment_mean,
  round(t.mean_rev - c.mean_rev, 6) AS delta,
  round((t.mean_rev - c.mean_rev) / c.mean_rev * 100.0, 6) AS lift_pct
FROM (SELECT * FROM per WHERE arm = 'control') c
JOIN (SELECT * FROM per WHERE arm = 'treatment') t
  USING (c_mktsegment)

-- ::psiDrift
WITH dated AS (
  SELECT o_totalprice AS x, epoch_us(o_orderdate) AS ts_us FROM orders),
mid AS (
  SELECT CAST((MIN(ts_us) + MAX(ts_us)) / 2 AS BIGINT) AS mid_us FROM dated),
tagged AS (
  SELECT x, CASE WHEN ts_us < mid_us THEN 'expected' ELSE 'actual' END
    AS period
  FROM dated CROSS JOIN mid),
b AS (
  SELECT quantile_cont(x, 0.1) AS t1, quantile_cont(x, 0.2) AS t2,
    quantile_cont(x, 0.3) AS t3, quantile_cont(x, 0.4) AS t4,
    quantile_cont(x, 0.5) AS t5, quantile_cont(x, 0.6) AS t6,
    quantile_cont(x, 0.7) AS t7, quantile_cont(x, 0.8) AS t8,
    quantile_cont(x, 0.9) AS t9
  FROM tagged WHERE period = 'expected'),
binned AS (
  SELECT period,
    (CASE WHEN x > t1 THEN 1 ELSE 0 END + CASE WHEN x > t2 THEN 1 ELSE 0 END
     + CASE WHEN x > t3 THEN 1 ELSE 0 END + CASE WHEN x > t4 THEN 1 ELSE 0 END
     + CASE WHEN x > t5 THEN 1 ELSE 0 END + CASE WHEN x > t6 THEN 1 ELSE 0 END
     + CASE WHEN x > t7 THEN 1 ELSE 0 END + CASE WHEN x > t8 THEN 1 ELSE 0 END
     + CASE WHEN x > t9 THEN 1 ELSE 0 END) AS bin
  FROM tagged CROSS JOIN b),
counts AS (
  SELECT bin,
    SUM(CASE WHEN period = 'expected' THEN 1 ELSE 0 END) AS ne,
    SUM(CASE WHEN period = 'actual' THEN 1 ELSE 0 END) AS na
  FROM binned GROUP BY bin),
tot AS (SELECT SUM(ne) AS te, SUM(na) AS ta FROM counts),
terms AS (
  SELECT round((CAST(ne + 1 AS DOUBLE) / (te + 10)
              - CAST(na + 1 AS DOUBLE) / (ta + 10))
    * ln((CAST(ne + 1 AS DOUBLE) / (te + 10))
       / (CAST(na + 1 AS DOUBLE) / (ta + 10))), 6) AS term
  FROM counts CROSS JOIN tot)
SELECT CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS psi,
  COUNT(*) AS n_bins
FROM terms

-- ::shareOfParent
WITH nat AS (
  SELECT r_name, n_name,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      AS rev_u
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2),
reg AS (SELECT r_name, SUM(rev_u) AS reg_u FROM nat GROUP BY 1),
tot AS (SELECT SUM(reg_u) AS tot_u FROM reg)
SELECT nat.r_name, n_name, rev_u / 100.0 AS revenue,
  round(CAST(rev_u AS DOUBLE) / reg_u * 100.0, 6) AS pct_of_region,
  round(CAST(reg_u AS DOUBLE) / tot_u * 100.0, 6) AS region_pct_of_total
FROM nat JOIN reg USING (r_name) CROSS JOIN tot

-- ::giniConcentration
WITH vals AS (
  SELECT c_mktsegment, o_orderkey,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x_u
  FROM orders JOIN customer ON o_custkey = c_custkey),
ranked AS (
  SELECT c_mktsegment, x_u,
    row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY x_u, o_orderkey) AS i
  FROM vals)
SELECT c_mktsegment, COUNT(*) AS n,
  round(2.0 * CAST(SUM(CAST(i AS HUGEINT) * x_u) AS DOUBLE)
      / (CAST(COUNT(*) * SUM(x_u) AS DOUBLE))
    - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
FROM ranked GROUP BY c_mktsegment

-- ::cohortLtv
WITH act AS (
  SELECT o_custkey,
    CAST(year(o_orderdate)*12 + month(o_orderdate) AS INT) AS ym,
    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1, 2),
coh AS (
  SELECT o_custkey, ym, v,
    min(ym) OVER (PARTITION BY o_custkey) AS cohort_ym
  FROM act),
per AS (
  SELECT cohort_ym, ym - cohort_ym AS month_offset,
    CAST(COUNT(*) AS BIGINT) AS n_customers,
    CAST(SUM(v) AS BIGINT) AS rev_cents
  FROM coh GROUP BY 1, 2),
sized AS (
  SELECT *,
    MAX(CASE WHEN month_offset = 0 THEN n_customers END)
      OVER (PARTITION BY cohort_ym) AS cohort_size,
    CAST(SUM(rev_cents) OVER (PARTITION BY cohort_ym
      ORDER BY month_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cum_rev_cents
  FROM per)
SELECT CAST((cohort_ym - 1) // 12 AS INT) AS cohort_year,
  CAST((cohort_ym - 1) % 12 + 1 AS INT) AS cohort_mon,
  CAST(month_offset AS INT) AS month_offset,
  CAST(cohort_size AS BIGINT) AS cohort_size, rev_cents, cum_rev_cents,
  CAST(cum_rev_cents // cohort_size AS BIGINT) AS ltv_cents
FROM sized


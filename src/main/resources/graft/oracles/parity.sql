-- DuckDB oracle SQL for the 'parity' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::thresholdStats
SELECT p_brand,
  MIN(l_extendedprice) AS price_min,
  MAX(l_extendedprice) AS price_max,
  {{DAVG:l_extendedprice}} AS price_mean,
  MIN(l_quantity) AS qty_min,
  MAX(l_quantity) AS qty_max,
  COUNT(*) AS n_obs
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand

-- ::thresholdSeverity
WITH joined AS (
  SELECT l_orderkey, l_linenumber, p_brand, l_extendedprice, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
), th AS (
  SELECT p_brand,
    quantile_cont(l_extendedprice, 0.05) AS price_low,
    quantile_cont(l_extendedprice, 0.95) AS price_high,
    quantile_cont(l_quantity, 0.05) AS qty_low,
    quantile_cont(l_quantity, 0.95) AS qty_high
  FROM joined GROUP BY p_brand
), flagged AS (
  SELECT l_orderkey, l_linenumber, joined.p_brand, l_extendedprice, l_quantity,
    (CASE WHEN l_extendedprice < price_low OR l_extendedprice > price_high THEN 1 ELSE 0 END
     + CASE WHEN l_quantity < qty_low OR l_quantity > qty_high THEN 1 ELSE 0 END) AS violations
  FROM joined JOIN th ON joined.p_brand = th.p_brand
)
SELECT l_orderkey, l_linenumber, p_brand, l_extendedprice, l_quantity, violations,
  CASE WHEN violations = 2 THEN 'high' WHEN violations = 1 THEN 'low' END AS severity
FROM flagged WHERE violations > 0

-- ::rfmClvMerge
WITH rfm AS (
  SELECT o_custkey,
    CAST(datediff('day', MAX(CAST(o_orderdate AS DATE)), DATE '2001-08-02') AS INT) AS recency_days,
    COUNT(*) AS frequency,
    {{DSUM:o_totalprice}} AS monetary
  FROM orders GROUP BY o_custkey
), clv AS (
  SELECT o_custkey, {{DSUM:o_totalprice}} AS revenue,
    {{DAVG:o_totalprice}} AS avg_order_value
  FROM orders GROUP BY o_custkey
)
SELECT rfm.o_custkey, recency_days, frequency, monetary,
  CASE WHEN recency_days <= 90 AND frequency >= 12 THEN 'VIP'
       WHEN recency_days <= 180 THEN 'Active'
       WHEN frequency <= 5 THEN 'Churn Risk'
       ELSE 'Other' END AS segment,
  revenue, avg_order_value
FROM rfm JOIN clv ON rfm.o_custkey = clv.o_custkey

-- ::rollupRevenue
SELECT yr, o_orderpriority,
  {{DSUM:o_totalprice}} AS revenue,
  COUNT(*) AS n_orders,
  CAST(GROUPING(yr) AS INT) AS g_yr,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri
FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority, o_totalprice
      FROM orders)
GROUP BY ROLLUP(yr, o_orderpriority)

-- ::cubeRevenue
SELECT o_orderstatus, o_orderpriority, yr,
  {{DSUM:o_totalprice}} AS revenue,
  COUNT(*) AS n_orders,
  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
  CAST(GROUPING(yr) AS INT) AS g_yr
FROM (SELECT o_orderstatus, o_orderpriority,
        CAST(year(o_orderdate) AS INT) AS yr, o_totalprice
      FROM orders)
GROUP BY CUBE(o_orderstatus, o_orderpriority, yr)


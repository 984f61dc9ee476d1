-- DuckDB oracle SQL for the 'relational' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::pricingSummary
SELECT l_returnflag, l_linestatus,
  {{DSUM:l_quantity}} AS sum_qty,
  {{DSUM:l_extendedprice}} AS sum_base_price,
  {{DSUM4:l_extendedprice * (1.0 - l_discount)}} AS sum_disc_price,
  {{DAVG:l_quantity}} AS avg_qty,
  {{DAVG:l_extendedprice}} AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus

-- ::orderLineitemJoin
SELECT o_orderkey,
  COUNT(l_linenumber) AS n_items,
  COALESCE({{DSUM:l_extendedprice}}, 0.0) AS items_value
FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey

-- ::regionRollup
SELECT r_name,
  COUNT(*) AS n_customers,
  {{DSUM:c_acctbal}} AS total_acctbal,
  {{DAVG:c_acctbal}} AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name

-- ::qualityRules
SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity,
  (l_extendedprice IS NULL OR l_extendedprice <= 0.0 OR l_extendedprice > 100000.0) AS price_issue,
  (l_quantity IS NULL OR l_quantity <= 0.0 OR l_quantity > 47.0) AS qty_issue,
  CASE
    WHEN (l_extendedprice IS NULL OR l_extendedprice <= 0.0 OR l_extendedprice > 100000.0)
     AND (l_quantity IS NULL OR l_quantity <= 0.0 OR l_quantity > 47.0) THEN 'high'
    WHEN (l_extendedprice IS NULL OR l_extendedprice <= 0.0 OR l_extendedprice > 100000.0)
      OR (l_quantity IS NULL OR l_quantity <= 0.0 OR l_quantity > 47.0) THEN 'low'
    ELSE 'none' END AS severity
FROM lineitem
WHERE (l_extendedprice IS NULL OR l_extendedprice <= 0.0 OR l_extendedprice > 100000.0)
   OR (l_quantity IS NULL OR l_quantity <= 0.0 OR l_quantity > 47.0)

-- ::exceptDistinct
SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0
EXCEPT
SELECT l_partkey FROM lineitem WHERE l_quantity <= 2.0

-- ::antiJoin
SELECT o_orderkey, o_totalprice FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')

-- ::unionSources
SELECT doc_id AS id, 'doc' AS src FROM documents
UNION ALL
SELECT vec_id AS id, 'vec' AS src FROM embeddings

-- ::revenueDerived
SELECT l_orderkey, l_linenumber,
  ((l_extendedprice * (1.0 - COALESCE(l_discount, 0.0)))
    * (1.0 + COALESCE(l_tax, 0.0))) AS revenue
FROM lineitem

-- ::clv
SELECT o_custkey,
  MIN(CAST(o_orderdate AS DATE)) AS first_order,
  MAX(CAST(o_orderdate AS DATE)) AS last_order,
  COUNT(*) AS n_orders,
  {{DSUM:o_totalprice}} AS revenue,
  {{DAVG:o_totalprice}} AS avg_order_value
FROM orders GROUP BY o_custkey

-- ::clvBuckets
WITH per_cust AS (
  SELECT o_custkey, c_mktsegment, {{DSUM:o_totalprice}} AS clv
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_custkey, c_mktsegment
), th AS (
  SELECT c_mktsegment,
    quantile_cont(clv, 0.2) AS low_th,
    quantile_cont(clv, 0.8) AS high_th
  FROM per_cust GROUP BY c_mktsegment
)
SELECT o_custkey, per_cust.c_mktsegment, clv,
  CASE WHEN clv >= high_th THEN 'High CLV'
       WHEN clv <= low_th THEN 'Low CLV'
       ELSE 'Medium CLV' END AS clv_bucket
FROM per_cust JOIN th ON per_cust.c_mktsegment = th.c_mktsegment

-- ::rfm
WITH base AS (
  SELECT o_custkey,
    CAST(datediff('day', MAX(CAST(o_orderdate AS DATE)), DATE '2001-08-02') AS INT) AS recency_days,
    COUNT(*) AS frequency,
    {{DSUM:o_totalprice}} AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
  CASE WHEN recency_days <= 90 AND frequency >= 12 THEN 'VIP'
       WHEN recency_days <= 180 THEN 'Active'
       WHEN frequency <= 5 THEN 'Churn Risk'
       ELSE 'Other' END AS segment
FROM base

-- ::loyaltyRollup
WITH lvl1 AS (
  SELECT o_orderpriority, o_custkey,
    {{DAVG:o_totalprice}} AS avg_order_value,
    {{DSUM:o_totalprice}} AS cust_total
  FROM orders GROUP BY o_orderpriority, o_custkey
)
SELECT o_orderpriority,
  round(AVG(avg_order_value), 6) AS avg_of_customer_avgs,
  {{DSUM:cust_total}} AS total_revenue,
  COUNT(*) AS n_customers
FROM lvl1 GROUP BY o_orderpriority

-- ::topNations
WITH agg AS (
  SELECT n_name,
    {{DSUM:o_totalprice}} AS total_revenue,
    COUNT(DISTINCT o_custkey) AS n_customers,
    COUNT(DISTINCT o_orderkey) AS n_orders,
    COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS active_days
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, total_revenue, n_customers, n_orders, active_days,
  (n_orders / active_days) AS orders_per_day,
  CAST(row_number() OVER (ORDER BY total_revenue DESC, n_name) AS INT) AS rank
FROM agg

-- ::discountEffect
SELECT (l_discount >= 0.05) AS is_discounted,
  COUNT(*) AS n_lines,
  {{DSUM4:l_extendedprice * (1.0 - l_discount)}} AS net_revenue,
  COUNT(DISTINCT l_orderkey) AS n_orders,
  {{DAVG:l_discount}} AS avg_discount
FROM lineitem GROUP BY (l_discount >= 0.05)

-- ::topkOrders
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10

-- ::schemaCanonicalize
SELECT doc_id, text, lang, source, n_chars,
  CAST(NULL AS DOUBLE) AS quality_score,
  CAST(NULL AS VARCHAR) AS ingest_note
FROM documents

-- ::intersectUsers
SELECT user_id FROM events INTERSECT SELECT c_custkey AS user_id FROM customer


-- DuckDB oracle SQL for the 'reshape' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::pivotMatrix
SELECT user_id,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
  COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
  COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2)))
      FILTER (WHERE event_type = 'purchase') AS DOUBLE), 0.0)
    AS purchase_value
FROM events GROUP BY user_id

-- ::unpivotMeasures
WITH long AS (
  SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
SELECT measure, COUNT(*) AS n, {{DSUM4:val}} AS total,
  MIN(val) AS vmin, MAX(val) AS vmax
FROM long GROUP BY measure


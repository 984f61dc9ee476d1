-- DuckDB oracle SQL for the 'asof' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::asofPurchaseView
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), p AS (
  SELECT user_id, event_id AS purchase_id, ts_us FROM ev
  WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts_us AS view_ts_us, event_id AS view_id FROM ev
  WHERE event_type = 'view'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) = 1
)
SELECT p.user_id, p.purchase_id, p.ts_us,
  v.view_id AS asof_view_id, v.view_ts_us AS asof_view_ts_us
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us

-- ::sketchAggregates
SELECT l_returnflag,
  COUNT(DISTINCT l_orderkey) AS exact_orders,
  COUNT(DISTINCT l_partkey) AS exact_parts,
  quantile_cont(l_extendedprice, 0.5) AS exact_median_price,
  quantile_cont(l_extendedprice, 0.9) AS exact_p90_price,
  true AS orders_est_ok, true AS parts_est_ok,
  true AS median_est_ok, true AS p90_est_ok
FROM lineitem GROUP BY l_returnflag

-- ::rangeClickPurchase
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), c AS (
  SELECT user_id, event_id AS click_id, ts_us AS click_us FROM ev
  WHERE event_type = 'click'
), p AS (
  SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us FROM ev
  WHERE event_type = 'purchase'
)
SELECT c.user_id, click_id, purchase_id,
  (purchase_us - click_us) AS delta_us
FROM c JOIN p ON c.user_id = p.user_id
WHERE purchase_us >= click_us
  AND purchase_us - click_us <= 3600000000

-- ::nearestEvent
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events),
c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us
      FROM ev WHERE event_type = 'click'),
v AS (SELECT user_id, event_id AS view_id, ts_us AS view_us
      FROM ev WHERE event_type = 'view'),
pairs AS (
  SELECT c.user_id, c.click_id, c.click_us, v.view_id, v.view_us
  FROM c JOIN v USING (user_id)
  WHERE abs(v.view_us - c.click_us) <= 900000000)
SELECT user_id, click_id, view_id, view_us - click_us AS delta_us
FROM pairs
QUALIFY row_number() OVER (PARTITION BY click_id
  ORDER BY abs(view_us - click_us), view_id) = 1


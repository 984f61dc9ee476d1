-- DuckDB oracle SQL for the 'pipeline' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::pipelineTransform
{{transformCtes}}
SELECT order_id, lineitem_id, restaurant_id, user_id, printed_card_number,
  is_loyalty, item_price, item_quantity, creation_time_utc, item_category,
  item_name, item_size, beverage_class, final_category, date, date_key, time
FROM transformed

-- ::pipelineQualityFinal
{{qualityCtes}}
SELECT * FROM fin WHERE severity <> 'high'

-- ::pipelineQualityQuarantine
{{qualityCtes}}
SELECT * FROM fin WHERE severity = 'high'

-- ::pipelineClv
{{metricsCtes}}
SELECT restaurant_id, customer_id, date_key, is_loyalty,
  {{DSUM:revenue}} AS total_revenue,
  COUNT(order_id) AS n_lines,
  MAX(date) AS last_date,
  {{DAVG:revenue}} AS avg_revenue,
  MIN(revenue) AS min_revenue
FROM mbase WHERE customer_id <> '_guest'
GROUP BY 1, 2, 3, 4

-- ::pipelineRfm
{{metricsCtes}}, grp AS (
  SELECT restaurant_id, customer_id,
    MAX(date) AS last_date,
    COUNT(*) AS frequency,
    {{DSUM:revenue}} AS monetary,
    MAX(is_loyalty) AS is_loyalty
  FROM mbase WHERE customer_id <> '_guest' GROUP BY 1, 2
), snap AS (
  SELECT MAX(date) AS snapshot_date FROM mbase WHERE customer_id <> '_guest'
), r AS (
  SELECT grp.*, CAST(datediff('day', CAST(last_date AS DATE), CAST(snapshot_date AS DATE)) AS INT) AS recency
  FROM grp CROSS JOIN snap
)
SELECT restaurant_id, customer_id, last_date, frequency, monetary, is_loyalty, recency,
  CASE WHEN recency <= 30 AND frequency >= 10 THEN 'VIP'
       WHEN recency > 180 THEN 'Churn Risk'
       WHEN frequency <= 2 THEN 'New Customer'
       ELSE 'Other' END AS segment
FROM r

-- ::pipelineTopLocations
{{metricsCtes}}, agg AS (
  SELECT restaurant_id,
    {{DSUM:revenue}} AS total_revenue,
    {{DAVG:revenue}} AS avg_revenue,
    COUNT(DISTINCT date) AS active_days,
    COUNT(DISTINCT order_id) AS n_orders
  FROM mbase GROUP BY 1
)
SELECT *, n_orders / active_days AS orders_per_day,
  CAST(row_number() OVER (ORDER BY total_revenue DESC, restaurant_id) AS INT) AS rank
FROM agg

-- ::pipelineTrendsDaily
{{metricsCtes}}
SELECT CAST(year(CAST(date AS DATE)) AS INT) AS yr, date, restaurant_id, final_category,
  {{DSUM:revenue}} AS total_revenue, COUNT(*) AS n_lines
FROM mbase GROUP BY 1, 2, 3, 4

-- ::pipelineDiscountEffect
{{metricsCtes}}
SELECT restaurant_id, (option_price < 0.0) AS is_discounted,
  {{DSUM:revenue}} AS total_revenue,
  COUNT(DISTINCT order_id) AS n_orders,
  {{DAVG:revenue}} AS avg_revenue
FROM mbase GROUP BY 1, 2

-- ::pipelineLoyaltyImpact
{{metricsCtes}}, cust AS (
  SELECT restaurant_id, is_loyalty, customer_id,
    {{DAVG:revenue}} AS avg_rev,
    COUNT(*) AS n_lines,
    {{DSUM:revenue}} AS total_rev
  FROM mbase WHERE customer_id <> '_guest' GROUP BY 1, 2, 3
)
SELECT restaurant_id, is_loyalty,
  round(AVG(avg_rev), 6) AS avg_of_customer_avgs,
  {{DSUM:total_rev}} AS total_revenue,
  COUNT(*) AS n_customers
FROM cust GROUP BY 1, 2

-- ::pipelineActivityProfile
{{metricsCtes}}, act0 AS (
  SELECT restaurant_id, customer_id, date, order_id, lineitem_id, revenue,
    lag(date) OVER w AS prev_date,
    lag(revenue) OVER w AS prev_rev
  FROM mbase WHERE customer_id <> '_guest'
  WINDOW w AS (PARTITION BY restaurant_id, customer_id ORDER BY date, order_id, lineitem_id)
), act1 AS (
  SELECT *,
    CAST(datediff('day', CAST(prev_date AS DATE), CAST(date AS DATE)) AS INT) AS order_gap,
    CASE WHEN prev_rev IS NOT NULL AND prev_rev <> 0.0
         THEN (revenue - prev_rev) / prev_rev END AS rev_change_pct
  FROM act0
), act2 AS (
  SELECT restaurant_id, customer_id, MAX(date) AS last_date,
    round(AVG(order_gap), 6) AS avg_order_gap,
    round(AVG(rev_change_pct), 6) AS avg_rev_change_pct
  FROM act1 GROUP BY 1, 2
)
SELECT *,
  CASE WHEN avg_order_gap IS NULL THEN 'one-off'
       WHEN avg_order_gap <= 7.0 THEN 'frequent'
       WHEN avg_order_gap <= 30.0 THEN 'regular'
       ELSE 'dormant' END AS activity_tag
FROM act2


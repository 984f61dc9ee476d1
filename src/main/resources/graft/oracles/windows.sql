-- DuckDB oracle SQL for the 'windows' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::latestEventPerKey
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1

-- ::activityProfile
WITH enriched AS (
  SELECT o_custkey, o_orderdate, o_totalprice,
    lag(o_orderdate) OVER w AS prev_date,
    lag(o_totalprice) OVER w AS prev_price
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), gaps AS (
  SELECT o_custkey, o_orderdate, o_totalprice,
    CAST(datediff('day', CAST(prev_date AS DATE), CAST(o_orderdate AS DATE)) AS INT) AS gap_days,
    CASE WHEN prev_price IS NOT NULL AND prev_price <> 0.0
         THEN (o_totalprice - prev_price) / prev_price END AS rev_change_pct
  FROM enriched
)
SELECT o_custkey,
  MAX(CAST(o_orderdate AS DATE)) AS last_order,
  COUNT(*) AS n_orders,
  round(AVG(gap_days), 6) AS avg_gap_days,
  round(AVG(rev_change_pct), 6) AS avg_rev_change,
  CASE WHEN round(AVG(gap_days), 6) IS NULL THEN 'one-off'
       WHEN round(AVG(gap_days), 6) <= 120.0 THEN 'frequent'
       WHEN round(AVG(gap_days), 6) <= 365.0 THEN 'regular'
       ELSE 'dormant' END AS activity_tag
FROM gaps GROUP BY o_custkey

-- ::trendsDaily
SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
  {{DSUM:o_totalprice}} AS revenue, COUNT(*) AS n_orders
FROM orders GROUP BY CAST(o_orderdate AS DATE), o_orderpriority

-- ::trendsWeekly
SELECT yr, wk, revenue, n_orders,
  (CAST(CAST(yr AS VARCHAR) || '-01-01' AS DATE) + CAST((wk - 1) * 7 AS INT)) AS week_start
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
    CAST(week(o_orderdate) AS INT) AS wk,
    {{DSUM:o_totalprice}} AS revenue, COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)

-- ::trendsMonthly
SELECT yr, mon, revenue, n_orders,
  make_date(yr, mon, 1) AS month_start,
  monthname(make_date(yr, mon, 1)) AS month_name
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
    CAST(month(o_orderdate) AS INT) AS mon,
    {{DSUM:o_totalprice}} AS revenue, COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)

-- ::trendsHourly
SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
  COUNT(*) AS n_events, {{DSUM:value}} AS total_value
FROM events GROUP BY 1, 2

-- ::sessionize
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 7200000000
         THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  COUNT(*) AS n_events,
  MIN(epoch_us(ts)) AS start_us,
  MAX(epoch_us(ts)) AS end_us,
  {{DSUM:value}} AS session_value
FROM sess GROUP BY user_id, session_id

-- ::windowFamily
SELECT o_orderkey, o_custkey, o_totalprice,
  CAST(rank() OVER w AS INT) AS price_rank,
  CAST(dense_rank() OVER w AS INT) AS price_dense_rank,
  CAST(ntile(4) OVER w AS INT) AS quartile,
  lead(o_totalprice) OVER w AS next_price,
  first_value(o_totalprice) OVER w AS top_order_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)

-- ::trendGapfill
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
    {{DSUM:o_totalprice}} AS revenue, COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2),
b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
             MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
    AS order_date
  FROM b),
prios AS (SELECT DISTINCT o_orderpriority FROM orders)
SELECT s.order_date, p.o_orderpriority,
  COALESCE(d.revenue, 0.0) AS revenue,
  COALESCE(d.n_orders, 0) AS n_orders
FROM spine s CROSS JOIN prios p
LEFT JOIN daily d
  ON d.order_date = s.order_date
 AND d.o_orderpriority = p.o_orderpriority

-- ::trailingWindow
SELECT o_orderkey, o_custkey,
  CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
       AS INT) AS day_num,
  o_totalprice,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
    AS trail_rev,
  COUNT(*) OVER w AS trail_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey
  ORDER BY CAST(datediff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) AS INT)
  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)

-- ::incrementalSlice
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
FROM events WHERE epoch_ns(ts) > 1705276800000000000
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1

-- ::rankDistributions
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*12 + month(o_orderdate) AS INT) AS ym,
    o_orderpriority, {{DSUM:o_totalprice}} AS revenue
  FROM orders GROUP BY 1, 2)
SELECT ym, o_orderpriority, revenue,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume,
  nth_value(revenue, 2) OVER wf AS second_best,
  last_value(revenue) OVER wf AS worst
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY revenue DESC, ym),
  wf AS (PARTITION BY o_orderpriority ORDER BY revenue DESC, ym
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)

-- ::ewmaSmoothing
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT)
      AS rev_cents
  FROM orders GROUP BY 1, 2),
sm AS (
  SELECT order_date, o_orderpriority, rev_cents,
    CAST({{TERMS}} AS BIGINT) AS ewma_u
  FROM daily)
SELECT order_date, o_orderpriority,
  rev_cents / 100.0 AS revenue, ewma_u,
  ewma_u / 104857600.0 AS ewma
FROM sm

-- ::trendAnomalies
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT)
      AS rev_cents
  FROM orders GROUP BY 1, 2),
sm AS (
  SELECT order_date, o_orderpriority, rev_cents,
    CAST({{TERMS}} AS BIGINT) AS ewma_u
  FROM daily),
res AS (
  SELECT order_date, o_orderpriority,
    rev_cents / 100.0 AS revenue,
    ewma_u / 104857600.0 AS ewma,
    rev_cents / 100.0 - ewma_u / 104857600.0 AS residual
  FROM sm),
mad AS (
  SELECT o_orderpriority, quantile_cont(abs(residual), 0.5) AS mad
  FROM res GROUP BY 1)
SELECT r.order_date, r.o_orderpriority, r.revenue, r.ewma,
  round(r.residual, 6) AS residual,
  (m.mad <> 0.0 AND abs(r.residual) > CAST(5.1891 AS DOUBLE) * m.mad)
    AS is_anomaly
FROM res r JOIN mad m USING (o_orderpriority)

-- ::maxWatermark
SELECT MAX(epoch_us(ts)) AS watermark_us, COUNT(*) AS n_rows FROM events


-- DuckDB oracle SQL for the 'events' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::hourlyWindow
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
  COUNT(*) AS n_events, {{DSUM:value}} AS total_value
FROM events GROUP BY 1, 2

-- ::runningValue
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
FROM events

-- ::funnelStages
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
s1 AS (SELECT *, MIN(CASE WHEN event_type = 'click' THEN ts_us END)
         OVER (PARTITION BY user_id) AS t1 FROM e),
s2 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts_us > t1
         THEN ts_us END) OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2
         THEN ts_us END) OVER (PARTITION BY user_id) AS t3 FROM s2)
SELECT user_id, MAX(t1) AS click_us, MAX(t2) AS view_us,
  MAX(t3) AS purchase_us,
  CASE WHEN MAX(t3) IS NOT NULL THEN 3
       WHEN MAX(t2) IS NOT NULL THEN 2
       WHEN MAX(t1) IS NOT NULL THEN 1 ELSE 0 END AS stage
FROM s3 GROUP BY user_id

-- ::funnelLatency
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
s1 AS (SELECT *, MIN(CASE WHEN event_type = 'click' THEN ts_us END)
         OVER (PARTITION BY user_id) AS t1 FROM e),
s2 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts_us > t1
         THEN ts_us END) OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t2
         THEN ts_us END) OVER (PARTITION BY user_id) AS t3 FROM s2),
u AS (SELECT user_id, MAX(t1) AS c, MAX(t2) AS v, MAX(t3) AS p
      FROM s3 GROUP BY user_id),
gaps AS (
  SELECT 'click_to_view' AS transition, (v - c) // 1000000 AS gap_s
  FROM u WHERE v IS NOT NULL
  UNION ALL
  SELECT 'view_to_purchase', (p - v) // 1000000 FROM u
  WHERE p IS NOT NULL)
SELECT transition, CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(round(quantile_cont(gap_s, 0.5) * 1000) AS BIGINT) AS p50_ms_x1000,
  CAST(round(quantile_cont(gap_s, 0.9) * 1000) AS BIGINT) AS p90_ms_x1000,
  CAST(MAX(gap_s) AS BIGINT) AS max_s
FROM gaps GROUP BY transition

-- ::jsonProps
SELECT event_type,
  CAST(json_extract_string(props, '$.k') AS INT) AS k,
  COUNT(*) AS n, {{DSUM:value}} AS sum_value
FROM events GROUP BY 1, 2

-- ::topPaths
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 7200000000
         THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, ts, event_type,
    SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), tri AS (
  SELECT event_type || '>' ||
    lead(event_type, 1) OVER ws || '>' ||
    lead(event_type, 2) OVER ws AS path,
    lead(event_type, 2) OVER ws AS e3
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
)
SELECT path, COUNT(*) AS n FROM tri WHERE e3 IS NOT NULL
GROUP BY path ORDER BY n DESC, path LIMIT 15

-- ::pseudonymize
SELECT sha256('vault-salt-2026:' || CAST(user_id AS VARCHAR)) AS surrogate,
  COUNT(*) AS n_events,
  COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY 1

-- ::rollingDistinct
WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
expanded AS (
  SELECT user_id, CAST(unnest(range(0, 7)) AS INT) AS o, day
  FROM pairs)
SELECT day + o AS win_end, COUNT(DISTINCT user_id) AS u7
FROM expanded GROUP BY 1

-- ::survivalHazard
WITH obs AS (SELECT MAX(epoch_us(ts)) AS end_us FROM events),
gaps AS (
  SELECT COALESCE(
      LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        ORDER BY epoch_us(ts), event_id) - epoch_us(ts),
      (SELECT end_us FROM obs) - epoch_us(ts)) // 3600000000
      AS gap_h,
    (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        ORDER BY epoch_us(ts), event_id) IS NOT NULL) AS complete
  FROM events),
by_gap AS (
  SELECT gap_h, CAST(COUNT(*) AS BIGINT) AS n_all,
    CAST(SUM(CASE WHEN complete THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM gaps GROUP BY gap_h),
tot AS (SELECT CAST(SUM(n_all) AS BIGINT) AS n_gaps FROM by_gap),
risk AS (
  SELECT gap_h, d,
    n_gaps - CAST(COALESCE(SUM(n_all) OVER (
      ORDER BY gap_h ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM by_gap CROSS JOIN tot),
hz AS (
  SELECT gap_h, n_risk, d AS d_completed,
    CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm
  FROM risk WHERE d > 0)
SELECT gap_h, n_risk, d_completed, hazard_ppm,
  CAST(SUM(hazard_ppm) OVER (ORDER BY gap_h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_hazard_ppm
FROM hz

-- ::seasonalGapfill
WITH cells AS (
  SELECT event_type, CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS h,
    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2, 3),
b AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events),
spine AS (
  SELECT et.event_type, dd.d, hh.h
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT CAST(unnest(generate_series(d0, d1,
    INTERVAL 1 DAY)) AS DATE) AS d FROM b) dd
  CROSS JOIN (SELECT i AS h FROM range(0, 24) t(i)) hh),
filled AS (
  SELECT s.event_type, s.d, s.h, COALESCE(c.v, 0) AS v,
    (c.v IS NULL) AS gap
  FROM spine s LEFT JOIN cells c
    ON c.event_type = s.event_type AND c.d = s.d AND c.h = s.h),
base AS (
  SELECT event_type, h, CAST(SUM(v) AS BIGINT) AS s,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM filled GROUP BY 1, 2),
resid AS (
  SELECT f.event_type, f.gap, f.v - b.s // b.n AS resid
  FROM filled f JOIN base b ON f.event_type = b.event_type AND f.h = b.h),
mad AS (
  SELECT event_type, quantile_cont(abs(resid), 0.5) AS mad
  FROM resid GROUP BY event_type)
SELECT r.event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
  CAST(SUM(CASE WHEN r.gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_cells,
  CAST(SUM(CASE WHEN CAST(abs(r.resid) AS DOUBLE) > m.mad * 3.0
    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
  CAST(MAX(abs(r.resid)) AS BIGINT) AS max_abs_resid_cents,
  CAST(round(MAX(m.mad) * 100) AS BIGINT) AS mad_cents_x100
FROM resid r JOIN mad m ON r.event_type = m.event_type
GROUP BY r.event_type

-- ::seasonalAnomalies
WITH cells AS (
  SELECT event_type, CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS h,
    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2, 3),
base AS (
  SELECT event_type, h, CAST(SUM(v) AS BIGINT) AS s,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2),
resid AS (
  SELECT c.event_type, c.v - b.s // b.n AS resid
  FROM cells c JOIN base b ON c.event_type = b.event_type AND c.h = b.h),
mad AS (
  SELECT event_type, quantile_cont(abs(resid), 0.5) AS mad
  FROM resid GROUP BY event_type)
SELECT r.event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
  CAST(SUM(CASE WHEN CAST(abs(r.resid) AS DOUBLE) > m.mad * 3.0
    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
  CAST(MAX(abs(r.resid)) AS BIGINT) AS max_abs_resid_cents,
  CAST(round(MAX(m.mad) * 100) AS BIGINT) AS mad_cents_x100
FROM resid r JOIN mad m ON r.event_type = m.event_type
GROUP BY r.event_type


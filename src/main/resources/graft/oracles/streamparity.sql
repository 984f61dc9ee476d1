-- DuckDB oracle SQL for the 'streamparity' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::streamUpsertParity
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1

-- ::streamHourlyParity
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2


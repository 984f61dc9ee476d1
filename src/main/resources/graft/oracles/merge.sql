-- DuckDB oracle SQL for the 'merge' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::mergeUpsert
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT -o_orderkey - 1, o_custkey, 'N', o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 3)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
FROM (
  SELECT * FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
  UNION ALL SELECT * FROM updates)

-- ::scd2History
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev
  FROM events),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE event_type IS DISTINCT FROM prev)
SELECT user_id, event_type AS state,
  epoch_us(ts) AS valid_from_us,
  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
    AS valid_to_us,
  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) IS NULL
    AS is_current
FROM chg

-- ::snapshotDiff
WITH b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
         ELSE o_totalprice END AS o_totalprice,
    o_orderdate,
    CASE WHEN o_orderkey % 13 = 0 THEN '9-REPRICED'
         ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
    o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 101 = 0),
j AS (
  SELECT a.o_orderkey AS ak, b.o_orderkey AS bk,
    a.o_custkey IS DISTINCT FROM b.o_custkey AS d_custkey,
    a.o_orderstatus IS DISTINCT FROM b.o_orderstatus AS d_status,
    a.o_totalprice IS DISTINCT FROM b.o_totalprice AS d_price,
    a.o_orderdate IS DISTINCT FROM b.o_orderdate AS d_date,
    a.o_orderpriority IS DISTINCT FROM b.o_orderpriority AS d_prio
  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey),
typed AS (
  SELECT CASE WHEN ak IS NULL THEN 'added'
              WHEN bk IS NULL THEN 'removed'
              WHEN d_custkey OR d_status OR d_price OR d_date OR d_prio
                THEN 'changed'
              ELSE 'unchanged' END AS kind,
    d_custkey, d_status, d_price, d_date, d_prio,
    (ak IS NOT NULL AND bk IS NOT NULL) AS both_sides
  FROM j)
SELECT kind, COUNT(*) AS n FROM typed GROUP BY kind
UNION ALL
SELECT kind, n FROM (
  SELECT 'col:o_custkey' AS kind,
    COUNT(*) FILTER (WHERE both_sides AND d_custkey) AS n FROM typed
  UNION ALL SELECT 'col:o_orderstatus',
    COUNT(*) FILTER (WHERE both_sides AND d_status) FROM typed
  UNION ALL SELECT 'col:o_totalprice',
    COUNT(*) FILTER (WHERE both_sides AND d_price) FROM typed
  UNION ALL SELECT 'col:o_orderdate',
    COUNT(*) FILTER (WHERE both_sides AND d_date) FROM typed
  UNION ALL SELECT 'col:o_orderpriority',
    COUNT(*) FILTER (WHERE both_sides AND d_prio) FROM typed)
WHERE n > 0

-- ::pointInTimeJoin
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev
  FROM events),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE event_type IS DISTINCT FROM prev),
hist AS (
  SELECT user_id, event_type AS state,
    epoch_us(ts) AS vf_us,
    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      AS vt_us
  FROM chg),
probes AS (
  SELECT event_id, user_id, epoch_us(ts) - 3600000000 AS pt_us
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.pt_us, h.state,
  h.vf_us AS state_since_us
FROM probes p LEFT JOIN hist h
  ON h.user_id = p.user_id AND h.vf_us <= p.pt_us
 AND (h.vt_us IS NULL OR p.pt_us < h.vt_us)


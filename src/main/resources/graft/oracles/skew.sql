-- DuckDB oracle SQL for the 'skew' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::saltedSkewJoin
WITH l AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
    CASE WHEN l_partkey % 4 < 3 THEN 0 ELSE l_partkey % 97 END AS sk
  FROM lineitem
), r AS (
  SELECT CASE WHEN p_partkey % 4 < 3 THEN 0 ELSE p_partkey % 97 END AS sk,
    count(*) AS n_parts
  FROM part GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.sk, l.l_quantity, r.n_parts
FROM l JOIN r USING (sk)

-- ::twoPhaseSkewAgg
SELECT CASE WHEN l_partkey % 4 < 3 THEN 0 ELSE l_partkey % 97 END AS sk,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
  COUNT(*) AS n_items
FROM lineitem GROUP BY 1


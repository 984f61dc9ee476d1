-- DuckDB oracle SQL for the 'layout' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::sortedLayoutRoundtrip
SELECT l_orderkey, l_linenumber, l_extendedprice,
  epoch_us(l_shipdate) AS ship_us
FROM lineitem
WHERE epoch_us(l_shipdate) >= 865123200000000
  AND epoch_us(l_shipdate) < 873072000000000


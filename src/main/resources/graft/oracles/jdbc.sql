-- DuckDB oracle SQL for the 'jdbc' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::jdbcRoundtrip
SELECT s_suppkey, s_name, s_acctbal
FROM supplier WHERE s_acctbal > 0.0


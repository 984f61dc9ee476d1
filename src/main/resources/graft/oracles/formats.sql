-- DuckDB oracle SQL for the 'formats' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::orcRoundtrip
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_orderkey >= 1000 AND l_orderkey < 4000

-- ::schemaEvolution
SELECT doc_id, lang, n_chars,
  CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 END AS quality
FROM documents

-- ::jsonlRoundtrip
SELECT doc_id, text, lang, source, n_chars FROM documents


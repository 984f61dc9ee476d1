-- DuckDB oracle SQL for the 'graph' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::triangles
WITH lp AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
bsz AS (SELECT ok FROM lp GROUP BY ok HAVING COUNT(*) <= 4096),
e AS (
  SELECT DISTINCT x.p AS a, y.p AS b
  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
  JOIN bsz ON bsz.ok = x.ok),
deg AS (
  SELECT v, COUNT(*) AS d
  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
    ON e3.a = e1.a AND e3.b = e2.b)
SELECT
  CAST((SELECT SUM(d) FROM deg) / 2 AS BIGINT) AS n_edges,
  CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
  n_triangles,
  round(3.0 * n_triangles / (SELECT SUM(d * (d - 1) / 2) FROM deg), 6)
    AS global_clustering
FROM tri

-- ::associationRules
WITH lp AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
bsz AS (SELECT ok FROM lp GROUP BY ok HAVING COUNT(*) <= 4096),
pairs AS (
  SELECT x.p AS a, y.p AS b, COUNT(*) AS n_pair
  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
  JOIN bsz ON bsz.ok = x.ok
  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
parts AS (SELECT p, COUNT(*) AS n_part FROM lp GROUP BY p),
nb AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM lp),
directed AS (
  SELECT a AS antecedent, b AS consequent, n_pair FROM pairs
  UNION ALL
  SELECT b, a, n_pair FROM pairs),
scored AS (
  SELECT antecedent, consequent, n_pair,
    pa.n_part AS n_ante, pc.n_part AS n_cons, n_baskets,
    (n_pair * n_baskets * 1000000) // (pa.n_part * pc.n_part) AS lift_u
  FROM directed
  JOIN parts pa ON pa.p = antecedent
  JOIN parts pc ON pc.p = consequent
  CROSS JOIN nb)
SELECT antecedent, consequent, n_pair, n_ante, n_cons,
  round(CAST(n_pair AS DOUBLE) / n_baskets, 6) AS support,
  round(CAST(n_pair AS DOUBLE) / n_ante, 6) AS confidence,
  CAST(lift_u AS BIGINT) AS lift_u
FROM scored
ORDER BY lift_u DESC, antecedent, consequent LIMIT 20

-- ::bfsHops
WITH lp AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
bsz AS (SELECT ok FROM lp GROUP BY ok HAVING COUNT(*) <= 4096),
e AS (
  SELECT DISTINCT x.p AS a, y.p AS b
  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
  JOIN bsz ON bsz.ok = x.ok),
sym AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL SELECT b, a FROM e),
hub AS (
  SELECT src AS node FROM sym GROUP BY src
  ORDER BY COUNT(*) DESC, src LIMIT 1),
walk AS (
  WITH RECURSIVE w(node, hops) AS (
    SELECT node, 0 FROM hub
    UNION
    SELECT s.dst, w.hops + 1 FROM w JOIN sym s ON s.src = w.node
    WHERE w.hops < 4
  ) SELECT node, hops FROM w)
SELECT node, CAST(MIN(hops) AS INT) AS hops
FROM walk GROUP BY node


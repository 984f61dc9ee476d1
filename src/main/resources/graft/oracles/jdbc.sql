-- ::jdbcRoundtrip
SELECT s_suppkey, s_name, s_acctbal
FROM supplier WHERE s_acctbal > 0.0


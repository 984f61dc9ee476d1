-- test fixture for OraclesSpec: a header-lookalike SQL comment glued to
-- the previous body (no blank separator) must be REJECTED at parse, not
-- silently split the section (ADVICE r16).
-- ::first
SELECT 1 AS x
-- ::lookalike
FROM lineitem

-- test fixture for OraclesSpec: exercises every substitution form and
-- the section-parsing contract. Not a registry family.
-- ::plain
SELECT 1 AS x
FROM lineitem

-- ::macros
SELECT {{DSUM:l_quantity}} AS sq, {{DSUM4:l_tax}} AS sq4,
       {{DAVG:l_discount}} AS ad
FROM lineitem

-- ::params
SELECT * FROM documents WHERE n <= {{cap}} AND lang IN ({{langs}})

-- ::interior

SELECT 'keeps interior blank lines'

FROM dual

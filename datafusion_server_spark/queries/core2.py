"""SQL-surface coverage, batch 2 (SURVEY §2.B): regexp family, map/struct
types, HAVING, USING/NATURAL joins, QUALIFY-style window filters, null
ordering, INTERSECT/EXCEPT ALL, interval arithmetic, IGNORE NULLS frames,
ordinal grouping."""

from __future__ import annotations

from datafusion_server_spark.queries import sql_query

D = "DECIMAL(38,6)"

sql_query(
    "regexp_functions",
    """
    SELECT p_partkey,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(p_type, '[aeiou]', '_') AS devoweled,
           p_type RLIKE '^[a-z]+ ' AS starts_word,
           CAST(LENGTH(REGEXP_REPLACE(p_name, '[^ ]', '')) + 1 AS BIGINT) AS n_words_re
    FROM part
    """,
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(p_type, '[aeiou]', '_', 'g') AS devoweled,
           REGEXP_MATCHES(p_type, '^[a-z]+ ') AS starts_word,
           CAST(LENGTH(REGEXP_REPLACE(p_name, '[^ ]', '', 'g')) + 1 AS BIGINT) AS n_words_re
    FROM part
    """,
)

sql_query(
    "struct_functions",
    """
    SELECT o_orderkey,
           NAMED_STRUCT('status', o_orderstatus, 'price', o_totalprice).status AS s_status,
           STRUCT(o_orderkey, o_custkey).o_custkey AS s_cust
    FROM orders WHERE o_orderkey < 200
    """,
    oracle="""
    SELECT o_orderkey,
           {'status': o_orderstatus, 'price': o_totalprice}.status AS s_status,
           {'o_orderkey': o_orderkey, 'o_custkey': o_custkey}.o_custkey AS s_cust
    FROM orders WHERE o_orderkey < 200
    """,
)

sql_query(
    "map_functions",
    """
    SELECT n_nationkey,
           ELEMENT_AT(MAP('key', n_regionkey), 'key') AS region_from_map,
           ELEMENT_AT(MAP('a', n_name), 'missing') IS NULL AS missing_is_null
    FROM nation
    """,
    oracle="""
    SELECT n_nationkey,
           MAP_EXTRACT(MAP {'key': n_regionkey}, 'key')[1] AS region_from_map,
           LEN(MAP_EXTRACT(MAP {'a': n_name}, 'missing')) = 0 AS missing_is_null
    FROM nation
    """,
)

sql_query(
    "having_clause",
    f"""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE), 6) AS total
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 12 AND SUM(CAST(o_totalprice AS {D})) > 1000000
    """,
)

sql_query(
    "join_using_clause",
    """
    SELECT n_nationkey, n_name, r_name
    FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation) n
    JOIN region USING (r_regionkey)
    """,
)

sql_query(
    "join_natural",
    """
    SELECT n_nationkey, r_name
    FROM (SELECT n_nationkey, n_regionkey AS r_regionkey FROM nation) n
    NATURAL JOIN region
    """,
)

# QUALIFY-style: top-2 orders per customer via window + outer filter
sql_query(
    "qualify_top_n_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2
    """,
)

sql_query(
    "order_nulls_handling",
    """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS maybe_status
    FROM orders WHERE o_orderkey < 300
    ORDER BY maybe_status ASC NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)

sql_query(
    "set_intersect_all",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 75
    INTERSECT ALL
    SELECT c_nationkey AS k FROM customer WHERE c_custkey > 40
    """,
)

sql_query(
    "set_except_all",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 100
    EXCEPT ALL
    SELECT c_nationkey AS k FROM customer WHERE c_custkey > 60
    """,
)

sql_query(
    "interval_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL '1' MONTH AS TIMESTAMP) AS plus_month,
           CAST(o_orderdate - INTERVAL '7' DAY AS TIMESTAMP) AS minus_week,
           CAST(o_orderdate + INTERVAL '90' MINUTE AS TIMESTAMP) AS plus_90m
    FROM orders WHERE o_orderkey < 300
    """,
)

sql_query(
    "window_ignore_nulls",
    """
    SELECT event_id, user_id,
           LAST_VALUE(NULLIF(event_type, 'click')) IGNORE NULLS
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_nonclick
    FROM events
    """,
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(NULLIF(event_type, 'click') IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_nonclick
    FROM events
    """,
)

sql_query(
    "group_by_ordinal",
    f"""
    SELECT o_orderstatus, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           ROUND(CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE), 6) AS total
    FROM orders GROUP BY 1, 2
    """,
)

sql_query(
    "ilike_patterns",
    """
    SELECT p_partkey, p_name,
           p_name ILIKE 'A%' AS starts_a_ci,
           p_name LIKE '%steel%' AS has_steel
    FROM part
    """,
)

sql_query(
    "in_between_predicates",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 15
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate NOT BETWEEN DATE '1997-01-01' AND DATE '1999-01-01'
    """,
)

sql_query(
    "nested_cte_chain",
    f"""
    WITH per_order AS (
      SELECT l_orderkey, SUM(CAST(l_extendedprice AS {D})) AS order_total
      FROM lineitem GROUP BY l_orderkey),
    big_orders AS (
      SELECT l_orderkey FROM per_order WHERE order_total > 300000),
    flagged AS (
      SELECT o.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big
      FROM orders o JOIN big_orders b ON b.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey)
    SELECT c.c_mktsegment, CAST(SUM(f.n_big) AS BIGINT) AS total_big
    FROM flagged f JOIN customer c ON c.c_custkey = f.o_custkey
    GROUP BY c.c_mktsegment
    """,
)

sql_query(
    "correlated_exists_double",
    """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_suppkey = s.s_suppkey AND l2.l_tax > 0.07)
    """,
)

sql_query(
    "recursive_cte_months",
    f"""
    WITH RECURSIVE months(m) AS (
      SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT CAST(m AS INT) AS month_no,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE), 6) AS total
    FROM months LEFT JOIN orders ON EXTRACT(MONTH FROM o_orderdate) = m
    GROUP BY m
    """,
)

sql_query(
    "union_mixed_shapes",
    f"""
    SELECT 'customer' AS entity, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(c_acctbal AS {D})) AS DOUBLE), 6) AS balance
    FROM customer
    UNION ALL
    SELECT 'supplier' AS entity, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(s_acctbal AS {D})) AS DOUBLE), 6) AS balance
    FROM supplier
    """,
)

from __future__ import annotations

from datafusion_server_spark.functions.dialect import (
    find_table_at_namespace,
    quote_table_at_namespace,
    rewrite_date_bin,
    rewrite_function_aliases,
    transpile,
)


def test_find_table_at_namespace():
    sql = "SELECT * FROM users@pg u JOIN orders@pg o ON u.id=o.uid WHERE note <> 'x@y'"
    assert find_table_at_namespace(sql) == [("users", "pg"), ("orders", "pg")]


def test_quote_table_at_namespace():
    out = quote_table_at_namespace("SELECT * FROM users@pg WHERE email='a@b.c'")
    assert "`users@pg`" in out
    assert "'a@b.c'" in out  # literal untouched


def test_date_bin_rewrite():
    out = rewrite_date_bin("SELECT date_bin(INTERVAL '5 minutes', ts) FROM t")
    assert "floor(unix_timestamp(ts) / 300) * 300" in out
    out2 = rewrite_date_bin("SELECT DATE_BIN(INTERVAL '1 hour', col_a) x FROM t")
    assert "3600" in out2


def test_function_aliases():
    out = rewrite_function_aliases("SELECT approx_distinct(x), strpos(a, b) FROM t")
    assert "approx_count_distinct(x)" in out
    assert "instr(a, b)" in out


def test_alias_not_inside_literal():
    out = rewrite_function_aliases("SELECT 'random(' FROM t")
    assert "'random('" in out


def test_transpile_combined():
    sql = "SELECT date_bin(INTERVAL '10 minutes', ts), approx_distinct(u) FROM ev@mydb"
    out = transpile(sql)
    assert "`ev@mydb`" in out and "600" in out and "approx_count_distinct" in out


def test_groups_frame_rejected():
    import pytest

    from datafusion_server_spark.functions.dialect import (
        UnsupportedDialectFeature,
        transpile,
    )

    with pytest.raises(UnsupportedDialectFeature):
        transpile("SELECT SUM(x) OVER (ORDER BY y GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t")
    # literal containing the keyword is fine
    assert transpile("SELECT 'GROUPS BETWEEN a and b' FROM t")

"""Unit tests for the HTML -> text extraction chain on hand-built
pages — independent of the query family's synthesized wrapper."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark.operators import htmltext


def _one(spark, html: str):
    df = spark.createDataFrame([(1, html)], "id long, html string")
    return htmltext.extract_text(df, "html").first()["clean_text"]


def test_strip_basic_page(spark):
    got = _one(
        spark,
        "<html><body><h1>Hello</h1>\n<p>world &amp; <b>friends</b></p></body></html>",
    )
    assert got == "Hello world & friends"


def test_script_and_style_payloads_removed_case_insensitive(spark):
    got = _one(
        spark,
        '<HTML><STYLE>p { color: red; }</STYLE><SCRIPT src="x.js">\n'
        'var a = "<p>fake</p>"; if (a < "b") { a = "&lt;"; }\n'
        "</SCRIPT><p>real</p></HTML>",
    )
    assert got == "real"


def test_comments_and_multiline_whitespace_collapse(spark):
    got = _one(
        spark,
        "<body><!-- nav\n<p>menu</p>\n--><p>a\n\t b</p>  <p>c</p></body>",
    )
    assert got == "a b c"


def test_entities_unescaped_amp_last(spark):
    got = _one(spark, "<p>1 &lt; 2 &gt; 0 &quot;q&quot; &#39;s&#39; a&nbsp;b &amp;co</p>")
    assert got == '1 < 2 > 0 "q" \'s\' a b &co'


def test_title_and_links_extraction(spark):
    html = (
        '<html><head><title> The &amp; Title </title></head>'
        '<body><a href="https://x.example/a?b=1">one</a>'
        '<a id="z" href="/rel">two</a><a>no-href</a></body></html>'
    )
    df = spark.createDataFrame([(1, html)], "id long, html string")
    row = htmltext.extract_meta(df, "html").first()
    assert row["title"] == "The & Title"
    assert row["n_links"] == 2
    assert row["first_link"] == "https://x.example/a?b=1"
    assert row["links_joined"] == "https://x.example/a?b=1|/rel"


def test_empty_and_tagless_inputs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "plain text only"), (3, "<p></p>")],
        "id long, html string",
    )
    rows = {r["id"]: r["clean_text"] for r in htmltext.extract_text(df, "html").collect()}
    assert rows == {1: "", 2: "plain text only", 3: ""}


def test_extraction_plan_is_shuffle_free(spark, sf_dir):
    """The whole extraction chain must stay inside one codegen stage:
    no Exchange in the executed plan of extract_text/extract_meta over
    the fixture corpus (the 100 TB scale property — map-only)."""
    from datafusion_server_spark import tables

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    wrapped = docs.withColumn(
        "html",
        F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")),
    )
    for df in (
        htmltext.extract_text(wrapped, "html"),
        htmltext.extract_meta(wrapped, "html"),
    ):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

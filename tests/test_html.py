"""HTML extraction tests (round 10): expected values + Spark↔DuckDB
twin parity on identical inputs (the regex-engine seam)."""

from __future__ import annotations

import duckdb
import pytest

from bergloom_spark.functions.html import (
    html_canonical,
    html_canonical_sql,
    html_links,
    html_links_sql,
    html_meta_content,
    html_meta_content_sql,
    html_title,
    html_title_sql,
)

PAGES = {
    "full": (
        "<html><head><TITLE>\n  My   Page\t</TITLE>"
        '<link rel="canonical" href="https://example.org/a" />'
        '<meta name="description" content="A page about tests">'
        '<meta content="noindex" name="robots">'
        '</head><body><a href="https://x.example/1">one</a>'
        "<p>text</p><A HREF='/relative'>two</A>"
        '<a class="btn" href="https://x.example/2#f">three</a>'
        "</body></html>"
    ),
    "empty": "<html><body>no structure</body></html>",
    "title_attrs": '<title id="t">Attr Title</title>',
    "single_quote_canon": (
        "<link rel='canonical' href='https://e.org/c'>"
    ),
}


@pytest.fixture(scope="module")
def page_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in PAGES.items()], "k string, html string"
    ).cache()


def _both(page_df, col_fn, sql_fn):
    got_spark = {
        r.k: r.v
        for r in page_df.select("k", col_fn("html").alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pages AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in PAGES) + ") t(k, html)",
        [x for kv in PAGES.items() for x in kv],
    )
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT k, {sql_fn('html')} FROM pages"
        ).fetchall()
    }
    con.close()
    assert got_spark == got_duck, "Spark/DuckDB twin divergence"
    return got_spark


def test_title(page_df):
    got = _both(page_df, html_title, html_title_sql)
    assert got["full"] == "My Page"  # whitespace collapsed, case-ins
    assert got["empty"] == ""
    assert got["title_attrs"] == "Attr Title"


def test_links(page_df):
    got = _both(page_df, html_links, html_links_sql)
    assert got["full"] == [
        "https://x.example/1", "/relative", "https://x.example/2#f",
    ]
    assert got["empty"] == []


def test_meta_description_both_orders(page_df):
    got = _both(
        page_df,
        lambda c: html_meta_content(c, "description"),
        lambda e: html_meta_content_sql(e, "description"),
    )
    assert got["full"] == "A page about tests"
    assert got["empty"] == ""
    got_robots = _both(
        page_df,
        lambda c: html_meta_content(c, "robots"),
        lambda e: html_meta_content_sql(e, "robots"),
    )
    assert got_robots["full"] == "noindex"  # content-first order


def test_canonical(page_df):
    got = _both(page_df, html_canonical, html_canonical_sql)
    assert got["full"] == "https://example.org/a"
    assert got["single_quote_canon"] == "https://e.org/c"
    assert got["empty"] == ""


def test_canonical_href_first_order(page_df):
    """Review r10 pass 2: href-before-rel attribute order."""
    pages = {
        "rev": '<link href="https://e.org/c2" rel="canonical">',
        "none": '<link href="https://e.org/x" rel="stylesheet">',
    }
    import duckdb as _d

    con = _d.connect()
    con.execute(
        "CREATE TABLE p2 AS SELECT * FROM (VALUES (?, ?), (?, ?)) "
        "t(k, html)",
        [x for kv in pages.items() for x in kv],
    )
    duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT k, {html_canonical_sql('html')} FROM p2"
        ).fetchall()
    }
    con.close()
    assert duck["rev"] == "https://e.org/c2"
    assert duck["none"] == ""


def test_canonical_href_first_spark(spark):
    df = spark.createDataFrame(
        [('<link href="https://e.org/c2" rel="canonical">',)],
        "html string",
    )
    assert df.select(
        html_canonical("html").alias("v")
    ).collect()[0].v == "https://e.org/c2"


class TestMainContent:
    """extract_main_content (round 11, verdict r10 stretch #9):
    jusText-style link-density block classifier."""

    PAGE = (
        '<html><body><nav><a href="/">Home</a> <a href="/b">Blog</a>'
        ' <a href="/c">Contact page link</a></nav>'
        "<article><p>This is the real article text with enough"
        ' length to be kept and a single <a href="/ref">reference</a>'
        " inline.</p><p>Second paragraph, also long enough to be"
        " considered content by the classifier.</p></article>"
        '<aside><a href="/r1">Related one</a>'
        '<a href="/r2">Related two story</a></aside>'
        '<footer><a href="/tos">Terms of service</a> | '
        '<a href="/priv">Privacy policy statement</a></footer>'
        "<script>var boilerplate = 'not text';</script></body></html>"
    )

    def test_keeps_article_drops_boilerplate_spark(self, spark):
        from bergloom_spark.functions.html import extract_main_content

        df = spark.createDataFrame([(self.PAGE,)], "h string")
        out = df.select(
            extract_main_content("h").alias("mc")
        ).collect()[0].mc
        lines = out.split("\n")
        assert len(lines) == 2
        assert lines[0].startswith("This is the real article")
        assert "reference" in lines[0]  # inline link text kept
        assert lines[1].startswith("Second paragraph")
        for boiler in ("Home", "Terms of service", "Related one",
                       "boilerplate"):
            assert boiler not in out

    def test_twin_parity_spark_vs_duckdb(self, spark):
        from bergloom_spark.functions.html import (
            extract_main_content,
            extract_main_content_sql,
        )

        pages = [
            self.PAGE,
            # head/title must never leak as leading content
            # (r11 self-review)
            "<html><head><title>Breaking news: markets rally on "
            "rate decision</title></head><body><p>The actual body "
            "paragraph, long enough to be kept.</p></body></html>",
            "<p>short</p>",  # below min_chars → empty result
            "<div>No tags at all but quite long plain text that "
            "should be kept as one block of content.</div>",
            '<ul><li><a href="/a">nav one</a></li>'
            '<li><a href="/b">nav two</a></li></ul>'
            "<p>A real paragraph after a link list, long enough to "
            "stay in the output text.</p>",
            "",
        ]
        df = spark.createDataFrame([(p,) for p in pages], "h string")
        got = [
            r.mc
            for r in df.select(
                extract_main_content("h").alias("mc")
            ).collect()
        ]
        for page, spark_out in zip(pages, got):
            esc = page.replace("'", "''")
            duck_out = duckdb.sql(
                f"SELECT {extract_main_content_sql(chr(39) + esc + chr(39))}"
            ).fetchone()[0]
            assert spark_out == duck_out, page[:60]

    def test_head_title_never_leaks(self, spark):
        from bergloom_spark.functions.html import extract_main_content

        page = (
            "<html><head><title>Breaking news: markets rally on "
            "rate decision today</title>"
            '<meta name="description" content="long enough meta '
            'description text that must not leak either"></head>'
            "<body><p>Only this body paragraph should survive the "
            "classifier as content.</p></body></html>"
        )
        df = spark.createDataFrame([(page,)], "h string")
        out = df.select(
            extract_main_content("h").alias("mc")
        ).collect()[0].mc
        assert out == ("Only this body paragraph should survive "
                       "the classifier as content.")

    def test_plan_is_single_codegen_stage(self, spark):
        from bergloom_spark.functions.html import extract_main_content

        df = spark.createDataFrame([(self.PAGE,)], "h string")
        plan = (
            df.select(extract_main_content("h").alias("mc"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

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

"""URL function tests (round 10): expected values + Spark↔DuckDB
twin parity on the same inputs — the regex-engine seam (Java vs RE2)
is exactly where the r5 ``\\s`` divergence lived, so every function
is driven through BOTH engines here."""

from __future__ import annotations

import duckdb
import pytest

from bergloom_spark.functions.urls import (
    url_host,
    url_host_sql,
    url_normalize,
    url_normalize_sql,
    url_path,
    url_path_sql,
    url_query,
    url_query_sql,
    url_registrable_domain,
    url_registrable_domain_sql,
    url_scheme,
    url_scheme_sql,
)

URLS = [
    "https://www.Example.COM/path/to/page?a=1&b=2#frag",
    "http://user:pw@sub.news.example.co.uk:8080/x?q=hi",
    "https://example.org",
    "https://example.org/",
    "https://example.org:443/home",
    "http://example.org:80",
    "HTTPS://UP.EXAMPLE.NET/Mixed/Case?UTM_x=1",
    "https://a.b/p?utm_source=tw&utm_medium=social&x=1",
    "https://a.b/p?x=1&utm_campaign=c",
    "https://a.b/p?utm_source=only",
    "https://a.b/p?gclid=123&fbclid=456",
    "ftp://files.example.com/pub/file.txt",
    "not a url at all",
    "https://localhost/admin",
    "https://192.168.0.1/status?x=2",
    "https://example.org/trail/",
    "https://example.org/?utm_source=x",
]

EXPECTED_NORM = {
    "https://www.Example.COM/path/to/page?a=1&b=2#frag":
        "https://www.example.com/path/to/page?a=1&b=2",
    "http://user:pw@sub.news.example.co.uk:8080/x?q=hi":
        "http://user:pw@sub.news.example.co.uk:8080/x?q=hi",
    "https://example.org": "https://example.org",
    "https://example.org/": "https://example.org",
    "https://example.org:443/home": "https://example.org/home",
    "http://example.org:80": "http://example.org",
    "HTTPS://UP.EXAMPLE.NET/Mixed/Case?UTM_x=1":
        "https://up.example.net/Mixed/Case?UTM_x=1",  # case-sig UTM
    "https://a.b/p?utm_source=tw&utm_medium=social&x=1":
        "https://a.b/p?x=1",
    "https://a.b/p?x=1&utm_campaign=c": "https://a.b/p?x=1",
    "https://a.b/p?utm_source=only": "https://a.b/p",
    "https://a.b/p?gclid=123&fbclid=456": "https://a.b/p",
    "https://example.org/trail/": "https://example.org/trail/",
    "https://example.org/?utm_source=x": "https://example.org",
}


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame(
        [(u,) for u in URLS], "url string"
    ).cache()


def _both(spark, url_df, col_fn, sql_fn):
    got_spark = {
        r.url: r.v
        for r in url_df.select("url", col_fn("url").alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE urls AS SELECT * FROM (VALUES "
        + ",".join("(?)" for _ in URLS) + ") t(url)",
        URLS,
    )
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT url, {sql_fn('url')} FROM urls"
        ).fetchall()
    }
    con.close()
    assert got_spark == got_duck, "Spark/DuckDB twin divergence"
    return got_spark


def test_scheme(spark, url_df):
    got = _both(spark, url_df, url_scheme, url_scheme_sql)
    assert got["https://www.Example.COM/path/to/page?a=1&b=2#frag"] == "https"
    assert got["HTTPS://UP.EXAMPLE.NET/Mixed/Case?UTM_x=1"] == "https"
    assert got["ftp://files.example.com/pub/file.txt"] == "ftp"
    assert got["not a url at all"] == ""


def test_host(spark, url_df):
    got = _both(spark, url_df, url_host, url_host_sql)
    assert got["https://www.Example.COM/path/to/page?a=1&b=2#frag"] == (
        "www.example.com"
    )
    assert got["http://user:pw@sub.news.example.co.uk:8080/x?q=hi"] == (
        "sub.news.example.co.uk"
    )
    assert got["https://example.org"] == "example.org"
    assert got["https://192.168.0.1/status?x=2"] == "192.168.0.1"
    assert got["not a url at all"] == ""


def test_path(spark, url_df):
    got = _both(spark, url_df, url_path, url_path_sql)
    assert got["https://www.Example.COM/path/to/page?a=1&b=2#frag"] == (
        "/path/to/page"
    )
    assert got["https://example.org"] == ""
    assert got["https://example.org/"] == "/"
    assert got["https://example.org/trail/"] == "/trail/"


def test_query(spark, url_df):
    got = _both(spark, url_df, url_query, url_query_sql)
    assert got["https://www.Example.COM/path/to/page?a=1&b=2#frag"] == (
        "a=1&b=2"
    )
    assert got["https://example.org"] == ""


def test_registrable_domain_default(spark, url_df):
    got = _both(
        spark, url_df, url_registrable_domain,
        url_registrable_domain_sql,
    )
    assert got["https://www.Example.COM/path/to/page?a=1&b=2#frag"] == (
        "example.com"
    )
    # last-2-labels approximation without the suffix argument:
    assert got["http://user:pw@sub.news.example.co.uk:8080/x?q=hi"] == (
        "co.uk"
    )
    assert got["https://localhost/admin"] == "localhost"


def test_registrable_domain_extra_suffixes(spark, url_df):
    fn = lambda c: url_registrable_domain(c, ("co.uk",))  # noqa: E731
    fs = lambda e: url_registrable_domain_sql(e, ("co.uk",))  # noqa: E731
    got = _both(spark, url_df, fn, fs)
    assert got["http://user:pw@sub.news.example.co.uk:8080/x?q=hi"] == (
        "example.co.uk"
    )
    assert got["https://www.Example.COM/path/to/page?a=1&b=2#frag"] == (
        "example.com"
    )


def test_normalize(spark, url_df):
    got = _both(spark, url_df, url_normalize, url_normalize_sql)
    for url, want in EXPECTED_NORM.items():
        assert got[url] == want, url


def test_normalize_dedups_tracking_variants(spark):
    variants = [
        "https://Example.com/a?utm_source=tw",
        "https://example.com/a?utm_campaign=x&utm_medium=y",
        "https://example.com:443/a",
        "https://example.com/a#section",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    keys = {
        r.v for r in df.select(url_normalize("url").alias("v")).collect()
    }
    assert keys == {"https://example.com/a"}


def test_url_resolve_rfc3986_cases(spark):
    from bergloom_spark.functions.urls import url_resolve

    # RFC 3986 §5.4 normal-example battery
    base = "http://a/b/c/d;p?q"
    cases = {
        "g": "http://a/b/c/g",
        "./g": "http://a/b/c/g",
        "/g": "http://a/g",
        "//g": "http://g",
        "?y": "http://a/b/c/d;p?y",
        "g?y": "http://a/b/c/g?y",
        "#s": "http://a/b/c/d;p?q#s",
        "../g": "http://a/b/g",
        "../../g": "http://a/g",
        "http://x/y": "http://x/y",
        "": base,
    }
    df = spark.createDataFrame(
        [(base, r) for r in cases], "base string, ref string"
    )
    got = {
        r.ref: r.v
        for r in df.select(
            "ref", url_resolve("base", "ref").alias("v")
        ).collect()
    }
    for ref, want in cases.items():
        assert got[ref] == want, ref


def test_crawl_link_graph(spark, sf_dir):
    from bergloom_spark.operators.crawl import crawl_link_graph
    from bergloom_spark.operators.warc import make_warc

    rows = []
    for i in range(24):
        html = (
            f'<a href="/internal/{i}">x</a>'
            f'<a href="https://ext{i % 3}.example/p">y</a>'
        )
        rows.append(
            (i, make_warc([{
                "url": f"https://src{i % 2}.example/page/{i}",
                "text": html,
            }], seed=f"lg:{i}"))
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    edges = {
        (r.src_site, r.dst_site): r.n_links
        for r in crawl_link_graph(df.repartition(4)).collect()
    }
    # relative hrefs resolve back to the source site
    assert edges[("src0.example", "src0.example")] == 12
    assert edges[("src1.example", "src1.example")] == 12
    # externals: i%2 x i%3 lattice → each (src, ext) pair gets 4
    for s in range(2):
        for e in range(3):
            assert edges[(f"src{s}.example", f"ext{e}.example")] == 4


def test_normalize_ampersand_path_untouched(spark, url_df):
    """Review r10: a literal '&' in the path (or a query with no
    tracking params) must never be rewritten."""
    cases = {
        "http://x.example/a&b": "http://x.example/a&b",
        "http://x.example/a&b?utm_source=1": "http://x.example/a&b",
        "http://x.example/a&b?k=1": "http://x.example/a&b?k=1",
        "http://x.example/p?": "http://x.example/p",
        "http://x.example/p?a=1&b=2": "http://x.example/p?a=1&b=2",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r.url: r.v
        for r in df.select("url", url_normalize("url").alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u2 AS SELECT * FROM (VALUES "
        + ",".join("(?)" for _ in cases) + ") t(url)",
        list(cases),
    )
    duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT url, {url_normalize_sql('url')} FROM u2"
        ).fetchall()
    }
    con.close()
    assert got == duck
    for url, want in cases.items():
        assert got[url] == want, url


def test_query_not_faked_by_fragment(spark):
    """Review r10: '?' inside the fragment is not a query."""
    from bergloom_spark.functions.urls import url_query, url_query_sql

    df = spark.createDataFrame(
        [("http://x/p#frag?notquery",), ("http://x/p?q=1#f?x",)],
        "url string",
    )
    got = {
        r.url: r.v
        for r in df.select("url", url_query("url").alias("v")).collect()
    }
    assert got["http://x/p#frag?notquery"] == ""
    assert got["http://x/p?q=1#f?x"] == "q=1"
    duck = duckdb.sql(
        f"SELECT {url_query_sql('u')} FROM (VALUES "
        "('http://x/p#frag?notquery'), ('http://x/p?q=1#f?x')) t(u)"
    ).fetchall()
    assert [r[0] for r in duck] == ["", "q=1"]


def test_ipv6_host_kept_whole(spark):
    """Review r10: bracketed IPv6 literals pass through whole."""
    from bergloom_spark.functions.urls import url_host, url_host_sql

    df = spark.createDataFrame(
        [("http://[2001:db8::1]:8080/x?q=1",)], "url string"
    )
    got = df.select(url_host("url").alias("v")).collect()[0].v
    assert got == "[2001:db8::1]"
    duck = duckdb.sql(
        f"SELECT {url_host_sql('u')} FROM (VALUES "
        "('http://[2001:db8::1]:8080/x?q=1')) t(u)"
    ).fetchone()[0]
    assert duck == got


def test_site_key_ip_and_trailing_dot(spark):
    """Review r10 pass 2: IP literals pass through whole; trailing
    root-dot FQDNs normalize."""
    from bergloom_spark.functions.urls import (
        url_host,
        url_registrable_domain,
        url_registrable_domain_sql,
    )

    urls = [
        "http://192.168.0.1/x",
        "http://[2001:db8::1]/x",
        "https://example.com./y",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: (r.h, r.s)
        for r in df.select(
            "url",
            url_host("url").alias("h"),
            url_registrable_domain("url").alias("s"),
        ).collect()
    }
    assert got["http://192.168.0.1/x"] == ("192.168.0.1", "192.168.0.1")
    assert got["http://[2001:db8::1]/x"][1] == "[2001:db8::1]"
    assert got["https://example.com./y"] == ("example.com", "example.com")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u3 AS SELECT * FROM (VALUES "
        + ",".join("(?)" for _ in urls) + ") t(url)", urls,
    )
    duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT url, {url_registrable_domain_sql('url')} FROM u3"
        ).fetchall()
    }
    con.close()
    assert duck == {u: got[u][1] for u in urls}


def test_normalize_trailing_root_dot(spark):
    """Review r10 pass 3: the dedup key agrees with url_host on
    FQDN root-dot forms, including with a port."""
    urls = [
        "http://example.com./page",
        "http://example.com/page",
        "http://example.com.:8080/page",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.v
        for r in df.select("url", url_normalize("url").alias("v")).collect()
    }
    assert got["http://example.com./page"] == "http://example.com/page"
    assert got["http://example.com.:8080/page"] == (
        "http://example.com:8080/page"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u4 AS SELECT * FROM (VALUES "
        + ",".join("(?)" for _ in urls) + ") t(url)", urls,
    )
    duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT url, {url_normalize_sql('url')} FROM u4"
        ).fetchall()
    }
    con.close()
    assert duck == got

"""End-to-end crawl pipeline test (round 10): WARC explosion →
URL/HTML/text column battery → site stats, driven on real testdata
doc_ids with exact recipe assertions and a plan check (the shuffle
posture is the point of the composition)."""

from __future__ import annotations

import pytest

from bergloom_spark.operators.crawl import (
    crawl_site_stats,
    crawl_text_pipeline,
)
from bergloom_spark.operators.warc import make_warc


def _payload(i: int) -> bytes:
    pages = []
    for j in range(1 + i % 3):
        html = (
            f"<html><head><title>Doc {i} page {j}</title></head>"
            f"<body><script>var x=1;</script>"
            f"<p>body  text {i} {j}</p></body></html>"
        )
        pages.append(
            {
                "url": (
                    f"https://Sub.site{i % 4}.example:443/p/{j}"
                    f"?utm_source=x&k={j}"
                ),
                "text": html,
                "status": 200 if j % 3 != 2 else 404,
                "content_type": (
                    "text/html" if j % 3 != 1 else "image/png"
                ),
            }
        )
    return make_warc(pages, gzip_records=i % 2 == 1, seed=f"c:{i}")


@pytest.fixture(scope="module")
def crawl_df(spark, sf_dir):
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(60).collect()
    ]
    rows = [(int(i), _payload(int(i))) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return crawl_text_pipeline(df.repartition(8)).cache()


def test_pipeline_fields_exact(crawl_df):
    rows = crawl_df.collect()
    assert rows
    for r in rows:
        i, j = r.doc_id, r.rec_index - 1  # rec 0 is warcinfo
        # only 200-OK text/html records survive: j % 3 == 0
        assert j % 3 == 0
        assert r.url == (
            f"https://sub.site{i % 4}.example/p/{j}?k={j}"
        )  # lowercased host, :443 and utm_source stripped
        assert r.host == f"sub.site{i % 4}.example"
        assert r.site == f"site{i % 4}.example"
        assert r.title == f"Doc {i} page {j}"
        # strip_markup keeps tag CONTENT (incl. the head title) and
        # drops script bodies; whitespace collapsed
        assert r.text == f"Doc {i} page {j} body text {i} {j}"
        assert r.text_len == len(r.text)


def test_pipeline_keeps_expected_count(crawl_df, spark, sf_dir):
    ids = [
        int(r.doc_id)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(60).collect()
    ]
    # pages with j % 3 == 0 among range(1 + i % 3): j = 0 always
    # qualifies; j = 1, 2 never do (content-type / status)
    assert crawl_df.count() == len(ids)


def test_site_stats(crawl_df):
    stats = {r.site: r for r in crawl_site_stats(crawl_df).collect()}
    assert set(stats) == {f"site{k}.example" for k in range(4)}
    total = sum(r.n_pages for r in stats.values())
    assert total == crawl_df.count()
    for r in stats.values():
        assert r.n_urls <= r.n_pages
        assert r.avg_text_len > 0


def test_pipeline_plan_single_shuffle(crawl_df):
    """The page battery runs in the scan's map stage: exactly one
    exchange before aggregation (the repartition), none between the
    WARC kernel and the column work."""
    plan = crawl_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints the
    # pre-adaptive plan again below; count real exchanges only
    assert final.count("Exchange") <= 1, final
    assert "MapInPandas" in final
    assert "*(" in final  # the column battery is codegen'd


def test_pages_to_wet_roundtrip(crawl_df):
    """Sink side: cleaned pages re-pack as WET conversion archives
    that parse back to exactly the pages that went in."""
    from bergloom_spark.operators.crawl import pages_to_wet
    from bergloom_spark.operators.warc import parse_warc

    # multiset: the fixture's URLs collide across docs by design
    pages_in = sorted(
        (r.url, r.text) for r in crawl_df.collect()
    )
    archives = pages_to_wet(crawl_df).collect()
    assert archives
    pages_out = []
    for a in archives:
        recs = parse_warc(bytes(a.payload))
        body = [r for r in recs if r["record_type"] == "conversion"]
        assert len(body) == a.n_records
        pages_out.extend(
            (r["target_uri"], r["payload_text"]) for r in body
        )
    assert sorted(pages_out) == pages_in


def test_wet_record_ids_partition_invariant(crawl_df):
    """ADVICE r10 (low): record ids were seeded from the batch's
    FIRST url, so ids collided across batches sharing a first URL
    and varied with partitioning. Now each conversion record's id
    derives solely from its own (url, content-hash): the same page
    gets the same id however the export is partitioned, and
    distinct pages never collide."""
    from bergloom_spark.operators.crawl import pages_to_wet
    from bergloom_spark.operators.warc import parse_warc

    def ids_by_page(df):
        out = {}
        for a in pages_to_wet(df).collect():
            for r in parse_warc(bytes(a.payload)):
                if r["record_type"] != "conversion":
                    continue
                key = (r["target_uri"], r["payload_text"])
                out.setdefault(key, set()).add(r["record_id"])
        return out

    one = ids_by_page(crawl_df.coalesce(1))
    many = ids_by_page(crawl_df.repartition(7))
    assert one == many
    # every page maps to exactly one id; distinct pages → distinct ids
    assert all(len(v) == 1 for v in one.values())
    flat = [next(iter(v)) for v in one.values()]
    assert len(set(flat)) == len(flat)


def test_pipeline_detect_charset_recovers_undeclared_page(spark):
    """Opt-in detection at the pipeline level: an UNDECLARED cp1251
    page vanishes by default and is recovered with
    detect_charset=True."""
    from bergloom_spark.operators.crawl import crawl_text_pipeline
    from bergloom_spark.operators.warc import make_warc

    w = make_warc([
        {"url": "https://ru.example/a",
         "text": "<html><body><p>Ещё одна страница на русском "
                 "языке без объявления</p></body></html>",
         "encoding": "cp1251", "content_type": "text/html"},
        {"url": "https://en.example/b",
         "text": "<html><body><p>plain page</p></body></html>"},
    ], seed="det-pipe")
    df = spark.createDataFrame([(1, w)], "doc_id long, payload binary")
    default = crawl_text_pipeline(df).collect()
    assert len(default) == 1  # undeclared legacy page dropped
    detected = crawl_text_pipeline(df, detect_charset=True).collect()
    assert len(detected) == 2
    texts = {r.url: r.text for r in detected}
    assert any("русском" in t for t in texts.values())

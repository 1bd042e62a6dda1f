"""End-to-end crawl ingest composition — the stage chain a Common
Crawl-style pipeline runs over raw archives before ANY of the
dedup/quality/pack operators in this repo see a document:

    WARC record explosion (``operators/warc.py``, map-only)
      → keep 200-OK text/html response records
      → URL normalization + site key (``functions/urls.py``)
      → title + boilerplate-stripped text (``functions/html.py`` /
        ``functions/text.py``)
      → optional per-site aggregates

Everything after the record explosion is whole-stage-codegen column
work over the SAME map partition — the plan has exactly one shuffle
(the table read) until ``crawl_site_stats`` adds the per-site
aggregation, which shuffles short site keys, never page bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bergloom_spark.functions.html import html_links, html_title
from bergloom_spark.functions.text import strip_markup
from bergloom_spark.functions.urls import (
    url_host,
    url_normalize,
    url_registrable_domain,
    url_resolve,
)
from bergloom_spark.operators.warc import warc_records

__all__ = [
    "crawl_text_pipeline",
    "crawl_site_stats",
    "crawl_link_graph",
    "pages_to_wet",
]


def _kept_pages(recs: DataFrame) -> DataFrame:
    """The ONE page-keeping policy (text pipeline and link graph
    must agree on which pages exist — review r10): ``response``
    records with HTTP 200 and a ``text/html`` content type whose
    body decoded as UTF-8 (binary bodies carry NULL text from the
    explosion and belong to the multimodal pipeline)."""
    return recs.filter(
        (F.col("record_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
        & F.col("payload_text").isNotNull()
    )


def crawl_text_pipeline(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    detect_charset: bool = False,
) -> DataFrame:
    """Binary WARC column → one row per kept page:
    ``(doc_id, rec_index, url, host, site, title, text, text_len)``.
    Page-keeping policy: :func:`_kept_pages`. ``detect_charset=True``
    additionally recovers UNDECLARED legacy-charset pages through
    the deterministic script-range sniffer (r11, opt-in)."""
    recs = warc_records(
        df, payload_col=payload_col, id_col=id_col,
        detect_charset=detect_charset,
    )
    pages = _kept_pages(recs)
    text = strip_markup(F.col("payload_text"))
    return pages.select(
        id_col,
        "rec_index",
        url_normalize(F.col("target_uri")).alias("url"),
        url_host(F.col("target_uri")).alias("host"),
        url_registrable_domain(F.col("target_uri")).alias("site"),
        html_title(F.col("payload_text")).alias("title"),
        text.alias("text"),
        F.length(text).alias("text_len"),
    )


def crawl_link_graph(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    detect_charset: bool = False,
) -> DataFrame:
    """Site-to-site link edges from raw WARC columns:
    ``(src_site, dst_site, n_links)``. Links extract scan-side
    (``html_links`` array), explode AFTER projection to the href
    array (page text is dropped before the explode), resolve against
    the page URL (relative hrefs are the common case), and aggregate
    on two short site keys — the only shuffle. ``detect_charset``
    must be set consistently with :func:`crawl_text_pipeline`: the
    two views share :func:`_kept_pages`' ONE page-keeping policy,
    so they must also share the decode that feeds it (review r11
    pass 2)."""
    recs = warc_records(
        df, payload_col=payload_col, id_col=id_col,
        detect_charset=detect_charset,
    )
    pages = _kept_pages(recs).select(
        F.col("target_uri").alias("base"),
        url_registrable_domain(F.col("target_uri")).alias("src_site"),
        html_links(F.col("payload_text")).alias("hrefs"),
    )
    edges = pages.select(
        "base", "src_site", F.explode("hrefs").alias("href")
    ).select(
        "src_site",
        url_registrable_domain(
            url_resolve(F.col("base"), F.col("href"))
        ).alias("dst_site"),
    ).filter(F.col("dst_site") != "")
    return edges.groupBy("src_site", "dst_site").agg(
        F.count("*").alias("n_links")
    )


def pages_to_wet(pages: DataFrame) -> DataFrame:
    """The SINK side: re-pack cleaned pages as WET-style archives —
    one ``conversion``-record WARC per Arrow batch, ``(n_records,
    payload)`` rows ready for a binary sink; no driver collection.

    Record-id scheme (ADVICE r10 + r11, review r12): each id derives
    from the page's url + content hash, salted with the page's
    GLOBAL occurrence number among identical (url, hash) pages —
    computed with one window over the duplicate key, so duplicates
    get distinct WARC-Record-IDs regardless of which partition they
    land in (a per-partition counter still collided across
    partitions). Non-duplicated pages (the corpus norm) always get
    occurrence 1, so their record bytes are partitioning-independent;
    for the duplicates the SET of emitted ids is deterministic (the
    rows are bytewise identical, so which physical row takes which
    occurrence is unobservable). Cost: the one shuffle the uniqueness
    guarantee needs — on (url, content-hash), the key any global
    counter must group by; page bodies ride it once at export time.
    The warcinfo id is a constant."""
    from pyspark.sql import Window

    keyed = pages.select(
        "url",
        "text",
        F.sha1(F.encode(F.col("text"), "UTF-8")).alias("__h"),
    ).withColumn(
        "__occ",
        F.row_number().over(
            Window.partitionBy("url", "__h").orderBy(
                F.monotonically_increasing_id()
            )
        ),
    )

    def kernel(batches):
        import pandas as pd

        from bergloom_spark.operators.warc import _record_uuid, make_warc

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"n_records": pd.Series([], dtype="int64"),
                     "payload": pd.Series([], dtype=object)}
                )
                continue
            specs = [
                {
                    "url": url,
                    "text": text,
                    "conversion": True,
                    "record_id": _record_uuid(
                        f"wet:{url}:{h}:{occ}"
                    ),
                }
                for url, text, h, occ in zip(
                    pdf["url"], pdf["text"], pdf["__h"], pdf["__occ"]
                )
            ]
            payload = make_warc(specs, warcinfo=True, seed="wet-export")
            yield pd.DataFrame(
                {"n_records": [len(specs)], "payload": [payload]}
            )

    return keyed.mapInPandas(
        kernel, "n_records long, payload binary"
    )


def crawl_site_stats(pages: DataFrame) -> DataFrame:
    """Per-site corpus statistics over :func:`crawl_text_pipeline`
    output: page count, distinct normalized URLs, mean text length.
    One partial-agg shuffle on the short site key."""
    return pages.groupBy("site").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("url").alias("n_urls"),
        F.avg("text_len").alias("avg_text_len"),
    )

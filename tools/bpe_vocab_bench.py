"""Realistic-vocabulary BPE learn measurement (VERDICT r4 #6).

Runs ``bpe_learn_fast`` (distributed word-count pass + incremental
driver merge loop) over the sf0.1 documents at a production-shaped
merge count and reports wall time, vocabulary size, merges learned,
and driver RSS before/after the loop — the claim under test is that
the loop is O(vocabulary) in memory and fast at 10k merges, where the
one-job-per-round loop would take hours.

Usage: python tools/bpe_vocab_bench.py [n_merges]   (default 10000)
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bergloom_spark.io import load_table  # noqa: E402
from bergloom_spark.operators.bpe import bpe_learn_fast  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _rich_corpus(spark, n_rows=100_000, words_per_row=40, vocab=150_000):
    """Deterministic Zipf-ish corpus: the driver-shipped documents
    have a 31-word template vocabulary (measured), which exhausts BPE
    after ~107 merges — useless for a 10k-merge measurement. This
    synthesizes text whose DISTINCT-word count is realistic: word
    index k is log-uniform in [0, vocab) (heavy-tailed like Zipf),
    spelled as base-26 letters with data-dependent length 3-12."""
    from pyspark.sql import functions as F

    ks = (
        f"transform(sequence(1, {words_per_row}), w -> "
        f"CAST(power({vocab}, "
        "(abs(hash(id * 1000 + w)) % 1000000) / 1000000.0) AS BIGINT))"
    )
    word = (
        "concat_ws('', transform(sequence(0, 2 + k % 10), "
        "j -> char(97 + CAST(k / power(26, j) AS BIGINT) % 26)))"
    )
    return spark.range(n_rows).select(
        F.expr(
            f"concat_ws(' ', transform({ks}, k -> {word}))"
        ).alias("text")
    )


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark(app_name="bpe-vocab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for label, df in (
        ("sf0.1-documents", load_table(spark, SF_DIR, "documents")),
        ("synthetic-rich", _rich_corpus(spark)),
    ):
        rss0 = _rss_mb()
        t0 = time.monotonic()
        merges = bpe_learn_fast(
            df, "text", n_merges=n_merges, max_vocab_rows=5_000_000
        )
        wall = time.monotonic() - t0
        rss1 = _rss_mb()
        print(
            f"[{label}] requested={n_merges} learned={len(merges)} "
            f"wall={wall:.1f}s driver_rss_before={rss0:.0f}MB "
            f"driver_rss_after={rss1:.0f}MB"
        )
        print("  last 5 merges:", merges[-5:])
    spark.stop()


if __name__ == "__main__":
    main()

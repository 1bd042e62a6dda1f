"""Materialize a 10x scale-up of /root/testdata/sf0.1 for scaling runs.

The driver ships sf0.001/0.01/0.1 only; VERDICT r3 #4 asks for
one-decade-up measurements of the heavy headline queries. This derives
"sf1" from sf0.1 mechanically (10 shifted copies) with per-copy
DECORRELATION so the dedup/similarity queries see realistic data, not
an artifact:

- documents: per-copy letter-substitution cipher (a Caesar rotation of
  [a-z] keyed by the copy index) — word lengths, whitespace and
  punctuation stay, but every shingle changes, so copies are NOT
  near-duplicates of each other (a plain 10x copy would explode
  MinHash pair counts quadratically and measure the artifact, not the
  operator).
- embeddings: rotate each vector by `copy` positions — norms and
  intra-copy geometry preserved, cross-copy correlation broken.
- lineitem: shift l_orderkey per copy past the max key.

Timing-only data: correctness oracles always run on the pristine
driver-shipped parquet.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sfx1)
"""

from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bergloom_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SF_COPIES", "10"))


def _cipher(col, shift: int):
    if shift % 26 == 0:
        return col
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    rot = lower[shift % 26 :] + lower[: shift % 26]
    rotu = upper[shift % 26 :] + upper[: shift % 26]
    return F.translate(col, lower + upper, rot + rotu)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx1"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
            *[
                _cipher(F.col(c.name), i).alias(c.name)
                if c.name == "text"
                else F.col(c.name)
                for c in docs.schema.fields
                if c.name != "doc_id"
            ],
        )
        for i in range(COPIES)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    id_col = "id" if "id" in emb.columns else emb.columns[0]
    vec_col = next(
        c for c, t in emb.dtypes if t.startswith("array")
    )
    n_emb = emb.agg(F.max(id_col)).first()[0] + 1
    eparts = []
    for i in range(COPIES):
        rotated = (
            F.concat(
                F.slice(F.col(vec_col), i + 1, 10_000),
                F.slice(F.col(vec_col), 1, i),
            )
            if i
            else F.col(vec_col)
        )
        eparts.append(
            emb.select(
                (F.col(id_col) + F.lit(i * n_emb)).alias(id_col),
                *[
                    rotated.alias(c.name)
                    if c.name == vec_col
                    else F.col(c.name)
                    for c in emb.schema.fields
                    if c.name != id_col
                ],
            )
        )
    ebig = eparts[0]
    for p in eparts[1:]:
        ebig = ebig.unionByName(p)
    ebig.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    n_ord = li.agg(F.max("l_orderkey")).first()[0] + 1
    lparts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * n_ord)).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        for i in range(COPIES)
    ]
    lbig = lparts[0]
    for p in lparts[1:]:
        lbig = lbig.unionByName(p)
    lbig.repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    # events: 10x with shifted ids (round 5 — the streaming ingest /
    # rollup exponents are meaningless against a same-size events
    # table). Timestamps keep their range (density grows, the window
    # count does not — matching how a busier service scales).
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    n_usr = ev.agg(F.max("user_id")).first()[0] + 1
    evparts = [
        ev.select(
            (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
            (F.col("user_id") + F.lit(i * n_usr)).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        )
        for i in range(COPIES)
    ]
    evbig = evparts[0]
    for p in evparts[1:]:
        evbig = evbig.unionByName(p)
    evbig.repartition(32).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )

    # remaining tables: plain copies (only referenced for completeness)
    for t in (
        "region nation customer supplier part orders".split()
    ):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    print(f"sf1 written to {out}")
    spark.stop()


if __name__ == "__main__":
    main()

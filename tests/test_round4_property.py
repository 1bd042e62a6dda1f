"""Round-4 property tests: Spark operators pinned against pure-Python
references on generated inputs (the same strategy as rounds 2-3)."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _py_jaccard_pairs(docs: dict[int, str], n: int, threshold: float):
    """Reference: exact n-gram Jaccard over distinct token shingles."""
    def shingle_set(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sets = {i: shingle_set(t) for i, t in docs.items()}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_ngram_jaccard_pairs_matches_python_reference(spark):
    """Generated near-dup corpus: shared sentence stems force real
    pair structure; the posting-join result must equal the pure-Python
    set computation exactly (hash collisions are the same md5 both
    sides never disagree on string-level sets at these sizes)."""
    from bergloom_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    stems = [
        " ".join(rng.choice(vocab) for _ in range(12)) for _ in range(8)
    ]
    docs = {}
    for i in range(60):
        stem = rng.choice(stems)
        tail = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 6)))
        docs[i] = f"{stem} {tail}".strip()
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.4
        ).collect()
    }
    want = _py_jaccard_pairs(docs, 3, 0.4)
    assert got == want
    assert len(want) > 5  # the generator produced real structure


@settings(max_examples=25, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=200,
    )
)
def test_char_entropy_matches_python(spark_global, text):
    from bergloom_spark.functions.text import char_entropy

    df = spark_global.createDataFrame([(text,)], "text string")
    got = df.select(char_entropy(F.col("text")).alias("h")).collect()[0].h
    chars = list(text)
    if not chars:
        expected = 0.0
    else:
        n = len(chars)
        s = sum(
            c * math.log(c)
            for c in (chars.count(ch) for ch in set(chars))
        )
        expected = round((math.log(n) - s / n) / math.log(2.0), 6)
    assert got == pytest.approx(expected, abs=2e-6)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_replicate_changelog_idempotent(spark, tmp_path):
    """Re-running replication with no new source commits is a no-op:
    same rows, same snapshot count (exactly-once guard + empty feed)."""
    from bergloom_spark.lake import LakeTable
    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import replicate_changelog

    spark.dataSource.register(LakeStreamDataSource)
    base = spark.range(40).select("id", (F.col("id") % 5).alias("v"))
    src = LakeTable.create(spark, str(tmp_path / "src"), base.schema)
    src.append(base)
    src.delete_where(F.col("id") % 7 == 0)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), base.schema)
    ckpt = str(tmp_path / "ck")
    dst = replicate_changelog(spark, src.meta.table_root, dst, ckpt, ["id"])
    rows1 = {tuple(r) for r in dst.read().collect()}
    n_snaps1 = len(dst.meta.snapshots)
    dst = replicate_changelog(spark, src.meta.table_root, dst, ckpt, ["id"])
    assert {tuple(r) for r in dst.read().collect()} == rows1
    assert len(dst.meta.snapshots) == n_snaps1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        __import__("hypothesis").HealthCheck.function_scoped_fixture
    ],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(
                ["append", "upsert", "delete", "overwrite", "compact"]
            ),
            st.integers(min_value=0, max_value=6),  # op parameter
        ),
        min_size=1,
        max_size=5,
    )
)
def test_changelog_replication_model_random_histories(
    spark, tmp_path_factory, ops
):
    """Model-based end-to-end check of the lake + CDC stack: a random
    history of appends / upserts / deletes / partition overwrites /
    compactions is replayed through the CHANGELOG into an empty
    replica, and the replica must equal both the source table AND a
    pure-Python dict model of the ops. This is the test shape that
    would have caught the round-4 changelog defects (drops skipped as
    rewrites, insert-only emission on expired parents)."""
    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction, LakeTable
    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import replicate_changelog

    spark.dataSource.register(LakeStreamDataSource)
    root = str(tmp_path_factory.mktemp("hist"))
    base = spark.range(30).select("id", (F.col("id") % 7).alias("v"))
    src = LakeTable.create(spark, root + "/src", base.schema)
    model: dict[int, int] = {}

    next_id = 0
    for op, p in ops:
        if op == "append":
            lo, hi = next_id, next_id + 8
            next_id = hi
            rows = {i: i % 7 for i in range(lo, hi)}
            src.append(
                spark.createDataFrame(
                    list(rows.items()), "id long, v long"
                )
            )
            model.update(rows)
        elif op == "upsert":
            keys = [k for k in sorted(model) if k % 3 == p % 3][:5]
            if not keys:
                continue
            rows = {k: 100 + p for k in keys}
            src.upsert(
                spark.createDataFrame(
                    list(rows.items()), "id long, v long"
                ),
                ["id"],
            )
            model.update(rows)
        elif op == "delete":
            src.delete_where(F.col("id") % 5 == p % 5)
            model = {k: v for k, v in model.items() if k % 5 != p % 5}
        elif op == "overwrite":
            rows = {200 + p * 10 + i: p for i in range(3)}
            src.overwrite_partitions(
                spark.createDataFrame(
                    list(rows.items()), "id long, v long"
                )
            )
            model = dict(rows)  # unpartitioned → full replace
        elif op == "compact":
            Compaction(src, CompactionConfig()).compact()

    dst = LakeTable.create(spark, root + "/dst", base.schema)
    dst = replicate_changelog(
        spark, src.meta.table_root, dst, root + "/ck", ["id"]
    )
    got = {r.id: r.v for r in dst.read().collect()}
    src_state = {r.id: r.v for r in src.read().collect()}
    assert src_state == model, "source diverged from the python model"
    assert got == model, "replica diverged from the python model"

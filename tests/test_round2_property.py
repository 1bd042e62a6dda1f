"""Property tests for round-2 operators, against plain-Python models.

Each @given case runs a Spark plan on generated inputs and compares to
an independent Python re-implementation — the same strategy as
test_mor_property.py (the reference's proptest-style coverage).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=3)
DOC = st.lists(WORD, min_size=0, max_size=60).map(" ".join)

_PROP_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cdc_model(text: str, avg: int, window: int):
    toks = text.split()
    n = len(toks)
    bpos = [
        i
        for i in range(window, n + 1)
        if _h60(" ".join(toks[i - window : i])) % avg == 0
    ]
    starts = [0] + bpos
    ends = bpos + [n]
    out = []
    for s, e in zip(starts, ends):
        if e > s:
            out.append(" ".join(toks[s:e]))
    return out


@settings(**_PROP_SETTINGS)
@given(docs=st.lists(DOC, min_size=1, max_size=8), avg=st.sampled_from([2, 4, 8]))
def test_cdc_chunks_match_python_model(spark, docs, avg):
    from bergloom_spark.operators.spans import cdc_chunks

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id: long, text: string"
    )
    got = {}
    for r in cdc_chunks(df, "text", "doc_id", avg_tokens=avg, window=2).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for i, d in enumerate(docs):
        expected = _cdc_model(d, avg, 2)
        chunks = [t for _, t in sorted(got.get(i, []))]
        assert chunks == expected, (d, chunks, expected)
        # reconstruction invariant
        assert " ".join(chunks) == " ".join(d.split())


@settings(**_PROP_SETTINGS)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=100), min_size=3, max_size=40
    ),
    n=st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_is_topn_of_priority_model(spark, weights, n):
    from bergloom_spark.functions.hashing import HASH_MAX
    from bergloom_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "id: long, w: double"
    )
    got = sorted(r["id"] for r in weighted_sample(df, "w", n, "id").collect())
    keys = sorted(
        (
            ((_h60(str(i)) + 1) / float(HASH_MAX + 1)) / float(w),
            i,
        )
        for i, w in enumerate(weights)
    )
    expected = sorted(i for _, i in keys[:n])
    assert got == expected


@settings(**_PROP_SETTINGS)
@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=9),
        max_size=15,
    ),
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),  # key
            st.integers(min_value=0, max_value=9),   # value
            st.sampled_from(["I", "U", "D"]),
            st.integers(min_value=0, max_value=5),   # order
        ),
        max_size=12,
    ),
)
def test_apply_changes_matches_python_model(spark, tmp_path_factory, base, changes):
    from bergloom_spark.lake import LakeTable

    # unique (key, order) so the model needs no tie-break
    seen = set()
    uniq = []
    for k, v, op, o in changes:
        if (k, o) not in seen:
            seen.add((k, o))
            uniq.append((k, v, op, o))
    root = str(tmp_path_factory.mktemp("cdc"))
    df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "id: long, v: long",
    ).filter(F.col("id").isNotNull())
    t = LakeTable.create(spark, root + "/t", df.schema)
    t.append(df)
    if uniq:
        ch = spark.createDataFrame(
            uniq, "id: long, v: long, op: string, ord: long"
        )
        t.apply_changes(ch, ["id"], op_col="op", order_col="ord")
        # model: latest order wins per key
        winners = {}
        for k, v, op, o in uniq:
            if k not in winners or o > winners[k][1]:
                winners[k] = ((v, op), o)
        expected = dict(base)
        for k, ((v, op), _) in winners.items():
            if op == "D":
                expected.pop(k, None)
            else:
                expected[k] = v
    else:
        expected = dict(base)
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == expected
    if uniq:
        # idempotence of final state: re-applying the same changelog
        # yields the same table contents (one more snapshot, same rows)
        t.apply_changes(
            spark.createDataFrame(uniq, "id: long, v: long, op: string, ord: long"),
            ["id"], op_col="op", order_col="ord",
        )
        assert {r["id"]: r["v"] for r in t.read().collect()} == expected

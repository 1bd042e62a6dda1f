"""Property-based MoR testing: for randomized data/delete layouts, the
Spark anti-join cascade must agree with a brute-force Python model of
the reference semantics (pos-delete exact match; eq-delete key match
with strict seq gating)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bergloom_spark.operators import mor

import pyspark.sql.functions as F

ROW = st.tuples(
    st.integers(min_value=0, max_value=5),     # id (eq-delete key)
    st.integers(min_value=0, max_value=2),     # file index
    st.integers(min_value=0, max_value=4),     # pos
    st.integers(min_value=1, max_value=3),     # seq
)


def python_model(rows, pos_dels, eq_dels):
    out = []
    pos_set = set(pos_dels)
    for rid, f, p, s in rows:
        if (f, p) in pos_set:
            continue
        if any(rid == k and s < ds for k, ds in eq_dels):
            continue
        out.append((rid, f, p, s))
    return sorted(out)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(ROW, min_size=0, max_size=25, unique=True),
    pos_dels=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=4),
        ),
        max_size=8,
    ),
    eq_dels=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=1, max_value=3),
        ),
        max_size=4,
    ),
)
def test_mor_matches_python_model(spark, rows, pos_dels, eq_dels):
    data = spark.createDataFrame(
        [(rid, f"f{f}", p, s, rid, f, p) for rid, f, p, s in rows],
        f"id int, {mor.SYS_HIDDEN_FILE_PATH} string, {mor.SYS_HIDDEN_POS} long,"
        f" {mor.SYS_HIDDEN_SEQ_NUM} long, rid int, fidx int, pidx int",
    )
    pos = (
        spark.createDataFrame(
            [(f"f{f}", p) for f, p in pos_dels], "file_path string, pos long"
        )
        if pos_dels
        else None
    )
    groups = mor.group_equality_deletes(
        [
            (spark.createDataFrame([(k,)], "id int"), ["id"], s)
            for k, s in eq_dels
        ]
    )
    out = mor.merge_on_read(
        data, pos_deletes=pos, eq_delete_groups=groups,
        user_columns=["rid", "fidx", "pidx"],
    )
    expected = python_model(rows, pos_dels, eq_dels)
    got_keys = sorted((r.rid, r.fidx, r.pidx) for r in out.collect())
    assert got_keys == sorted((a, b, c) for a, b, c, _ in expected)

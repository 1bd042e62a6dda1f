"""Property tests for round-3 primitives, against plain-Python models.

Pure-Python properties (no Spark) run at full hypothesis strength;
they cover the kernels the Spark plans delegate to.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bergloom_spark.lake import skipping as sk
from bergloom_spark.operators import imagecodec as IC

DIMS = st.tuples(st.integers(1, 24), st.integers(1, 24))


@st.composite
def images(draw):
    w, h = draw(DIMS)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@given(images())
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_property(arr):
    assert np.array_equal(IC.decode_ppm(IC.encode_ppm(arr)), arr)


@given(images())
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(arr):
    assert np.array_equal(IC.decode_bmp(IC.encode_bmp(arr)), arr)


@given(images(), st.integers(1, 30), st.integers(1, 30))
@settings(max_examples=40, deadline=None)
def test_resize_then_decode_consistent(arr, w, h):
    """resize(decode(encode(x))) == resize(x), and re-encoding the
    resized image roundtrips too (the real-kernel path end to end)."""
    out = IC.resize_nearest(IC.decode_image_array(IC.encode_ppm(arr)), w, h)
    assert np.array_equal(out, IC.resize_nearest(arr, w, h))
    assert out.shape == (h, w, 3)
    assert np.array_equal(IC.decode_ppm(IC.encode_ppm(out)), out)


KEY = st.one_of(
    st.lists(st.integers(-(2**40), 2**40), max_size=80),
    st.lists(st.text(alphabet="abcxyz09", max_size=8), max_size=80),
)
PROBE = st.one_of(
    st.integers(-(2**40), 2**40), st.text(alphabet="abcxyz09", max_size=8)
)


@given(KEY, st.lists(PROBE, min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(members, probes):
    """Every inserted value must probe positive — the invariant that
    makes bloom pruning safe (a false negative would silently drop
    rows from scans). Columns are homogeneous (a real parquet column
    has one type); mixed-type columns never build a bloom (r4)."""
    bloom = sk.build_bloom(members)
    assert bloom is not None
    for v in members:
        if v is not None:
            assert sk.bloom_may_contain(bloom, v)
    # probing never raises, whatever the value — and a cross-type probe
    # is always conservatively positive
    for v in probes:
        sk.bloom_may_contain(bloom, v)


@given(st.lists(st.integers(0, 10**9), max_size=200), st.integers(2, 64))
@settings(max_examples=60, deadline=None)
def test_kmv_merge_law(keys, k):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property that
    lets per-source sketches compose without rescanning. Modeled in
    pure Python with the same md5 hash the engines use."""
    import hashlib

    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    mid = len(keys) // 2
    a, b = keys[:mid], keys[mid:]

    def sketch(vals):
        return sorted({h(v) for v in vals})[:k]

    merged = sorted(set(sketch(a)) | set(sketch(b)))[:k]
    assert merged == sketch(keys)


@given(st.lists(st.integers(0, 50), min_size=1, max_size=300))
@settings(max_examples=40, deadline=None)
def test_cm_overcount_only_model(tokens):
    """Count-Min estimates never undercount (collisions only add)."""
    import hashlib

    d, w = 3, 64

    def bucket(i, tok):
        return (
            int(hashlib.md5(f"{1000 + i}:{tok}".encode()).hexdigest()[:15], 16)
            % w
        )

    counters = [[0] * w for _ in range(d)]
    for t in tokens:
        for i in range(d):
            counters[i][bucket(i, t)] += 1
    from collections import Counter

    true = Counter(tokens)
    for tok, n in true.items():
        est = min(counters[i][bucket(i, tok)] for i in range(d))
        assert est >= n

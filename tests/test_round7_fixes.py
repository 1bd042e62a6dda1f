"""Round-7 fixes, pinned.

1. ``_driver_readable`` gates on BOTH known bounds (advice r6): a
   delete file whose record_count is small but whose byte size is
   over the cap is not read driver-side.
2. ``_DeleteFileCache`` skips a read whose known size exceeds the
   REMAINING read budget (advice r6: >0-then-debit overshoot).
3. Budget-fallback observability (verdict r6 #2): denied reads /
   attachments are counted and surfaced via ``LAST_PLAN_STATS`` +
   a log line.
4. ``decode_png`` raises ValueError (not struct.error) on an IHDR
   whose declared length != 13 (advice r6).
"""

from __future__ import annotations

import logging
import struct
import zlib

import pyspark.sql.functions as F
import pytest

import bergloom_spark.sources.lakestream as ls
from bergloom_spark.lake import LakeTable
from bergloom_spark.lake.metadata import EQ_DELETE, ManifestEntry


def _entry(rc: int, size: int, path: str = "eq-test") -> ManifestEntry:
    return ManifestEntry(
        content=EQ_DELETE,
        file_path=f"/nonexistent/{path}.parquet",
        record_count=rc,
        file_size_bytes=size,
        sequence_number=1,
        equality_ids=["id"],
    )


def test_driver_readable_requires_both_bounds():
    cap_rows = ls._PRUNE_READ_CAP_ROWS
    cap_bytes = ls._DRIVER_READ_CAP_BYTES
    assert ls._driver_readable(_entry(100, 1024))
    # small row count must NOT bypass the byte cap (advice r6)
    assert not ls._driver_readable(_entry(100, cap_bytes + 1))
    assert not ls._driver_readable(_entry(cap_rows + 1, 1024))
    # unknown size: row count alone decides (size gate vacuous)
    assert ls._driver_readable(_entry(100, 0))
    # unknown rows: size alone decides
    assert ls._driver_readable(_entry(0, 1024))
    # neither known: refuse
    assert not ls._driver_readable(_entry(0, 0))


def test_read_skipped_when_size_exceeds_remaining_budget():
    cache = ls._DeleteFileCache()
    cache._read_budget = 512
    e = _entry(10, 4096)  # readable per caps, but > remaining budget
    assert cache._read_gate(e) == "budget"
    assert cache.eq_keys(e) == (None, ({}, {}))
    assert cache.budget_denied == 1 and cache.cap_denied == 0
    # unknown size still admitted while budget > 0 (then debited)
    assert cache._read_gate(_entry(10, 0)) is None
    # over-cap file attributed to the cap, not the budget (review r7;
    # distinct path — the memo would swallow a repeat of the same file)
    big = _entry(10, ls._DRIVER_READ_CAP_BYTES + 1, path="eq-big")
    assert cache._read_gate(big) == "cap"
    cache.eq_keys(big)
    assert cache.cap_denied == 1 and cache.budget_denied == 1


def test_ship_budget_denial_counted():
    cache = ls._DeleteFileCache()
    cache._ship_budget = 8
    assert cache.charge(8)
    assert not cache.charge(1)
    assert cache.ship_denied == 1


def _history(spark, root):
    base = spark.range(60).select("id", (F.col("id") % 7).alias("v"))
    t = LakeTable.create(spark, root, base.schema)
    t.append(base.filter(F.col("id") < 40))
    t.upsert(
        spark.range(5, 15).select(
            "id", F.lit(99).cast("long").alias("v")
        ),
        ["id"],
    )
    t.delete_where(F.col("id") % 10 == 3)
    return t


def test_plan_stats_surface_budget_fallbacks(spark, tmp_path, caplog):
    """A plan forced past the budgets reports its denials in
    LAST_PLAN_STATS and logs a warning; an unconstrained plan
    reports zero denials."""
    t = _history(spark, str(tmp_path / "t"))
    baseline = t.read_changes().count()
    stats = dict(ls.LAST_PLAN_STATS)
    assert stats["partitions"] > 0
    assert stats["budget_denied"] == 0 and stats["cap_denied"] == 0
    assert stats["io_failed"] == 0 and stats["ship_denied"] == 0

    orig = ls._INLINE_BUDGET_BYTES
    try:
        # Squeeze both budgets to nothing: construct-time values come
        # from the module constant, so new planning calls start at 0.
        ls._INLINE_BUDGET_BYTES = 0
        with caplog.at_level(
            logging.WARNING, logger="bergloom_spark.lakestream"
        ):
            t2 = LakeTable.load(spark, t.meta.table_root)
            n = t2.read_changes().count()
        stats2 = dict(ls.LAST_PLAN_STATS)
        assert n == baseline  # results identical under fallback
        assert stats2["budget_denied"] > 0
        assert stats2["cap_denied"] == 0  # attributed correctly
        assert any(
            "inline budgets exhausted" in r.message
            for r in caplog.records
        )
    finally:
        ls._INLINE_BUDGET_BYTES = orig


def _png_with_bad_ihdr_len() -> bytes:
    """A PNG whose IHDR declares length 12 (CRC still valid)."""
    ihdr = struct.pack(">IIBBBB", 4, 4, 8, 2, 0, 0)  # 12 bytes, no
    # interlace byte — the truncated-IHDR shape from the advice item
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    return b"\x89PNG\r\n\x1a\n" + chunk


def test_decode_png_bad_ihdr_length_is_valueerror():
    from bergloom_spark.operators.pngcodec import decode_png

    with pytest.raises(ValueError, match="IHDR"):
        decode_png(_png_with_bad_ihdr_len())


def test_png_wavefront_matches_serial_reconstruction():
    """Verdict r6 #3: the anti-diagonal wavefront must reconstruct
    byte-identically to the serial per-row path on every filter-type
    mix, every unit width, ragged shapes included."""
    import numpy as np

    from bergloom_spark.operators import pngcodec as P

    rng = np.random.default_rng(20260815)
    for trial in range(24):
        h = int(rng.integers(1, 32))
        n = int(rng.integers(1, 32))
        bpp = int(rng.integers(1, 9))
        stride = n * bpp
        buf = bytearray(
            rng.integers(0, 256, h * (1 + stride), dtype=np.uint8)
        )
        mode = trial % 4  # mixed / all-Paeth / all-Average / cycle
        for y in range(h):
            buf[y * (1 + stride)] = (
                int(rng.integers(0, 5)),
                4,
                3,
                y % 5,
            )[mode]
        rows2d = np.frombuffer(bytes(buf), np.uint8).reshape(
            h, 1 + stride
        )
        wf = P._unfilter_wavefront(
            rows2d[:, 1:], rows2d[:, 0], h, stride, bpp
        )
        # serial reference straight off the module's slow path
        ref = np.empty((h, stride), np.uint8)
        prev = np.zeros(stride, np.int64)
        for y in range(h):
            ft = int(rows2d[y, 0])
            line = rows2d[y, 1:].astype(np.int64)
            if ft == 0:
                cur = line
            elif ft == 1:
                cur = line.copy()
                for lane in range(bpp):
                    cur[lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
            elif ft == 2:
                cur = (line + prev) & 0xFF
            else:
                cl = [0] * stride
                P._unfilter_serial(
                    ft, line.tolist(), prev.tolist(), cl, bpp, stride
                )
                cur = np.array(cl, np.int64)
            ref[y] = cur
            prev = cur
        assert (wf == ref).all(), (trial, h, n, bpp, mode)


def test_bench_anchor_excludes_current_round(monkeypatch):
    """Advice r6: a bench re-run must never normalize against its own
    round's BENCH file (ratio ≈ 1 defeats the drift instrument)."""
    import bench

    cur = bench._current_round()
    assert cur is not None and cur >= 7  # parsed from VERDICT.md
    anchor = bench._calibration_anchor()
    assert anchor is not None
    import re

    m = re.search(r"BENCH_r(\d+)\.json", anchor["file"])
    assert m and int(m.group(1)) < cur
    # and an explicit override wins
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "3")
    anchor3 = bench._calibration_anchor()
    assert anchor3 is None or (
        int(
            re.search(r"BENCH_r(\d+)\.json", anchor3["file"]).group(1)
        )
        < 3
    )

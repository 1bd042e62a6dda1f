"""Connector gating: without the Iceberg jar, every call must fail
fast with an actionable error (and detection must not crash)."""

from __future__ import annotations

import pytest

from bergloom_spark.sources import iceberg as ib


def test_iceberg_detection_is_safe(spark):
    assert ib.iceberg_available(spark) in (True, False)


def test_iceberg_calls_raise_clear_error_without_jar(spark):
    if ib.iceberg_available(spark):
        pytest.skip("iceberg runtime present in this environment")
    with pytest.raises(ib.IcebergUnavailable, match="iceberg-spark-runtime"):
        ib.read_snapshot(spark, "cat.db.t")
    with pytest.raises(ib.IcebergUnavailable):
        ib.rewrite_data_files(spark, "cat", "db.t")
    with pytest.raises(ib.IcebergUnavailable):
        ib.expire_snapshots(spark, "cat", "db.t")

"""Non-parquet source/sink coverage: ORC, CSV, JSON round-trips keep
schema and content (content fingerprint compared, order-independent)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bergloom_spark.io import load_table
from bergloom_spark.lake.validator import fingerprint


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    out = str(tmp_path / fmt)
    writer = src.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(out)

    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        # Schema-on-read for text formats: never infer in production.
        reader = reader.schema(src.schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(out)

    assert back.schema == src.schema
    assert fingerprint(back) == fingerprint(src)


def test_csv_malformed_rows_are_isolated(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,v\n1,10\nnot_a_number,20\n3,30\n")
    df = (
        spark.read.schema("id long, v long")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(str(p))
    )
    rows = [(r.id, r.v) for r in df.collect()]
    assert (1, 10) in rows and (3, 30) in rows
    assert any(r[0] is None for r in rows)  # corrupt row nulled, not fatal

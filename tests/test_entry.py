"""Entry-contract conformance: every queries() entry hash-matches its
oracle_sql() on the same parquet tables (the driver's t2 gate, run
locally at sf0.001 for speed)."""

from __future__ import annotations

import importlib.util
import os

import pytest

ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
spec = importlib.util.spec_from_file_location("spark_entry", ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

from tests.oracle_utils import compare, duck_connection  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_every_query_has_oracle_or_is_declared():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def _assert_driver_canonicalizable(name, schema):
    """The driver canonicalizes results with pandas.sort_values, which
    raises ``TypeError: unhashable type: 'list'`` on list/dict cells
    (CORRECTNESS_r02: pq_codes, embedding_quantize). No query output
    may carry a top-level ArrayType/MapType column — serialize
    (concat_ws/to_json) or explode in the final projection instead."""
    from pyspark.sql.types import ArrayType, MapType

    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not bad, (
        f"{name}: top-level array/map columns {bad} would break the "
        "driver's pandas canonicalizer — serialize them in the final "
        "projection"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    _assert_driver_canonicalizable(name, df.schema)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
        return
    report = compare(df, duck, ORACLES[name])
    assert report["match"], f"{name}: {report}"

"""JSONL profiling tests (round 10): kernel semantics + a full
Spark-vs-DuckDB profile comparison on recipe-built documents over
real testdata doc_ids."""

from __future__ import annotations

import duckdb
import pytest

from bergloom_spark.operators.jsonprofile import (
    json_key_profile,
    json_key_profile_oracle_sql,
    json_paths,
    json_type_name,
)


def test_type_names():
    assert json_type_name(None) == "null"
    assert json_type_name(True) == "bool"  # before int
    assert json_type_name(3) == "int"
    assert json_type_name(3.5) == "float"
    assert json_type_name("s") == "string"
    assert json_type_name([1]) == "array"
    assert json_type_name({}) == "object"


def test_paths_depth_semantics():
    doc = '{"a": 1, "b": {"c": "x", "d": {"e": []}}, "f": [1, 2]}'
    assert sorted(json_paths(doc, max_depth=1)) == [
        ("a", "int"), ("b", "object"), ("f", "array"),
    ]
    assert sorted(json_paths(doc, max_depth=2)) == [
        ("a", "int"), ("b", "object"), ("b.c", "string"),
        ("b.d", "object"), ("f", "array"),
    ]
    assert ("b.d.e", "array") in json_paths(doc, max_depth=3)


def test_invalid_json_rejected():
    with pytest.raises(ValueError, match="invalid JSON"):
        json_paths("{broken")
    with pytest.raises(ValueError, match="not an object"):
        json_paths("[1, 2]")


def _doc(i: int) -> str:
    import json as j

    d = {"text": f"doc {i}", "id": i}
    if i % 2:
        d["score"] = i / 7.0
    if i % 3 == 0:
        d["meta"] = {"source": f"s{i % 4}"}
    if i % 5 == 0:
        d["id"] = str(i)  # the schema DRIFT the profile must show
    if i % 7 == 0:
        d["tags"] = ["a", "b"]
    return j.dumps(d, sort_keys=True)


def test_profile_matches_duckdb_oracle(spark, sf_dir):
    ids = [
        int(r.doc_id)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(300).collect()
    ]
    rows = [(i, _doc(i)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, payload string")
    got = {
        (r.path, r.type): r.n_docs
        for r in json_key_profile(df.repartition(8)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in rows) + ") t(doc_id, payload)",
        [x for row in rows for x in row],
    )
    exp = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            json_key_profile_oracle_sql("docs", "payload")
        ).fetchall()
    }
    con.close()
    assert got == exp
    # drift is visible: "id" appears under BOTH types
    assert ("id", "int") in got and ("id", "string") in got
    assert got[("text", "string")] == len(ids)


def test_profile_plan_shape(spark):
    rows = [(i, _doc(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, payload string")
    prof = json_key_profile(df)
    prof.collect()
    plan = prof._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # one partial-agg shuffle on path strings; no payload exchange
    assert final.count("Exchange") <= 1
    assert "partial_count" in final or "HashAggregate" in final

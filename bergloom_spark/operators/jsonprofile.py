"""JSONL corpus profiling — JSONL is the interchange format LLM
training data actually ships in (one JSON object per line: text +
metadata + scores), and the first question against an unfamiliar
drop is always structural: which keys exist, at what rate, with
what types, and where does the schema drift?

``json_key_profile`` explodes each document's key tree into
``(path, type)`` observations inside an Arrow-batched map-only
kernel (documents never shuffle; only short path strings do), then
aggregates to per-path counts — the schema-drift report. Canonical
type names are OURS (``object/array/string/int/float/bool/null``)
so the result is engine-neutral; the DuckDB oracle replays depth-1
paths exactly via ``unnest(json_keys(...))`` + ``json_type`` with a
type-name mapping (this build of DuckDB has no ``json_tree``, so
registered rows pin ``max_depth=1`` — the kernel itself walks to
``max_depth`` with a cap).

Corpus contract: a payload line that is not valid JSON raises
ValueError with its line number (a silent skip would make the
profile lie about coverage); callers wanting lenience filter first.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["json_type_name", "json_paths", "json_key_profile"]

_MAX_PATHS_PER_DOC = 10_000


def json_type_name(v) -> str:
    """Canonical type name for a parsed JSON value. bool tests
    before int (bool is an int subclass in Python)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise ValueError(f"unmappable JSON value type {type(v)!r}")


def json_paths(doc: str, max_depth: int = 1) -> list[tuple[str, str]]:
    """One JSON document → ``(path, type)`` observations for every
    key reachable within ``max_depth`` (depth 1 = top-level keys).
    Array elements are not descended into (their types show as
    ``array`` at the holding key — element profiling is a different
    report). Paths are dotted (``meta.source``)."""
    try:
        obj = json.loads(doc)
    except (json.JSONDecodeError, TypeError) as exc:
        raise ValueError(f"invalid JSON document: {exc}") from exc
    if not isinstance(obj, dict):
        raise ValueError(
            f"top-level JSON value is {json_type_name(obj)}, "
            "not an object"
        )
    out: list[tuple[str, str]] = []

    def walk(d: dict, prefix: str, depth: int) -> None:
        for k, v in d.items():
            if len(out) >= _MAX_PATHS_PER_DOC:
                raise ValueError(
                    "document exceeds the per-doc path cap"
                )
            path = prefix + k
            out.append((path, json_type_name(v)))
            if isinstance(v, dict) and depth < max_depth:
                walk(v, path + ".", depth + 1)

    walk(obj, "", 1)
    return out


def json_key_profile(
    df: DataFrame,
    json_col: str = "payload",
    max_depth: int = 1,
) -> DataFrame:
    """JSONL schema-drift report: ``(path, type, n_docs)`` — how many
    documents carry each key path with each type. One map-only
    explosion (paths deduped per doc so a repeated structure counts
    once) + one partial-agg shuffle on short path strings."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc in pdf[json_col]:
                seen = set(json_paths(doc, max_depth=max_depth))
                rows.extend(seen)
            yield pd.DataFrame(rows, columns=["path", "type"])

    pairs = df.select(json_col).mapInPandas(
        kernel, "path string, type string"
    )
    return pairs.groupBy("path", "type").agg(
        F.count("*").alias("n_docs")
    )


def json_key_profile_oracle_sql(
    table: str, json_expr: str
) -> str:
    """DuckDB replay for ``max_depth=1`` profiles: top-level keys
    via ``unnest(json_keys(...))``, DuckDB's type names mapped onto
    the canonical set. (No ``json_tree`` in this build — depth-1 is
    the registerable contract.)"""
    # json_type on a COLUMN document returns SQL NULL for a JSON
    # null value (the literal-argument path returns the string
    # 'NULL' — r11 driver registration caught the divergence); keys
    # here come from json_keys, so the key always exists and NULL
    # unambiguously means the JSON null type.
    type_map = (
        "CASE coalesce(json_type(j, '$.' || key), 'NULL') "
        "WHEN 'OBJECT' THEN 'object' "
        "WHEN 'ARRAY' THEN 'array' "
        "WHEN 'VARCHAR' THEN 'string' "
        "WHEN 'BOOLEAN' THEN 'bool' "
        "WHEN 'UBIGINT' THEN 'int' "
        "WHEN 'BIGINT' THEN 'int' "
        "WHEN 'DOUBLE' THEN 'float' "
        "WHEN 'NULL' THEN 'null' "
        "ELSE 'unknown' END"
    )
    return (
        f"SELECT key AS path, {type_map} AS type, "
        f"count(*)::BIGINT AS n_docs "
        f"FROM (SELECT {json_expr} AS j, "
        f"unnest(json_keys({json_expr})) AS key FROM {table}) "
        f"GROUP BY path, type"
    )

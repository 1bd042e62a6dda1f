"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01, runs the matching
``oracle_sql()`` in DuckDB over the same parquet, and compares row
count, column names, and sorted values (floats rounded) — the same
shape of comparison the driver's CORRECTNESS_r{N}.json records.

Usage: python tools/driver_sim.py [query ...]
       python tools/driver_sim.py --json SWEEP_rN.json   # full sweep
                                  # + per-query JSON record (the
                                  # round-closing gate, verdict r6 #2)
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bergloom_spark.io import TABLES  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _sort_key(row):
    # NULL-safe total order (rollup/cube rows carry NULL group keys).
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()
    oracles = mod.oracle_sql()
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: driver_sim.py [query ...] [--json PATH]")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)
    records: dict = {}

    spark = get_spark(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        start = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            cols = sorted(sdf.columns)
            srows = sorted(
                (tuple(_norm(r[c]) for c in cols) for r in sdf.collect()),
                key=_sort_key,
            )
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            records[name] = {"status": "spark_error", "err": str(exc)}
            print(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            continue
        took = time.monotonic() - start
        if name not in oracles:
            records[name] = {
                "status": "rows_only", "rows": len(srows),
                "secs": round(took, 1),
            }
            print(f"ok   {name}: {len(srows)} rows (no oracle) [{took:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = sorted(d[0] for d in res.description)
            fetched = res.fetchall()
            idx = [
                [d[0] for d in res.description].index(c) for c in ocols
            ]
            orows = sorted(
                (tuple(_norm(row[i]) for i in idx) for row in fetched),
                key=_sort_key,
            )
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            records[name] = {"status": "oracle_error", "err": str(exc)}
            print(f"FAIL {name}: oracle error {type(exc).__name__}: {exc}")
            continue
        if cols != ocols:
            failures.append(name)
            records[name] = {"status": "schema_mismatch"}
            print(f"FAIL {name}: schema {cols} vs {ocols}")
        elif len(srows) != len(orows):
            failures.append(name)
            records[name] = {
                "status": "row_mismatch",
                "rows": [len(srows), len(orows)],
            }
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
        elif srows != orows:
            failures.append(name)
            records[name] = {"status": "value_mismatch"}
            diff = next(
                (i for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
                None,
            )
            print(
                f"FAIL {name}: values differ at sorted row {diff}:\n"
                f"  spark:  {srows[diff] if diff is not None else '?'}\n"
                f"  oracle: {orows[diff] if diff is not None else '?'}"
            )
        else:
            records[name] = {
                "status": "hash_equal", "rows": len(srows),
                "secs": round(took, 1),
            }
            print(f"ok   {name}: {len(srows)} rows hash-equal [{took:.1f}s]")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_path:
        import json as _json

        summary = {
            "sf_dir": SF_DIR,
            "n_queries": len(records),
            "n_hash_equal": sum(
                1 for r in records.values() if r["status"] == "hash_equal"
            ),
            "n_rows_only": sum(
                1 for r in records.values() if r["status"] == "rows_only"
            ),
            "n_failures": len(failures),
            "failures": failures,
            "queries": records,
        }
        with open(json_path, "w") as fh:
            _json.dump(summary, fh, indent=1)
        print(f"wrote {json_path}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

"""Plan-quality report: physical-plan properties of the headline
queries — the numbers behind the SCALING.md claims, printed so a
regression (a new shuffle, a lost broadcast, a nested loop) is visible
at a glance.

Usage: python tools/plan_report.py [query ...]   (default: bench HEADLINE)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from bergloom_spark.plans import explain as X  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    spark = get_spark(app_name="plan-report", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(entry_mod.queries())
    # timed headline but no longer in the driver registry (no SQL
    # oracle exists for the N-merge learn loop) — resolve directly
    queries.setdefault("bpe_token_stats", entry_mod.q_bpe_token_stats)
    print(f"{'query':32s} {'shuffles':>8s} {'bcast':>6s} {'smj':>4s} "
          f"{'anti':>4s} {'nloop':>5s} {'codegen':>7s}")
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            nloop = plan.count("BroadcastNestedLoopJoin")
            print(
                f"{name:32s} {X.count_shuffles(df):8d} "
                f"{X.count_broadcast_joins(df):6d} "
                f"{X.count_sortmerge_joins(df):4d} "
                f"{X.anti_join_count(df):4d} {nloop:5d} "
                f"{str(X.has_whole_stage_codegen(df)):>7s}"
            )
        except Exception as exc:  # noqa: BLE001 - report, keep going
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()

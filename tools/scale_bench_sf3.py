"""Second decade step (r15, verdict r14 next-round #6): the four
restructured dedup-family shapes plus the boilerplate skew fixture,
timed at sf1 (/tmp/sfx1, 10x) AND sf3 (/tmp/sfx3, 30x — build with
SPARK_GRAFT_SF_COPIES=30 python tools/make_sf1.py /tmp/sfx3).

Writes BENCH_sf3.json with per-query times at sf0.1 / sf1 / the big
step, exponents normalized by the MEASURED document-count ratio of
each pair (read from the parquet footers — the copy count is capped
at 26 because make_sf1's per-copy Caesar cipher has only 26 distinct
rotations; past that, copies repeat earlier copies' text verbatim and
the dup-sensitive queries measure that artifact, which is exactly
what the 30-copy first attempt showed), plus the CPU probes sampled
before and after the run so the window can be judged against the
quiet anchor.

Usage: python tools/scale_bench_sf3.py [sf1_dir [sf3_dir]]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util  # noqa: E402

from bergloom_spark.session import get_spark  # noqa: E402

QUERIES = [
    "ngram_jaccard_pairs",
    "ngram_jaccard_boilerplate",
    "dedup_remove_spans",
    "minhash_lsh_pairs",
    "dedup_verified_pairs",
]

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx1"
    sf3 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx3"
    import bench

    probes_before = (bench._cpu_calibration(), bench._cpu_calibration_parallel())
    from bergloom_spark.io import table_rows

    n01 = table_rows(SF01, "documents")
    n1 = table_rows(sf1, "documents")
    n3 = table_rows(sf3, "documents")

    spec = importlib.util.spec_from_file_location(
        "entry",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = dict(mod.queries())
    queries["ngram_jaccard_boilerplate"] = mod.q_ngram_jaccard_boilerplate

    spark = get_spark(app_name="scale-bench-sf3")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name, sf_dir, passes=2):
        best = float("inf")
        for _ in range(passes):
            t0 = time.monotonic()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    for name in QUERIES:  # warmup / JIT at the small SF
        run(name, SF01, passes=2)

    out = {"sf0.1": {}, "sf1": {}, "sf3": {}, "exp_sf1_sf3": {}, "exp_full_span": {}}
    for name in QUERIES:
        t01 = run(name, SF01)
        t1 = run(name, sf1)
        t3 = run(name, sf3)
        out["sf0.1"][name] = t01
        out["sf1"][name] = t1
        out["sf3"][name] = t3
        # exponents normalized by the measured data-growth factor
        out["exp_sf1_sf3"][name] = round(
            math.log(t3 / t1) / math.log(n3 / n1), 3
        )
        out["exp_full_span"][name] = round(
            math.log(t3 / t01) / math.log(n3 / n01), 3
        )
        print(
            f"{name}: sf0.1={t01}s sf1={t1}s sf3={t3}s "
            f"exp(sf1->sf3)={out['exp_sf1_sf3'][name]} "
            f"exp(full)={out['exp_full_span'][name]}"
        )
    spark.stop()
    probes_after = (bench._cpu_calibration(), bench._cpu_calibration_parallel())
    here = os.path.join(os.path.dirname(__file__), "..", "BENCH_sf3.json")
    with open(here, "w") as fh:
        json.dump(
            {
                "metric": "dedup_family_second_decade_scaling",
                "unit": "sec",
                "sf1_dir": sf1,
                "sf3_dir": sf3,
                "doc_counts": {"sf0.1": n01, "sf1": n1, "sf_big": n3},
                "cpu_probes_before": probes_before,
                "cpu_probes_after": probes_after,
                **out,
            },
            fh,
            indent=1,
        )
    print("wrote BENCH_sf3.json; probes", probes_before, probes_after)


if __name__ == "__main__":
    main()

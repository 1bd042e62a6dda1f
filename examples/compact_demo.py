"""End-to-end compaction demo — the PySpark analog of the reference's
example binary (`/root/reference/examples/memory-catalog/src/main.rs`):
set up a throwaway warehouse, create a table, write data + deletes,
run a full compaction, print the rewrite statistics.

Run:  python examples/compact_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bergloom_spark.config import CompactionConfig  # noqa: E402
from bergloom_spark.lake import Compaction, LakeTable  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402


def main() -> None:
    # 1. Throwaway warehouse (the reference uses TempDir the same way).
    warehouse = tempfile.mkdtemp(prefix="bergloom-demo-")

    # 2. Spark session plays the roles of file I/O + execution engine;
    #    the JSON metadata layer under the table root is the catalog.
    spark = get_spark(app_name="bergloom-compact-demo", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    # 3. Create the table (same shape as the reference example:
    #    id / customer_name / amount).
    sales = spark.range(0, 100_000).select(
        F.col("id"),
        F.concat(F.lit("customer_"), F.col("id") % 997).alias("customer_name"),
        (F.rand(seed=7) * 1000).alias("amount"),
    )
    table_root = os.path.join(warehouse, "warehouse", "sales_data")
    t = LakeTable.create(spark, table_root, sales.schema)

    # 4. Accumulate merge-on-read debt: two appends, one row-level
    #    delete (becomes a positional delete file) and one equality
    #    delete on the key column.
    t.append(sales.filter(F.col("id") % 2 == 0))
    t.append(sales.filter(F.col("id") % 2 == 1))
    t.delete_where(F.col("amount") < 5)
    t.append_equality_deletes(
        spark.range(0, 1000).select(F.col("id")), ["id"]
    )
    snap = t.meta.current_snapshot()
    print(f"Table at {table_root}")
    print(
        "  - before compaction: "
        f"{len(snap.files('data'))} data files, "
        f"{len(snap.files('pos_delete'))} pos-delete files, "
        f"{len(snap.files('eq_delete'))} eq-delete files"
    )

    # 5. Perform the compaction (validation on, like the example's
    #    enable_validate path).
    result = Compaction(
        t, CompactionConfig(enable_validate_compaction=True)
    ).compact()

    # 6. Display compaction results (mirrors the example's output).
    print("Compaction completed successfully!")
    print(f"  - Rewritten files: {result.stat.rewritten_files_count}")
    print(f"  - Added files: {result.stat.added_files_count}")
    print(f"  - Rewritten bytes: {result.stat.rewritten_bytes}")
    print(f"  - Validated: {result.validated}")
    print(f"  - Rows after rewrite: {t.read().count()}")
    spark.stop()


if __name__ == "__main__":
    main()

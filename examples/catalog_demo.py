"""Catalog-routed Iceberg compaction lifecycle demo (round 13).

The reference's whole operating loop is: resolve a table IDENT
through a catalog, compact it, commit the new tree back THROUGH the
catalog (``core/src/compaction/mod.rs:226`` load → ``:569`` commit;
the memory-catalog example in the reference repo does exactly this).
This demo runs that loop against all three in-sandbox catalogs:

  1. build an Iceberg table with live merge-on-read debt (two
     appends, an equality delete, positional deletes) and export it
     as a real v2 metadata tree;
  2. register the tree under ``analytics.sales`` in a catalog;
  3. ``compact_catalog_table``: load-by-ident → rewrite every data
     file with all deletes applied → CAS the catalog pointer;
  4. re-load through the catalog and verify row parity + zero
     remaining delete files.

Catalogs exercised: FilesystemCatalog (HadoopCatalog-style version
files + hint), SqlCatalog (JdbcCatalog ``iceberg_tables`` schema over
sqlite), MemoryCatalog — same five-method contract, three storage
substrates, one compaction code path.

Run:  python examples/catalog_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bergloom_spark.lake import LakeTable  # noqa: E402
from bergloom_spark.lake import metadata as md  # noqa: E402
from bergloom_spark.lake.catalog import (  # noqa: E402
    catalog_for,
    compact_catalog_table,
)
from bergloom_spark.lake.iceberg_export import (  # noqa: E402
    export_iceberg_metadata,
)
from bergloom_spark.operators import mor  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402


def build_mor_table(spark, root: str, sf_dir: str) -> LakeTable:
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    )
    t = LakeTable.create(spark, root, li.schema)
    t.append(li.filter(F.col("l_orderkey") % 2 == 0))
    t.append_equality_deletes(
        li.filter(F.col("l_suppkey") % 10 == 0)
        .select("l_suppkey").distinct(),
        ["l_suppkey"],
    )
    t.append(li.filter(F.col("l_orderkey") % 2 == 1))
    hidden = t.scan_data(with_hidden=True)
    t.append_position_deletes(
        hidden.filter(F.col("l_orderkey") % 13 == 0).select(
            F.col(mor.SYS_HIDDEN_FILE_PATH).alias("file_path"),
            F.col(mor.SYS_HIDDEN_POS).alias("pos"),
        )
    )
    return t.refresh()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="catalog-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bergloom-catalog-demo-")

    for label, uri in [
        ("filesystem", os.path.join(work, "warehouse")),
        ("sql", f"sqlite:///{work}/catalog.db"),
        ("memory", "memory:"),
    ]:
        cat = catalog_for(uri)
        root = os.path.join(work, f"src-{label}")
        t = build_mor_table(spark, root, sf_dir)
        before = t.read().count()
        n_deletes = len(
            t.meta.current_snapshot().files(md.POS_DELETE)
        ) + len(t.meta.current_snapshot().files(md.EQ_DELETE))
        cat.register_table(
            "analytics.sales", export_iceberg_metadata(t.meta)
        )
        result, committed = compact_catalog_table(
            spark, cat, "analytics.sales",
            os.path.join(work, f"compact-{label}"),
        )
        t2 = cat.load_table(spark, "analytics.sales")
        snap = t2.meta.current_snapshot()
        after = t2.read().count()
        leftover = len(snap.files(md.POS_DELETE)) + len(
            snap.files(md.EQ_DELETE)
        )
        status = "OK" if after == before and leftover == 0 else "MISMATCH"
        print(
            f"[{label:10s}] {status}: rows {before} -> {after}, "
            f"delete files {n_deletes} -> {leftover}, "
            f"rewrote {result.stat.rewritten_files_count} files, "
            f"committed {os.path.basename(committed)}"
        )
        if status != "OK":
            sys.exit(1)


if __name__ == "__main__":
    main()

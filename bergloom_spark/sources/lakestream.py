"""LakeTable as a Structured Streaming SOURCE (Spark 4 Python Data
Source API): incremental consumption of append commits.

The reference's roadmap "incremental" story is a consumer that keeps
up with a table as it grows (`/root/reference/README.md:46-56`). This
source turns the lake's snapshot chain into a stream: each micro-batch
reads exactly the data files ADDED by append snapshots since the last
checkpointed offset — the Iceberg/Delta "streaming table read"
pattern. Offsets are snapshot ids, so exactly-once follows from the
snapshot chain's immutability (a committed snapshot's entry list never
changes) plus Spark's offset log.

Scale shape: `partitions()` is a driver-side manifest diff (no data
I/O); each new data file becomes one `InputPartition`, read in
parallel on executors as Arrow batches straight from parquet.
Back-pressure = `maxFilesPerBatch` option. Non-append snapshots
(deletes, rewrites) are REFUSED by default — an append-only consumer
silently missing row removals is a correctness bug; pass
`skipNonAppends=true` to consume appends only (compactions rewrite
existing rows, so skipping their snapshots keeps the feed
exactly-the-appended-rows).

Usage::

    spark.dataSource.register(LakeStreamDataSource)
    stream = (spark.readStream.format("lakestream")
              .option("path", table_root).load())
"""

from __future__ import annotations

import dataclasses
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

__all__ = ["LakeStreamDataSource"]


@dataclasses.dataclass
class _FilePartition(InputPartition):
    file_path: str
    columns: tuple
    schema_json: str


class LakeStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lakestream"

    def schema(self):
        from bergloom_spark.lake import metadata as md

        meta = md.read_current(self.options["path"])
        return T.StructType.fromJson(
            meta.schema if isinstance(meta.schema, dict) else json.loads(meta.schema)
        )

    def streamReader(self, schema):
        return _LakeStreamReader(self.options, schema)


class _LakeStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.table_root = options["path"]
        self.skip_non_appends = (
            str(options.get("skipnonappends", "false")).lower() == "true"
        )
        self.max_files = int(options.get("maxfilesperbatch", 0))
        self.columns = tuple(f.name for f in schema.fields)
        self.schema_json = schema.json()
        from bergloom_spark.lake import metadata as md

        meta = md.read_current(self.table_root)
        if meta.partition_spec:
            raise ValueError(
                "lakestream does not support partitioned tables yet "
                "(virtualized partition columns live in the manifest)"
            )

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"last_snapshot_id": 0}

    def latestOffset(self) -> dict:
        from bergloom_spark.lake import metadata as md

        meta = md.read_current(self.table_root)
        latest = 0
        n_files = 0
        for s in meta.snapshots:
            # Advance over EVERY snapshot (not only appends): a
            # non-append inside the range must reach partitions(),
            # where it is refused or skipped per skipNonAppends —
            # silently stopping in front of it would stall the stream.
            if self.max_files and s.operation == "append":
                # Count only the files THIS snapshot added (matching
                # partitions()): entries also carry forward every live
                # file from the parent, and counting those would blow
                # through the cap immediately, degrading every batch to
                # a single snapshot regardless of the option value.
                n_files += sum(
                    1
                    for e in s.entries
                    if e.content == md.DATA
                    and e.sequence_number == s.sequence_number
                )
                if latest and n_files > self.max_files:
                    break
            latest = s.snapshot_id
        return {"last_snapshot_id": latest}

    def partitions(self, start: dict, end: dict):
        from bergloom_spark.lake import metadata as md

        lo, hi = start["last_snapshot_id"], end["last_snapshot_id"]
        meta = md.read_current(self.table_root)
        # Expired-history guard (Iceberg streaming fails the same way):
        # snapshot ids are consecutive, so any retained-minimum greater
        # than lo+1 means snapshots in (lo, min_retained) were expired
        # and their appended files would silently vanish from the feed.
        if meta.snapshots:
            min_retained = min(s.snapshot_id for s in meta.snapshots)
            if min_retained > lo + 1 and min_retained <= hi:
                raise ValueError(
                    f"offset {lo} predates the oldest retained snapshot "
                    f"{min_retained}: snapshots in between were expired "
                    "and their appends are no longer streamable. Restart "
                    "the stream from a fresh checkpoint (full snapshot) "
                    "or expire less aggressively."
                )
        parts: list[_FilePartition] = []
        for s in meta.snapshots:
            if not (lo < s.snapshot_id <= hi):
                continue
            if s.operation != "append":
                if self.skip_non_appends:
                    continue
                raise ValueError(
                    f"snapshot {s.snapshot_id} is {s.operation!r}, not an "
                    "append: a row-level change cannot be streamed as an "
                    "append feed (set skipNonAppends=true to consume "
                    "appended rows only)"
                )
            for e in s.entries:
                # entries carried forward from parents have an older
                # sequence number; only THIS snapshot's new files count
                if e.content == md.DATA and e.sequence_number == s.sequence_number:
                    parts.append(
                        _FilePartition(
                            e.file_path, self.columns, self.schema_json
                        )
                    )
        return parts or [_FilePartition("", self.columns, self.schema_json)]

    def read(self, partition: _FilePartition):
        if not partition.file_path:
            return iter(())
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        table = pq.read_table(
            partition.file_path, columns=list(partition.columns)
        )
        # Normalize to the DECLARED schema's Arrow form: parquet may
        # surface e.g. nanosecond timestamps, which the Python source
        # bridge refuses — cast (ns→µs etc.) before handing batches up.
        target = to_arrow_schema(
            T.StructType.fromJson(json.loads(partition.schema_json))
        )
        return iter(table.cast(target).to_batches())

    def commit(self, end: dict) -> None:
        pass

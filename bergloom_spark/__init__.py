"""bergloom_spark — a PySpark-native rebuild of nimtable/BergLoom.

BergLoom (reference @ /root/reference) is a merge-on-read compaction
runtime for Apache Iceberg tables: it plans a snapshot into data /
positional-delete / equality-delete file groups, subtracts deleted rows
with an anti-join cascade, and rewrites the survivors into large,
size-rolled, partition-fanned-out Parquet files committed atomically.

This package re-expresses those semantics Spark-first:

- ``operators.mor``    — the anti-join cascade (reference
  ``core/src/executor/datafusion/datafusion_processor.rs:280-398``)
  as declarative DataFrame ops Catalyst can optimize.
- ``lake``             — a lightweight Iceberg-like table format
  (JSON metadata, snapshots, sequence numbers, delete files) so the
  full compaction lifecycle (plan → rewrite → commit → validate) runs
  end-to-end on plain Parquet without an external catalog service.
- ``operators`` / ``functions`` — the large-scale training-data
  pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) built on the same substrate.
- ``streaming``        — Structured Streaming mirrors for unbounded
  inputs.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

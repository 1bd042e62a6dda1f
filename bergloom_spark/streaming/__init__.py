"""Structured Streaming operators (beyond-reference extension).

The reference is bounded-only (``Boundedness::Bounded``,
``iceberg_file_task_scan.rs:177-182``); this package is the unbounded
mirror of the engine's batch operators for continuously-arriving data.
"""

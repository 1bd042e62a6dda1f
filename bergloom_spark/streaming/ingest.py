"""Streaming ingest into a LakeTable — exactly-once per micro-batch.

``foreachBatch`` delivers micro-batches at-least-once with DETERMINISTIC
batch ids (Spark replays a batch with the same id after a failure).
Exactly-once therefore reduces to idempotence: record the last committed
batch id in table properties ATOMICALLY with the data commit (one
metadata-version CAS, ``LakeTable.append(properties_update=...)``) and
skip any batch id at or below it. If the process dies between the table
commit and the checkpoint advance, the replayed batch hits the guard
and is dropped — no duplicates, no data loss.

This is the lake-sink half of the reference's ecosystem (the reference
compacts tables that such an ingest produces); at scale it is the
standard "streaming front door": watermark/dedup upstream
(``streaming/events.py``), small frequent appends here, compaction
(``lake/compaction.py``) folding the small files behind.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame

from bergloom_spark.lake.table import LakeTable

LAST_BATCH_PROP = "streaming.last_batch_id"


def guard_key(query_id: str | None) -> str:
    """Table-property key of the exactly-once batch-id guard.

    Namespaced per query (the Delta ``txnAppId``+``txnVersion``
    pattern): batch ids are only monotonic WITHIN one streaming query's
    checkpoint lineage, so two streams into the same table — or one
    stream restarted with a fresh checkpoint dir, where batch ids reset
    to 0 — must not share a guard, or live batches get dropped as
    'replays'. ``None`` keeps the legacy un-namespaced key for
    single-writer tables."""
    return LAST_BATCH_PROP if query_id is None else f"{LAST_BATCH_PROP}.{query_id}"


def checkpoint_query_id(checkpoint_dir: str) -> str:
    """Query id derived from the checkpoint location — the id travels
    with the batch-id lineage it protects: a NEW checkpoint dir (reset
    batch ids) automatically gets a new guard."""
    return hashlib.sha1(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]


def guard_key_for_checkpoint(checkpoint_dir: str) -> str:
    return guard_key(checkpoint_query_id(checkpoint_dir))


def _is_replay(props: dict, prop: str, batch_id: int) -> bool:
    """True iff ``batch_id`` was already committed and must be skipped.

    Namespaced key present → the usual at-or-below check. Absent, the
    LEGACY un-namespaced key covers tables written before guards were
    checkpoint-namespaced: a crash-replay under the old regime
    re-presents EXACTLY the last committed batch id, so only
    ``batch_id == legacy`` is treated as a replay. A smaller id means
    a genuinely NEW checkpoint lineage (batch ids restart at 0) whose
    live batches must commit — an at-or-below fallback would silently
    drop all of them, and since nothing would ever commit, the
    namespaced key could never be written to self-heal. (Residual
    collision: a new lineage's very first batch on a legacy table
    whose last recorded id is exactly 0 — one skipped batch, against
    guaranteed duplicates the other way.) After the first commit the
    namespaced key exists and the legacy key is never consulted."""
    namespaced = props.get(prop)
    if namespaced is not None:
        return batch_id <= int(namespaced)
    legacy = props.get(LAST_BATCH_PROP)
    return legacy is not None and batch_id == int(legacy)


def _append_sink(
    table: LakeTable,
    target_file_size: int,
    prop: str,
    maintenance=None,
    maintain_every: int = 0,
):
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t = table.refresh()
        if _is_replay(t.meta.properties, prop, batch_id):
            return  # replayed batch — already committed
        t.append(
            batch_df,
            target_file_size=target_file_size,
            properties_update={prop: str(batch_id)},
        )
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            # Inline compaction-daemon tick: streaming appends are THE
            # small-file factory; folding debt every N batches keeps
            # reader cost flat without a separate scheduler. The
            # maintenance commit is separate from the data commit, so
            # a crash between them only delays folding (the guard
            # already recorded the batch).
            from bergloom_spark.lake.maintenance import run_maintenance

            run_maintenance(t, maintenance)

    return sink


def make_batch_sink(
    table: LakeTable,
    target_file_size: int = 128 * 1024 * 1024,
    query_id: str | None = None,
):
    """The idempotent ``foreachBatch`` function (exposed for tests /
    custom triggers). Pass ``query_id`` whenever more than one stream
    may ever write this table (see :func:`guard_key`)."""
    return _append_sink(table, target_file_size, guard_key(query_id))


def ingest_stream(
    stream_df: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    target_file_size: int = 128 * 1024 * 1024,
    maintenance=None,
    maintain_every: int = 0,
) -> LakeTable:
    """Drain ``stream_df`` into ``table`` (availableNow) and return the
    refreshed table. Each micro-batch becomes one snapshot; restarts
    resume from the checkpoint and replays are dropped by the batch-id
    guard (keyed per checkpoint lineage — see
    :func:`guard_key_for_checkpoint`). With ``maintain_every`` = N,
    every Nth batch additionally runs the threshold-driven maintenance
    loop (``lake/maintenance.py``) so streaming small-file debt folds
    inline."""
    sink = _append_sink(
        table,
        target_file_size,
        guard_key_for_checkpoint(checkpoint_dir),
        maintenance=maintenance,
        maintain_every=maintain_every,
    )
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table.refresh()


def _cdc_sink(
    table: LakeTable,
    key_cols: list[str],
    op_col: str,
    order_col: str | None,
    target_file_size: int,
    prop: str,
):
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t = table.refresh()
        if _is_replay(t.meta.properties, prop, batch_id):
            return  # replayed batch — already applied
        t.apply_changes(
            batch_df,
            key_cols,
            op_col=op_col,
            order_col=order_col,
            target_file_size=target_file_size,
            properties_update={prop: str(batch_id)},
        )

    return sink


def make_cdc_sink(
    table: LakeTable,
    key_cols: list[str],
    op_col: str = "op",
    order_col: str | None = None,
    target_file_size: int = 128 * 1024 * 1024,
    query_id: str | None = None,
):
    """Idempotent ``foreachBatch`` CDC sink: each micro-batch is a
    changelog applied via :meth:`LakeTable.apply_changes` — one atomic
    equality-delta commit per batch, the batch-id guard merged into the
    SAME metadata CAS, so replays after a crash are dropped and a
    reader always sees whole batches (streaming MERGE, the Debezium →
    lakehouse pattern). Pass ``query_id`` whenever another stream (or
    the append sink) may also write this table — guards are per-query
    (see :func:`guard_key`)."""
    return _cdc_sink(
        table, key_cols, op_col, order_col, target_file_size,
        guard_key(query_id),
    )


def replicate_changelog(
    spark,
    source_root: str,
    target: LakeTable,
    checkpoint_dir: str,
    key_cols: list[str],
) -> LakeTable:
    """Replicate a LakeTable into another via its CHANGELOG stream —
    the cross-region / derived-table pattern: the source's row-level
    +/- feed (``sources/lakestream.py`` changelog mode) is applied to
    the target with :meth:`LakeTable.apply_changes`, exactly-once per
    micro-batch (same batch-id guard as every sink here).

    Ordering: ``_commit_snapshot_id`` orders changes per key; within
    one source snapshot an insert outranks the delete of the row it
    replaced (MoR equality deletes only shadow strictly-older rows, so
    a same-snapshot upsert must land as the insert). Resumable from
    the checkpoint; compactions on the source emit nothing and cost
    the replica nothing.

    Implementation: :func:`replicate_derived` with the identity
    derivation — one sink, one set of ordering/guard semantics
    (review r5: the two copies had already diverged once).
    """
    return replicate_derived(
        spark, source_root, target, checkpoint_dir, key_cols,
        lambda batch_df: batch_df,
    )


def apply_changes_stream(
    stream_df: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    key_cols: list[str],
    op_col: str = "op",
    order_col: str | None = None,
) -> LakeTable:
    """Drain a CDC changelog stream into ``table`` (availableNow):
    every micro-batch becomes one merge snapshot; restarts resume from
    the checkpoint and replays hit the batch-id guard (keyed per
    checkpoint lineage)."""
    sink = _cdc_sink(
        table, key_cols, op_col, order_col, 128 * 1024 * 1024,
        guard_key_for_checkpoint(checkpoint_dir),
    )
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table.refresh()


def maintain_rollup(
    spark,
    source_root: str,
    target: LakeTable,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
) -> LakeTable:
    """Continuous aggregate (round 5): a per-group (count, sum) rollup
    maintained INCREMENTALLY from the source table's changelog stream
    — the TimescaleDB continuous-aggregate / materialized-view-
    maintenance pattern on the lake substrate.

    Each micro-batch folds its +/- change rows into per-group deltas
    (+1/-1 on count, +/- value on sum — one aggregation over the
    change volume only), joins the deltas against the CURRENT rollup
    rows of the touched groups, and commits the merged rows through
    :meth:`LakeTable.apply_changes` — one atomic equality-delta
    snapshot per batch with the same batch-id-in-commit exactly-once
    guard every sink here uses. Groups whose count reaches zero are
    deleted from the rollup.

    Cost ∝ change volume + rollup rows of the touched groups — never
    a recompute over the source: appends, MERGEs, deletes, and
    INSERT OVERWRITEs all arrive as row-level events, and compactions
    cost nothing (the changelog emits nothing for rewrites).

    Determinism contract: the sum is maintained in integer MICRO-UNITS
    (``round(value * 1e6)`` per row, summed as BIGINT), so the rollup
    state is EXACTLY order-independent — incremental adds/removes in
    any interleaving equal the one-shot aggregation, which is what
    lets a SQL oracle recompute the same bytes. Only count/sum (and
    anything derived: avg) maintain incrementally under deletes;
    min/max would need the full group re-read — out of scope by
    design, stated honestly.

    Target schema: ``[*group_cols, cnt BIGINT, sum_micro BIGINT]``.
    """
    from pyspark.sql import functions as F

    prop = guard_key_for_checkpoint(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t = target.refresh()
        if _is_replay(t.meta.properties, prop, batch_id):
            return
        sign = F.when(
            F.col("_change_type") == "delete", F.lit(-1)
        ).otherwise(F.lit(1))
        micro = F.round(F.col(value_col) * F.lit(1_000_000.0)).cast("long")
        # Materialize once: the delta feeds the emptiness check, the
        # semi-join build side, AND the merge probe side — without
        # this the expensive changelog read would re-run per use
        # (review r5).
        delta = (
            batch_df.select(
                *group_cols,
                sign.alias("__sign"),
                (sign * micro).alias("__dmicro"),
            )
            .groupBy(*group_cols)
            .agg(
                F.sum("__sign").cast("long").alias("d_cnt"),
                F.sum("__dmicro").cast("long").alias("d_sum"),
            )
            .localCheckpoint()
        )
        if not delta.take(1):
            # nothing to fold (e.g. a compaction-only range): commit
            # nothing — replaying an empty batch re-applies nothing,
            # so skipping the guard write is safe and saves a snapshot
            return
        # Only the TOUCHED groups' rollup rows flow: the delta is
        # change-volume-sized, so broadcast it into a semi join — the
        # rollup scan filters to touched rows before any exchange
        # (with a clustered rollup the min/max file stats additionally
        # prune whole files driver-side). Joins are NULL-SAFE: a null
        # group key is a legitimate group, and a null-unsafe join
        # would both miss its current row and fail to shadow it on
        # commit (review r5; apply_changes' equality deletes are
        # null-safe for the same reason).
        cur = t.read().select(
            *[F.col(c).alias(f"__cur_{c}") for c in group_cols],
            "cnt",
            "sum_micro",
        )
        semi_cond = F.lit(True)
        for c in group_cols:
            semi_cond = semi_cond & F.col(f"__cur_{c}").eqNullSafe(
                F.col(c)
            )
        cur = cur.join(
            F.broadcast(delta.select(*group_cols)), semi_cond, "left_semi"
        )
        merge_cond = F.lit(True)
        for c in group_cols:
            merge_cond = merge_cond & F.col(c).eqNullSafe(
                F.col(f"__cur_{c}")
            )
        merged = delta.join(cur, merge_cond, "left").select(
            *group_cols,
            (
                F.coalesce(F.col("cnt"), F.lit(0)) + F.col("d_cnt")
            ).cast("long").alias("cnt"),
            (
                F.coalesce(F.col("sum_micro"), F.lit(0)) + F.col("d_sum")
            ).cast("long").alias("sum_micro"),
        )
        changes = merged.select(
            *group_cols,
            "cnt",
            "sum_micro",
            F.when(F.col("cnt") == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("__op"),
        )
        t.apply_changes(
            changes,
            list(group_cols),
            op_col="__op",
            properties_update={prop: str(batch_id)},
        )

    q = (
        spark.readStream.format("lakestream")
        .option("path", source_root)
        .option("changelog", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return target.refresh()


def replicate_derived(
    spark,
    source_root: str,
    target: LakeTable,
    checkpoint_dir: str,
    key_cols: list[str],
    derive,
) -> LakeTable:
    """Maintain a DERIVED table from a source's changelog stream —
    the materialized-view pattern for row-wise derivations (round 5).

    ``derive(batch_df) -> DataFrame`` must be a ROW-PRESERVING map
    (select/withColumn — no aggregation, no row count change) from
    the source schema to the target's columns, passing
    ``_change_type`` and ``_commit_snapshot_id`` through untouched.
    Each source insert upserts the derived row, each delete removes
    it by key, one atomic equality-delta commit per micro-batch with
    the usual batch-id exactly-once guard. Cost ∝ change volume: the
    derivation runs only over changed rows, never the corpus —
    compactions emit nothing.

    This is :func:`replicate_changelog` with a transform seam; the
    flagship use is :func:`maintain_minhash_index` (a dedup signature
    index that stays fresh as the corpus evolves, without ever
    re-shingling unchanged documents).
    """
    from pyspark.sql import functions as F

    prop = guard_key_for_checkpoint(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t = target.refresh()
        if _is_replay(t.meta.properties, prop, batch_id):
            return
        if not batch_df.take(1):
            return  # compaction-only range: nothing derived, no commit
        derived = derive(batch_df)
        changes = derived.select(
            *[
                c
                for c in derived.columns
                if c not in ("_change_type", "_commit_snapshot_id")
            ],
            F.when(F.col("_change_type") == "delete", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("__op"),
            (
                F.col("_commit_snapshot_id") * 2
                + F.when(F.col("_change_type") == "insert", 1).otherwise(0)
            ).alias("__ord"),
        )
        t.apply_changes(
            changes,
            list(key_cols),
            op_col="__op",
            order_col="__ord",
            properties_update={prop: str(batch_id)},
        )

    q = (
        spark.readStream.format("lakestream")
        .option("path", source_root)
        .option("changelog", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return target.refresh()


def maintain_minhash_index(
    spark,
    source_root: str,
    index: LakeTable,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    shingle_n: int = 3,
) -> LakeTable:
    """Incrementally maintained MinHash signature index (round 5):
    the corpus-sized shingle+hash pass runs ONLY over changed
    documents — the index follows the corpus through appends, MERGEs,
    deletes, and overwrites without ever re-shingling an unchanged
    row (compactions cost nothing). Pair queries then run from the
    index alone via
    :func:`bergloom_spark.operators.dedup.minhash_lsh_pairs_from_sigs`
    — the batch-vs-index incremental dedup pattern with the index
    itself kept fresh by the changelog.

    Index schema: ``[id_col LONG, sig ARRAY<BIGINT>]``.
    """
    from pyspark.sql import functions as F

    from bergloom_spark.operators.dedup import minhash_signature

    def derive(batch_df: DataFrame) -> DataFrame:
        return batch_df.select(
            F.col(id_col),
            minhash_signature(text_col, k=k, shingle_n=shingle_n).alias(
                "sig"
            ),
            "_change_type",
            "_commit_snapshot_id",
        )

    return replicate_derived(
        spark, source_root, index, checkpoint_dir, [id_col], derive
    )

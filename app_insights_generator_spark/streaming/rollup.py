"""Streaming continuous-aggregate maintenance: foreachBatch + mergeable
states (operators/incremental.py) — the streaming face of the rollup
cascade (queries/events_queries.py rollup_cascade_events).

Per micro-batch: state <- merge(state, agg_state(batch)). Cost per batch
is O(|batch| + |groups|), independent of history — the same refresh
algebra the batch cascade proves, driven by Structured Streaming.

State is VERSIONED, never overwritten in place: batch N writes
``state_v{N}`` and then flips the ``_LATEST`` pointer file — the
write-new-then-swap-pointer shape every table format (Delta/Iceberg)
uses, because overwriting a parquet dir you are concurrently reading is
undefined. Retried batches (checkpoint replay after a crash) see the
pointer already at/past their id and SKIP — exactly-once state, at-least-
once invocation. On a real cluster the pointer flip must be an atomic
rename/putIfAbsent on the object store; the versioned layout is what
makes that a single tiny-file operation.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame

from app_insights_generator_spark.operators.incremental import (
    agg_state,
    merge_states,
)
from app_insights_generator_spark.streaming._state import (
    ensure_lineage,
    flip_latest,
    latest_version as _latest_version,
)


def read_state(spark, state_dir: str) -> DataFrame | None:
    """Current state table, or None before the first batch."""
    v = _latest_version(state_dir)
    if v < 0:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"state_v{v}"))


def _gc_superseded(state_dir: str, committed: int) -> None:
    """Reclaim state versions older than the committed one's
    predecessor: the merge rewrites the FULL state per batch (inherent —
    the merged table IS the product), so without retention every
    superseded ``state_v{N}`` snapshot leaks forever. The newest
    superseded version is kept for readers holding the old pointer (the
    same vacuum grace every table format gives)."""
    import shutil

    for d in os.listdir(state_dir):
        if d.startswith("state_v") and d[7:].isdigit():
            if int(d[7:]) < committed - 1:
                shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def run_continuous_rollup(
    events_sdf: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    measures: dict,
) -> None:
    """Drain a streaming DataFrame (trigger availableNow) into a merged
    per-group state table under ``state_dir``. ``measures`` is the
    agg_state/merge_states spec built lazily by the caller (Column specs
    need an active SparkContext). Reusing a state dir with a fresh
    checkpoint fails loudly (ADVICE r10 item 2: batch ids would restart
    at 0 and be skipped as replays)."""
    ensure_lineage(state_dir, checkpoint_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # Re-check INSIDE the batch: by now the checkpoint's metadata
        # file exists, so the query-id pin catches a checkpoint dir
        # deleted and recreated at the same path (ADVICE r11 item 2).
        ensure_lineage(state_dir, checkpoint_dir)
        if batch_id <= _latest_version(state_dir):
            return  # checkpoint replay of an applied batch: state is current
        spark = batch_df.sparkSession
        delta = agg_state(batch_df, keys, measures)
        prev = read_state(spark, state_dir)
        new = delta if prev is None else merge_states([prev, delta], keys, measures)
        out = os.path.join(state_dir, f"state_v{batch_id}")
        new.write.mode("overwrite").parquet(out)
        flip_latest(state_dir, batch_id)  # atomic pointer-flip commit
        # Retention AFTER the flip (round 12 — the dedup/ivf gc lesson:
        # superseded versions otherwise leak forever): keep the newly
        # committed version plus its predecessor for in-flight readers
        # (the vacuum contract), reclaim everything older.
        _gc_superseded(state_dir, batch_id)

    (
        events_sdf.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

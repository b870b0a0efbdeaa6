"""Streaming IVF index maintenance: foreachBatch feeding the persisted
IVF index (operators/similarity.py build_ivf_index / assign_to_index)
— the streaming face of the ANN serving loop's ingest half, symmetric
with streaming/dedup_stream.py.

Batch 0 FITS the coarse quantizer (deterministic sorted sample of the
first batch) and writes centroids + list_id-partitioned assignments;
every later batch is assigned to the FROZEN persisted centroids (one
map pass, O(batch)) and STAGED under its own versioned path. Queries
probe the committed view via ``read_streaming_index`` at any time.

State discipline (the rollup/dedup_stream pattern, hardened per ADVICE
r10 item 1): batch N's assignments land in ``lists_batches/b{N}`` with
mode=overwrite (so a replayed half-written batch is cleanly rewritten,
never doubled), and the ``_LATEST`` pointer flip is the COMMIT — readers
union the base lists table with exactly the batch dirs whose id is <=
the pointer, so an uncommitted or in-flight batch is invisible. A crash
at ANY point replays the batch into the same staged path and re-flips:
exactly-once index state from at-least-once invocation. The earlier
design called refresh_ivf_index's in-place append here, which a replay
would have doubled. Centroids are written once and never rewritten
(frozen by design; staleness is measured by the recall audit gate, not
assumed — refit is a new index build, not an in-place mutation).

Reusing a state dir with a FRESH checkpoint restarts batch ids at 0 and
would silently skip every batch as "replayed"; ``ensure_lineage`` pins
the checkpoint identity in a ``_RUN`` file and fails loudly instead
(ADVICE r10 item 2).

Equivalence contract (tests/test_streaming_ivf.py): any micro-batch
partitioning of a corpus whose FIRST batch equals the batch-mode fit
corpus yields an index identical to batch-mode
build_ivf_index + refresh_ivf_index over the same cut.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from app_insights_generator_spark.operators.similarity import (
    assign_to_index,
    build_ivf_index,
    read_ivf_index,
    write_ivf_index,
)
from app_insights_generator_spark.streaming._state import (
    ensure_lineage,
    flip_latest,
    latest_version,
)

_BATCHES = "lists_batches"


def _batch_path(index_dir: str, batch_id: int) -> str:
    return os.path.join(index_dir, _BATCHES, f"b{batch_id}")


def run_streaming_ivf(
    vecs_sdf: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    sample_size: int = 2048,
) -> None:
    """Drain a streaming vector source (trigger availableNow) into a
    persisted IVF index under ``index_dir``: fit-once on batch 0,
    frozen-assign + staged append for every later batch, committed by
    the ``_LATEST`` pointer flip."""
    ensure_lineage(index_dir, checkpoint_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= latest_version(index_dir):
            return  # checkpoint replay of a COMMITTED batch
        if latest_version(index_dir) < 0:
            centroids, assigned = build_ivf_index(
                batch_df, vec_col, id_col, n_lists=n_lists,
                sample_size=sample_size,
            )
            write_ivf_index(index_dir, centroids, assigned)
        else:
            add = assign_to_index(batch_df, index_dir, vec_col, id_col)
            # Staged, idempotent: a replay of an UNCOMMITTED batch
            # overwrites its own half-written dir instead of appending
            # a duplicate into the shared lists table.
            add.write.mode("overwrite").partitionBy("list_id").parquet(
                _batch_path(index_dir, batch_id)
            )
        flip_latest(index_dir, batch_id)  # the commit

    (
        vecs_sdf.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_streaming_index(spark, index_dir: str):
    """Committed (centroids, lists) view of a stream-maintained index,
    or None before the first committed batch: the base lists table
    unioned with every batch dir whose id is <= the ``_LATEST`` pointer
    (uncommitted staged batches are invisible)."""
    v = latest_version(index_dir)
    if v < 0:
        return None
    centroids, lists = read_ivf_index(spark, index_dir)
    broot = os.path.join(index_dir, _BATCHES)
    if os.path.isdir(broot):
        committed = sorted(
            int(d[1:])
            for d in os.listdir(broot)
            if d.startswith("b") and d[1:].isdigit() and int(d[1:]) <= v
        )
        for bid in committed:
            lists = lists.unionByName(
                spark.read.parquet(_batch_path(index_dir, bid))
            )
    return centroids, lists

"""Streaming IVF index maintenance: foreachBatch feeding the persisted
IVF index (operators/similarity.py build_ivf_index / refresh_ivf_index)
— the streaming face of the ANN serving loop's ingest half, symmetric
with streaming/dedup_stream.py.

Batch 0 FITS the coarse quantizer (deterministic sorted sample of the
first batch) and writes centroids + list_id-partitioned assignments;
every later batch is assigned to the FROZEN persisted centroids (one
map pass, O(batch)) and appended. Queries probe via
``ann_probe_persisted`` against the live index dir at any time.

State discipline (the rollup/dedup_stream pattern): the lists table is
append-only parquet, and applied batch ids are recorded in a pointer
file flipped LAST, so checkpoint replay of an applied batch is a no-op
— exactly-once index state from at-least-once invocation. Centroids
are written once and never rewritten (frozen by design; staleness is
measured by the recall audit gate, not assumed — refit is a new index
build, not an in-place mutation).

Equivalence contract (tests/test_streaming_ivf.py): any micro-batch
partitioning of a corpus whose FIRST batch equals the batch-mode fit
corpus yields an index identical to batch-mode
build_ivf_index + refresh_ivf_index over the same cut.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from app_insights_generator_spark.operators.similarity import (
    build_ivf_index,
    read_ivf_index,
    refresh_ivf_index,
    write_ivf_index,
)

_LATEST = "_LATEST"


def _latest_version(index_dir: str) -> int:
    p = os.path.join(index_dir, _LATEST)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


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
    frozen-assign + append for every later batch."""
    os.makedirs(index_dir, exist_ok=True)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _latest_version(index_dir):
            return  # checkpoint replay of an applied batch
        if _latest_version(index_dir) < 0:
            centroids, assigned = build_ivf_index(
                batch_df, vec_col, id_col, n_lists=n_lists,
                sample_size=sample_size,
            )
            write_ivf_index(index_dir, centroids, assigned)
        else:
            refresh_ivf_index(batch_df, index_dir, vec_col, id_col)
        tmp = os.path.join(index_dir, f"_LATEST.tmp.{batch_id}")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(index_dir, _LATEST))  # atomic flip

    (
        vecs_sdf.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_streaming_index(spark, index_dir: str):
    """Current (centroids, lists) of a stream-maintained index, or None
    before the first applied batch."""
    if _latest_version(index_dir) < 0:
        return None
    return read_ivf_index(spark, index_dir)

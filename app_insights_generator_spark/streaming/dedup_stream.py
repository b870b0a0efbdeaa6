"""Streaming incremental near-dedup: foreachBatch feeding the persisted
LSH band index (operators/dedup.py build_band_index /
incremental_near_dedup) — the streaming face of the daily-ingest dedup
job, VERDICT r09 item 7a.

Per micro-batch of newly ingested documents:

1. probe: near-dup pairs between the batch and the CURRENT persisted
   index (plus within the batch itself) via ``incremental_near_dedup``
   — O(batch) keyed probe, the corpus is never re-sketched;
2. extend: the batch's own band-index rows are UNIONED into the index
   state, so the next batch probes a corpus that includes this one;
3. emit: the verified pairs are appended to a cumulative pairs table.

State is VERSIONED with the rollup discipline (streaming/rollup.py):
batch N writes ``index_v{N}`` / ``pairs_v{N}`` and then flips the
``_LATEST`` pointer file last, so a retried batch (checkpoint replay
after a crash) sees the pointer already at/past its id and SKIPS —
exactly-once state from at-least-once invocation. On a real cluster the
pointer flip is an atomic rename/putIfAbsent on the object store, and
the index state lives bucketed by (band, bhash) so each probe
co-locates without reshuffling the index side.

Equivalence contract (pinned by tests/test_streaming_dedup.py): feeding
the corpus through ANY micro-batch partitioning yields exactly the
batch-mode pair set of ``incremental_near_dedup`` driven over the same
cut — pairs are discovered when their LATER document arrives, and
corpus-corpus re-pairs are structurally impossible (one probe side is
always the batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from app_insights_generator_spark.operators.dedup import (
    build_band_index,
    incremental_near_dedup,
)
from app_insights_generator_spark.streaming._state import (
    ensure_lineage,
    flip_latest,
    latest_version as _latest_version,
)

#: Persisted band-index schema (build_band_index's output): the first
#: batch probes an EMPTY index of exactly this shape.
_INDEX_SCHEMA = "band int, bhash bigint, _id bigint, _sh array<string>"
_PAIRS_SCHEMA = "id_a bigint, id_b bigint, jaccard double"


def read_index(spark, state_dir: str) -> DataFrame | None:
    """Current persisted band index, or None before the first batch."""
    v = _latest_version(state_dir)
    if v < 0:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"index_v{v}"))


def read_pairs(spark, state_dir: str) -> DataFrame | None:
    """Cumulative verified near-dup pairs, or None before the first batch."""
    v = _latest_version(state_dir)
    if v < 0:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"pairs_v{v}"))


def run_streaming_dedup(
    docs_sdf: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> None:
    """Drain a streaming document source (trigger availableNow) through
    the incremental near-dedup probe, maintaining the persisted band
    index and cumulative pair set under ``state_dir``. Reusing a state
    dir with a fresh checkpoint fails loudly (ADVICE r10 item 2: batch
    ids would restart at 0 and be skipped as replays)."""
    ensure_lineage(state_dir, checkpoint_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # Re-check INSIDE the batch: by now the checkpoint's metadata
        # file exists, so the query-id pin catches a checkpoint dir
        # deleted and recreated at the same path (ADVICE r11 item 2).
        ensure_lineage(state_dir, checkpoint_dir)
        if batch_id <= _latest_version(state_dir):
            return  # checkpoint replay of an applied batch: state is current
        spark = batch_df.sparkSession
        prev_index = read_index(spark, state_dir)
        if prev_index is None:
            prev_index = spark.createDataFrame([], _INDEX_SCHEMA)
        prev_pairs = read_pairs(spark, state_dir)
        if prev_pairs is None:
            prev_pairs = spark.createDataFrame([], _PAIRS_SCHEMA)

        new_pairs = incremental_near_dedup(
            batch_df,
            prev_index,
            id_col,
            text_col,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
        ).select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("jaccard").cast("double"),
        )
        batch_index = build_band_index(
            batch_df, id_col, text_col, shingle_n, num_hashes, bands
        ).select(
            F.col("band").cast("int"),
            F.col("bhash").cast("bigint"),
            F.col("_id").cast("bigint"),
            "_sh",
        )

        idx_out = os.path.join(state_dir, f"index_v{batch_id}")
        pairs_out = os.path.join(state_dir, f"pairs_v{batch_id}")
        prev_index.unionByName(batch_index).write.mode("overwrite").parquet(
            idx_out
        )
        prev_pairs.unionByName(new_pairs).write.mode("overwrite").parquet(
            pairs_out
        )
        flip_latest(state_dir, batch_id)  # atomic commit

    (
        docs_sdf.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

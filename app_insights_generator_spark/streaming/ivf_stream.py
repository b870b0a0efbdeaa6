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

Lifecycle completion — COMPACTION (round 11): a long-running stream
accumulates one staged dir per batch; ``compact_streaming_index`` folds
every committed staged batch into a new versioned base table
(``lists_base_v{N}``, mode=overwrite) and commits via an atomic
``_BASE`` pointer flip, so readers see identical rows at any crash
point (old base + all batches before the flip, new base + none after).
``probe_streaming_index`` serves the committed view with the same
literal partition filter as ann_probe_persisted.

Equivalence contract (tests/test_streaming_ivf.py): any micro-batch
partitioning of a corpus whose FIRST batch equals the batch-mode fit
corpus yields an index identical to batch-mode
build_ivf_index + refresh_ivf_index over the same cut — before AND
after compaction.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame

from app_insights_generator_spark.operators.similarity import (
    assign_to_index,
    build_ivf_index,
    probe_index_view,
    write_ivf_index,
)
from app_insights_generator_spark.streaming._state import (
    ensure_lineage,
    flip_base_pointer,
    flip_latest,
    latest_version,
    read_base_pointer,
)

_BATCHES = "lists_batches"
_DEFAULT_BASE = "lists"


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
        # Re-check INSIDE the batch: by now the checkpoint's metadata
        # file exists, so the query-id pin catches a checkpoint dir
        # deleted and recreated at the same path (ADVICE r11 item 2).
        ensure_lineage(index_dir, checkpoint_dir)
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


def _committed_batch_ids(index_dir: str, lo: int, hi: int) -> list[int]:
    """Staged batch ids in (lo, hi] — committed (<= _LATEST) and not yet
    folded into the base (> the base pointer's upto)."""
    broot = os.path.join(index_dir, _BATCHES)
    if not os.path.isdir(broot):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(broot)
        if d.startswith("b") and d[1:].isdigit() and lo < int(d[1:]) <= hi
    )


def read_streaming_index(spark, index_dir: str):
    """Committed (centroids, lists) view of a stream-maintained index,
    or None before the first committed batch: the current BASE table
    (the ``_BASE`` pointer's dir — ``lists`` before any compaction)
    unioned with every staged batch dir whose id is in
    (base.upto, _LATEST] — uncommitted staged batches and batches
    already folded by compaction are both invisible."""
    v = latest_version(index_dir)
    if v < 0:
        return None
    base_dir, upto = read_base_pointer(index_dir, _DEFAULT_BASE)
    cent_rows = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .orderBy("list_id")
        .collect()
    )
    centroids = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    lists = spark.read.parquet(os.path.join(index_dir, base_dir))
    for bid in _committed_batch_ids(index_dir, upto, v):
        lists = lists.unionByName(
            spark.read.parquet(_batch_path(index_dir, bid))
        )
    return centroids, lists


def probe_streaming_index(
    spark, index_dir: str, queries, k: int = 10, n_probe: int = 3
):
    """ann_probe_persisted for a stream-maintained index: probes the
    COMMITTED view (base + unfolded staged batches). Every unioned
    source is list_id-partitioned, so the literal probe filter prunes
    each scan the same way it prunes the single base table."""
    view = read_streaming_index(spark, index_dir)
    if view is None:
        raise ValueError(f"no committed batches under {index_dir!r}")
    centroids, lists = view
    return probe_index_view(spark, centroids, lists, queries, k, n_probe)


def compact_streaming_index(spark, index_dir: str, gc: bool = False) -> int:
    """Fold every committed staged batch into a NEW versioned base table
    — the maintenance job that completes the serving-loop lifecycle
    (build -> staged refresh -> audit/refit-decision -> COMPACT): a
    long-running ingest stream accumulates one small parquet dir per
    batch, and at 100 TB the probe's cost per list grows with file
    count, not data size, until the staged dirs are folded back into
    one partitioned table.

    Same commit discipline as every state transition here: the merged
    table lands at ``lists_base_v{N}`` (N = the _LATEST id it folds up
    to, mode=overwrite so a crashed compaction retries into the same
    path), and the atomic ``_BASE`` pointer flip is the commit. Readers
    (read_streaming_index) union base + batches in (upto, latest], so
    a reader before the flip sees old-base + all batches and a reader
    after sees new-base + none — identical rows either way, at any
    crash point. ``gc=True`` additionally reclaims EVERY superseded dir
    AFTER the flip (ADVICE r11 item 3 — not just the dirs this call
    folded): all staged batches with id <= the new upto and all base
    dirs other than the newly committed one, so alternating gc settings
    cannot leak state folded by earlier gc=False compactions. Safe for
    new readers; a concurrent reader holding the old view should finish
    first — the same contract as every table format's vacuum. Ingest
    keeps working after a gc'd first compaction because the assignment
    pass reads only the centroid table (read_ivf_centroids, ADVICE r11
    item 1), never a lists dir.

    Returns the number of staged batch dirs folded (0 = no-op)."""
    import shutil

    v = latest_version(index_dir)
    if v < 0:
        return 0
    base_dir, upto = read_base_pointer(index_dir, _DEFAULT_BASE)
    batch_ids = _committed_batch_ids(index_dir, upto, v)
    if not batch_ids:
        return 0
    merged = spark.read.parquet(os.path.join(index_dir, base_dir))
    for bid in batch_ids:
        merged = merged.unionByName(
            spark.read.parquet(_batch_path(index_dir, bid))
        )
    # Coalesce files per list, not just dirs: without the repartition the
    # partitioned write preserves input splits and every staged file
    # becomes its own output file — 0 files reclaimed, which the
    # ivf_compaction_receipt gate measured live (49 -> 49). One shuffle
    # keyed on list_id (n_lists tasks, each writing its own list's single
    # file) is exactly the OPTIMIZE bin-pack; at sizes where one file per
    # list exceeds a sane file target, raise the partition count — the
    # receipt's invariant is "strictly fewer files", not "one file".
    n_lists = (
        spark.read.parquet(os.path.join(index_dir, "centroids")).count()
    )
    new_base = f"lists_base_v{v}"
    merged.repartition(n_lists, "list_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(os.path.join(index_dir, new_base))
    flip_base_pointer(index_dir, new_base, v)  # the commit
    if gc:
        broot = os.path.join(index_dir, _BATCHES)
        if os.path.isdir(broot):
            for d in os.listdir(broot):
                if d.startswith("b") and d[1:].isdigit() and int(d[1:]) <= v:
                    shutil.rmtree(os.path.join(broot, d), ignore_errors=True)
        for d in os.listdir(index_dir):
            is_base = d == _DEFAULT_BASE or (
                d.startswith("lists_base_v") and d != new_base
            )
            if is_base:
                shutil.rmtree(
                    os.path.join(index_dir, d), ignore_errors=True
                )
    return len(batch_ids)

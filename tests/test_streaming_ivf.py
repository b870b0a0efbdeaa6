"""Streaming IVF index maintenance (streaming/ivf_stream.py): fit-once
on batch 0, frozen-assign + append for later batches, replay-idempotent
— and the stream-maintained index must equal the batch-mode
build + refresh over the same corpus cut."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from app_insights_generator_spark.operators import similarity as S
from app_insights_generator_spark.streaming.ivf_stream import (
    read_streaming_index,
    run_streaming_ivf,
)

DIM = 8


def _vecs(seed, ids):
    rng = np.random.default_rng(seed)
    return [
        (int(i), [float(x) for x in rng.standard_normal(DIM)]) for i in ids
    ]


def _write(src, name, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        ),
        str(src / name),
    )


def test_streaming_ivf_matches_batch_mode(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    b0 = _vecs(1, range(100))
    b1 = _vecs(2, range(100, 140))

    def run_once():
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(
            sdf, index_dir, ckpt, n_lists=4, sample_size=100
        )

    _write(src, "b0.parquet", b0)
    run_once()
    centroids, lists = read_streaming_index(spark, index_dir)
    assert lists.count() == 100

    _write(src, "b1.parquet", b1)
    run_once()
    cent2, lists2 = read_streaming_index(spark, index_dir)
    # Centroids are FROZEN after the batch-0 fit.
    assert np.allclose(cent2, centroids)
    assert lists2.count() == 140

    # Batch-mode equivalence on the same cut: fit on b0, refresh with b1.
    df0 = spark.createDataFrame(b0, ["vec_id", "embedding"])
    df1 = spark.createDataFrame(b1, ["vec_id", "embedding"])
    ref_dir = str(tmp_path / "ivf_ref")
    cent_ref, assigned = S.build_ivf_index(
        df0, "embedding", "vec_id", n_lists=4, sample_size=100
    )
    S.write_ivf_index(ref_dir, cent_ref, assigned)
    S.refresh_ivf_index(df1, ref_dir, "embedding", "vec_id")
    assert np.allclose(cent2, cent_ref)
    _, ref_lists = S.read_ivf_index(spark, ref_dir)
    got = {
        (r["id"], r["list_id"])
        for r in lists2.select("id", "list_id").collect()
    }
    want = {
        (r["id"], r["list_id"])
        for r in ref_lists.select("id", "list_id").collect()
    }
    assert got == want

    # Replay/no-new-data: a third run changes nothing.
    run_once()
    _, lists3 = read_streaming_index(spark, index_dir)
    assert lists3.count() == 140


def test_streaming_ivf_staged_crash_replay_no_duplicates(spark, tmp_path):
    """ADVICE r10 item 1 (exactly-once): a crash AFTER the batch's staged
    write but BEFORE the pointer flip must (a) leave the uncommitted rows
    invisible to readers, and (b) replay into the same staged path
    without duplicating vectors — the failure mode the old in-place
    refresh append had."""
    from app_insights_generator_spark.operators.similarity import (
        assign_to_index,
    )
    from app_insights_generator_spark.streaming._state import latest_version

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(sdf, index_dir, ckpt, n_lists=4, sample_size=100)

    _write(src, "b0.parquet", _vecs(1, range(100)))
    run_once()
    assert latest_version(index_dir) == 0

    # Simulate the crash: batch 1's staged dir exists (half/fully written)
    # but the pointer was never flipped and the checkpoint never advanced.
    b1 = _vecs(2, range(100, 140))
    _write(src, "b1.parquet", b1)
    df1 = spark.createDataFrame(b1, ["vec_id", "embedding"])
    staged = assign_to_index(df1, index_dir, "embedding", "vec_id")
    staged.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{index_dir}/lists_batches/b1"
    )
    # (a) uncommitted staged rows are invisible to the committed view.
    _, lists = read_streaming_index(spark, index_dir)
    assert lists.count() == 100

    # (b) the replayed batch overwrites its own staged dir: no doubling.
    run_once()
    assert latest_version(index_dir) == 1
    _, lists2 = read_streaming_index(spark, index_dir)
    assert lists2.count() == 140
    assert lists2.select("id").distinct().count() == 140


def test_streaming_state_lineage_guard(spark, tmp_path):
    """ADVICE r10 item 2: reusing an existing state/index dir with a
    FRESH checkpoint dir restarts batch ids at 0 — every new batch would
    be silently skipped as a replay. All three foreachBatch streams must
    fail loudly instead."""
    import pytest

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    _write(src, "b0.parquet", _vecs(1, range(100)))

    def run(ckpt):
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(
            sdf, index_dir, str(tmp_path / ckpt), n_lists=4, sample_size=100
        )

    run("ckpt_a")
    with pytest.raises(RuntimeError, match="checkpoint"):
        run("ckpt_b")
    # The original lineage keeps working.
    run("ckpt_a")
    _, lists = read_streaming_index(spark, index_dir)
    assert lists.count() == 100


def test_streaming_ivf_compaction_preserves_view_and_probe(spark, tmp_path):
    """Compaction lifecycle: folding staged batches into a versioned base
    must preserve the committed view EXACTLY (same (id, list_id) set,
    same probe top-k), survive a crash between the base write and the
    pointer flip, keep ingesting after compaction, and gc must leave a
    readable index."""
    from app_insights_generator_spark.streaming._state import (
        read_base_pointer,
    )
    from app_insights_generator_spark.streaming.ivf_stream import (
        compact_streaming_index,
        probe_streaming_index,
    )

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(sdf, index_dir, ckpt, n_lists=4, sample_size=100)

    _write(src, "b0.parquet", _vecs(1, range(100)))
    run_once()
    _write(src, "b1.parquet", _vecs(2, range(100, 140)))
    run_once()

    queries = spark.createDataFrame(
        [(i, v) for i, v in _vecs(9, range(5))], ["qid", "qv"]
    )

    def snapshot():
        _, lists = read_streaming_index(spark, index_dir)
        pairs = {
            (r["id"], r["list_id"])
            for r in lists.select("id", "list_id").collect()
        }
        top = {
            (r["qid"], r["rn"], r["id"])
            for r in probe_streaming_index(
                spark, index_dir, queries, k=5, n_probe=2
            ).collect()
        }
        return pairs, top

    before = snapshot()
    assert len(before[0]) == 140

    # Crash between base write and pointer flip: reader unaffected.
    _, lists = read_streaming_index(spark, index_dir)
    lists.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{index_dir}/lists_base_v1"
    )
    assert snapshot() == before
    assert read_base_pointer(index_dir, "lists") == ("lists", -1)

    # The retried compaction commits; the view is bit-identical.
    assert compact_streaming_index(spark, index_dir) == 1
    assert read_base_pointer(index_dir, "lists") == ("lists_base_v1", 1)
    assert snapshot() == before

    # Idempotent: nothing left to fold.
    assert compact_streaming_index(spark, index_dir) == 0

    # Ingest continues after compaction; only the NEW batch is unfolded.
    _write(src, "b2.parquet", _vecs(3, range(140, 170)))
    run_once()
    _, lists3 = read_streaming_index(spark, index_dir)
    assert lists3.count() == 170

    # Second compaction folds just the new batch, with gc.
    assert compact_streaming_index(spark, index_dir, gc=True) == 1
    base_dir, upto = read_base_pointer(index_dir, "lists")
    assert base_dir == "lists_base_v2" and upto == 2
    import os

    assert not os.path.isdir(f"{index_dir}/lists_base_v1")
    assert not os.path.isdir(f"{index_dir}/lists_batches/b2")
    _, lists4 = read_streaming_index(spark, index_dir)
    assert lists4.count() == 170
    assert lists4.select("id").distinct().count() == 170


def test_streaming_ivf_gc_on_first_compaction_then_ingest(spark, tmp_path):
    """ADVICE r11 item 1 (the HIGH): gc=True on the FIRST compaction
    deletes the default ``lists`` dir — and every later micro-batch's
    assignment pass must keep working, because it reads only the frozen
    centroid table (read_ivf_centroids), never a lists dir. The old
    assign path (read_ivf_index) wedged the ingest stream permanently
    with PATH_NOT_FOUND here."""
    from app_insights_generator_spark.streaming.ivf_stream import (
        compact_streaming_index,
        probe_streaming_index,
    )

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(sdf, index_dir, ckpt, n_lists=4, sample_size=100)

    _write(src, "b0.parquet", _vecs(1, range(100)))
    run_once()
    _write(src, "b1.parquet", _vecs(2, range(100, 140)))
    run_once()

    # First compaction, gc immediately: the default 'lists' dir is gone.
    import os

    assert compact_streaming_index(spark, index_dir, gc=True) == 1
    assert not os.path.isdir(f"{index_dir}/lists")
    assert not os.path.isdir(f"{index_dir}/lists_batches/b1")

    # The NEXT ingest batch must assign + stage + commit normally.
    _write(src, "b2.parquet", _vecs(3, range(140, 170)))
    run_once()
    _, lists = read_streaming_index(spark, index_dir)
    assert lists.count() == 170
    assert lists.select("id").distinct().count() == 170

    # And the committed view stays probeable.
    queries = spark.createDataFrame(
        [(i, v) for i, v in _vecs(9, range(3))], ["qid", "qv"]
    )
    top = probe_streaming_index(spark, index_dir, queries, k=3, n_probe=2)
    assert top.count() == 9


def test_streaming_ivf_gc_reclaims_earlier_compactions(spark, tmp_path):
    """ADVICE r11 item 3: a gc'd compaction must reclaim state folded by
    EARLIER gc=False compactions — every staged batch dir with id <= the
    new upto and every superseded base dir — so alternating gc settings
    cannot leak state forever."""
    import os

    from app_insights_generator_spark.streaming.ivf_stream import (
        compact_streaming_index,
    )

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(sdf, index_dir, ckpt, n_lists=4, sample_size=100)

    _write(src, "b0.parquet", _vecs(1, range(100)))
    run_once()
    _write(src, "b1.parquet", _vecs(2, range(100, 140)))
    run_once()
    # gc=False: folded state is left on disk.
    assert compact_streaming_index(spark, index_dir) == 1
    assert os.path.isdir(f"{index_dir}/lists")
    assert os.path.isdir(f"{index_dir}/lists_batches/b1")

    _write(src, "b2.parquet", _vecs(3, range(140, 170)))
    run_once()
    # gc=True now reclaims EVERYTHING superseded, including the leftovers.
    assert compact_streaming_index(spark, index_dir, gc=True) == 1
    assert not os.path.isdir(f"{index_dir}/lists")
    assert not os.path.isdir(f"{index_dir}/lists_base_v1")
    assert not os.path.isdir(f"{index_dir}/lists_batches/b1")
    assert not os.path.isdir(f"{index_dir}/lists_batches/b2")
    assert os.path.isdir(f"{index_dir}/lists_base_v2")

    _, lists = read_streaming_index(spark, index_dir)
    assert lists.count() == 170
    assert lists.select("id").distinct().count() == 170


def test_streaming_recreated_checkpoint_same_path_fails_loudly(
    spark, tmp_path
):
    """ADVICE r11 item 2: deleting and recreating the checkpoint dir AT
    THE SAME PATH defeats the realpath pin while batch ids restart at 0
    — the exact silent skip-every-batch failure the lineage guard was
    added to prevent. The query-id pin (from the checkpoint's metadata
    file, fresh per recreation) must fail the first batch loudly."""
    import shutil

    import pytest

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(sdf, index_dir, ckpt, n_lists=4, sample_size=100)

    _write(src, "b0.parquet", _vecs(1, range(100)))
    run_once()
    _, lists = read_streaming_index(spark, index_dir)
    assert lists.count() == 100

    # Nuke the checkpoint: same path, fresh lineage, batch ids restart.
    shutil.rmtree(ckpt)
    _write(src, "b1.parquet", _vecs(2, range(100, 140)))
    with pytest.raises(Exception, match="recreated"):
        run_once()
    # State was NOT silently corrupted: the committed view is unchanged.
    _, lists2 = read_streaming_index(spark, index_dir)
    assert lists2.count() == 100


def test_streaming_probe_prunes_every_unioned_scan(spark, tmp_path):
    """The committed view before compaction unions the base lists table
    with each staged batch dir — ALL list_id-partitioned, so the literal
    probe filter must reach every one of them as PartitionFilters (the
    100 TB claim: probe cost is n_probe/n_lists of the data per source,
    never a full scan of any generation)."""
    import re

    from app_insights_generator_spark.streaming.ivf_stream import (
        probe_streaming_index,
    )

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(src))
        run_streaming_ivf(sdf, index_dir, ckpt, n_lists=4, sample_size=100)

    _write(src, "b0.parquet", _vecs(1, range(100)))
    run_once()
    _write(src, "b1.parquet", _vecs(2, range(100, 140)))
    run_once()
    _write(src, "b2.parquet", _vecs(3, range(140, 170)))
    run_once()

    queries = spark.createDataFrame(
        [(i, v) for i, v in _vecs(9, range(2))], ["qid", "qv"]
    )
    plan = (
        probe_streaming_index(spark, index_dir, queries, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "vec:array" in ln
    ]
    # base + two staged dirs = three vector-carrying scans in the union.
    assert len(scans) == 3, plan
    for ln in scans:
        m = re.search(r"PartitionFilters: \[([^\]]*)", ln)
        assert m and re.search(r"list_id#\d+ IN \(", m.group(1)), ln

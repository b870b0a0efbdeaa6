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

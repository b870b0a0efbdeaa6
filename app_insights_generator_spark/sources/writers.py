"""Sinks.

The reference writes every batch through ``coalesce(1)`` (main.py:358, 393)
— a single-task bottleneck that cannot scale. Here single-file output is an
explicit opt-in flag; the default lets every shuffle partition write its own
file in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """CSV sink (reference write_to_csv, main.py:241-256)."""
    if single_file:
        df = df.coalesce(1)
    df.write.option("header", header).mode(mode).csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """JSON-lines sink (north-star surface: "DataFrame ops over CSV/JSON").
    One file per partition by default — same scale stance as write_csv."""
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16, n_buckets: int = 64
) -> DataFrame:
    """Add a ``_zvalue`` column: the Morton (bit-interleaved) index of the
    given numeric columns, each rank-normalized to ``[0, 2^bits)``.

    Normalization uses driver-side approximate quantile boundaries — ONE
    multi-column ``approxQuantile`` sample pass, no global sort — so the
    mapping is a broadcastable per-column literal lookup, not a window
    over the whole table: the scale-safe alternative to ``ntile`` at
    100 TB. Bucket assignment counts boundaries <= value over the
    (``n_buckets - 1``-element) literal array, and bit-interleaving is
    ``shiftleft``/``|`` — all Catalyst expressions, zero UDFs, no shuffle
    added to the scan.

    ``n_buckets`` trades layout granularity for per-row compare cost (the
    boundary scan is O(n_buckets) per row per column). 64 equal-frequency
    buckets per dimension already bounds every row group's span to ~1/64
    of each column's rank range with typical file counts — far below the
    skip threshold any selective scan needs — and measured 4x cheaper to
    write than 256.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_value interleaves 1-4 columns")
    n = 1 << bits
    n_cuts = min(n, n_buckets)
    probs = [i / n_cuts for i in range(1, n_cuts)]
    all_cuts = df.approxQuantile(cols, probs, 0.01)
    out = df
    bucket_cols = []
    for c, cuts in zip(cols, all_cuts):
        asc = []
        for v in cuts:
            if not asc or v > asc[-1]:
                asc.append(v)
        b = f"_zb_{c}"
        if not asc:  # constant column: every row in bucket 0
            out = out.withColumn(b, F.lit(0).cast("bigint"))
            bucket_cols.append(b)
            continue
        arr = ", ".join(f"{float(v)!r}D" for v in asc)
        # Equal-frequency bucket index = #boundaries <= value (0-based,
        # 0..len(asc)), then scaled so interleaving uses all bit planes.
        scale = max(1, n // (len(asc) + 1))
        out = out.withColumn(
            b,
            F.expr(
                f"CAST(size(filter(array({arr}), _zx -> _zx <= "
                f"CAST(`{c}` AS DOUBLE))) * {scale} AS BIGINT)"
            ),
        )
        bucket_cols.append(b)
    k = len(bucket_cols)
    terms = []
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            terms.append(f"shiftleft(shiftright(`{b}`, {i}) & 1, {i * k + j})")
    z = " | ".join(terms)
    return out.withColumn("_zvalue", F.expr(z)).drop(*bucket_cols)


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 16,
    block_size: int | None = None,
) -> None:
    """Z-order clustered parquet sink: range-partition + sort on the Morton
    index of ``cols`` so row groups get narrow min/max bands on EVERY
    z-ordered column at once — multi-dimensional data skipping, where a
    plain sort only skips on its leading column. At 100 TB, z-ordering the
    fact table on its two or three hottest filter columns lets selective
    scans on either column (or both) prune most row groups from footer
    statistics alone.
    """
    zdf = zorder_value(df, cols, bits=bits)
    writer = (
        zdf.repartitionByRange(num_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
    )
    if block_size is not None:
        writer = writer.option("parquet.block.size", block_size)
    writer.parquet(path)


def compact_parquet_dir(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """Compact a directory of small parquet files into ~``target_bytes``
    outputs; returns the new file count.

    The operational fix for the small-files problem streaming ingest
    creates (one file per partition per micro-batch): many tiny files cost
    a listing + open + footer parse each, and at 100 TB the metadata
    overhead dwarfs the data read. File count is sized from the ACTUAL
    on-disk bytes (a listing, not a data pass); the rewrite itself is one
    distributed job — read, coalesce (no shuffle), write to a temp dir,
    atomic-ish swap. Table formats do this transactionally (OPTIMIZE);
    this is the raw-directory equivalent.
    """
    import os
    import shutil

    total = 0
    for root, dirs, files in os.walk(path):
        for d in dirs:
            if "=" in d:
                # Reading a partitioned dir flattens the partition column
                # into data and the rewrite would lose the layout (and its
                # pruning). Compact each leaf partition directory instead.
                raise ValueError(
                    f"{path} contains Hive-partition dir {d!r}: compact "
                    "each partition leaf separately to preserve the layout"
                )
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(min_files, -(-total // target_bytes))
    df = spark.read.parquet(path)
    n_rows_before = df.count()
    tmp = path.rstrip("/") + "__compact_tmp"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    # Verify the rewrite BEFORE touching the source, and never have a
    # moment where nothing sits at `path`: row-count check, then move the
    # original aside, rename tmp into place, and only then delete the old
    # copy. A crash mid-swap leaves either the original or the compacted
    # data at (or one rename away from) the path — never an absent dataset.
    n_rows_after = spark.read.parquet(tmp).count()
    if n_rows_after != n_rows_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row-count mismatch at {path}: "
            f"{n_rows_before} before vs {n_rows_after} after — source left intact"
        )
    old = path.rstrip("/") + "__compact_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )

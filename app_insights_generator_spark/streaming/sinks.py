"""Streaming sinks beyond the memory harness: foreachBatch with an
idempotent per-batch layout.

``foreachBatch`` is THE production streaming sink pattern — each
micro-batch arrives as a plain batch DataFrame the callback can write with
the full batch API (formats, partitioning, merges) that ``writeStream``
lacks. Spark re-runs a failed batch with the SAME ``batch_id``, so a sink
that keys its writes on the batch id (here: one overwritten
``ingest_batch=N`` directory per micro-batch) is exactly-once end-to-end even
though the callback itself only has at-least-once delivery.

Scale notes: each micro-batch write is a normal distributed parquet job
(one file per shuffle partition — no coalesce bottleneck); the read-back
side treats ``ingest_batch`` as a partition column and prunes on it like any
other. Swap the overwrite-by-batch-dir for MERGE INTO on a table format
with atomic commits (Iceberg/Delta) when one is available — the callback
shape is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def run_foreach_batch_to_parquet(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
) -> None:
    """Drain a streaming DataFrame (trigger availableNow) through an
    idempotent foreachBatch parquet sink: micro-batch N lands in
    ``out_dir/ingest_batch=N``, overwritten wholesale on retry so replays
    cannot double-write."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"ingest_batch={batch_id}")
        )

    q = (
        sdf.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout with the query still
        # running — swallowing that would hand callers a partially drained
        # sink as success.
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"stream did not drain within {timeout_s}s "
                f"(checkpoint {checkpoint_dir})"
            )
    finally:
        q.stop()


def read_foreach_batch_output(
    spark: SparkSession, out_dir: str, schema=None
) -> DataFrame:
    """Read the union of all committed micro-batches back as one batch
    DataFrame (``ingest_batch`` is recovered as a partition column and then
    dropped — it is sink bookkeeping, not data)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("basePath", out_dir).parquet(os.path.join(out_dir, "ingest_batch=*"))
    return df.drop("ingest_batch")

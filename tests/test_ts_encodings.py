"""The events.ts unit-assumption regression test (VERDICT r02 item 2).

The driver's testdata has shipped events.ts as TIMESTAMP(NANOS) (which
Spark reads only as a raw long under ``nanosAsLong``) in one round and as
plain timestamp[us] in the next. A reader that hardcodes either encoding
silently corrupts every event time by 1000x. This test writes the SAME
tiny events table in BOTH encodings and asserts batch read == stream read
== the known epochs for each, so the assumption can never silently break
again.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from app_insights_generator_spark.sources import load_table
from app_insights_generator_spark.streaming import read_events_stream, run_to_memory

# Three known instants (UTC epochs in seconds).
EPOCHS = [1_704_067_200, 1_704_067_260, 1_704_070_800]


def _write_events(dir_path: str, unit: str) -> None:
    os.makedirs(dir_path, exist_ok=True)
    ts = pa.array([e * 1_000_000 for e in EPOCHS], type=pa.int64()).cast(
        pa.timestamp("us")
    )
    if unit == "ns":
        ts = ts.cast(pa.timestamp("ns"))
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 10, 20], type=pa.int64()),
            "event_type": pa.array(["click", "click", "error"]),
            "value": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(dir_path, "events.parquet"))


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_batch_and_stream_agree_on_epochs(spark, tmp_path_factory, unit):
    d = str(tmp_path_factory.mktemp(f"events_{unit}"))
    _write_events(d, unit)

    batch = load_table(spark, d, "events")
    got_batch = sorted(
        r[0] for r in batch.select(F.unix_timestamp("ts").cast("long")).collect()
    )
    assert got_batch == EPOCHS, f"batch {unit} read wrong epochs"

    stream = read_events_stream(spark, d)
    flat = stream.select(
        "event_id", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("long").alias("epoch")
    )
    got_stream = sorted(
        r["epoch"]
        for r in run_to_memory(flat, f"t_enc_{unit}", output_mode="append").collect()
    )
    assert got_stream == EPOCHS, f"stream {unit} read wrong epochs"

"""Structured Streaming slice (SURVEY.md §7 M6) over the events table.

Each windowed operator here is the streaming twin of a batch query in
queries/events_queries.py — same window/gap parameters, so
batch-vs-stream equality is testable with trigger(availableNow) and the
batch queries' DuckDB oracles transitively cover the streaming semantics.

Scale notes: watermarks bound the state store (late data beyond the
watermark is dropped); the shuffle partitions the state by group key, so
state scales horizontally with executors. The file source here stands in
for Kafka — swap ``readStream.parquet`` for ``readStream.format("kafka")``
and the rest of the pipeline is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.readers import normalize_ns_long_to_timestamp


def events_stream_schema(ts_type) -> StructType:
    """Stream schema for the events table with the ts type the files
    actually carry. events.parquet has shipped as both TIMESTAMP(NANOS)
    (arrives as long under ``nanosAsLong``) and plain timestamp[us] —
    the caller probes the footer and passes the arrived type."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Probe the arrived ts dtype with a schema-only batch read (a footer
    # scan, no data pass): file streams need a declared schema, and
    # declaring long for a timestamp[us] file (or vice versa) silently
    # corrupts every event time by 1000x.
    probe = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    schema = events_stream_schema(probe.schema["ts"].dataType)
    # The file stream source requires a directory; pathGlobFilter narrows
    # it to the events table.
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # No-op when ts already arrived as timestamp (dtype-guarded helper
    # shared with sources/readers.py load_table).
    out = normalize_ns_long_to_timestamp(raw, "ts")
    if dict(out.dtypes)["ts"] == "timestamp_ntz":
        # Watermarks require TIMESTAMP (with-local-tz); the session tz is
        # pinned UTC above, so this cast reinterprets the same instant.
        out = out.withColumn("ts", F.col("ts").cast("timestamp"))
    return out


def tumbling_counts_stream(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of queries tumbling_window_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of queries sliding_window_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value") + 1e-9, 2).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "n_events",
            "avg_value",
        )
    )


def session_sums_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of queries session_window_events (dynamic-gap session
    windows merge in the state store as events arrive)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("session_start_epoch"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; state for older keys is evicted."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream_static(
    events: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (re-read)
    static side — the standard streaming enrichment pattern. The static
    dim is broadcast (dim-sized by construction), so the stream side never
    shuffles; no watermark is needed because the static side never ages."""
    return events.join(F.broadcast(dim), on, how)


def clicks_before_errors_stream(
    errors: DataFrame, clicks: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join (twin of the batch
    ``range_join_clicks_before_error`` pair set): errors inner-joined to
    the same user's clicks in the preceding 5 minutes. Both sides are
    watermarked and the join condition bounds event-time skew, so Spark
    can evict buffered rows once the watermark passes — state stays
    proportional to the interval, not the stream length."""
    err = errors.filter(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    ).withWatermark("ts", watermark)
    clk = clicks.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    cond = (
        (clk.c_user_id == err.user_id)
        & (clk.c_ts >= err.ts - F.expr("INTERVAL 5 MINUTE"))
        & (clk.c_ts < err.ts)
    )
    return err.join(clk, cond, "inner").select(
        "event_id", "user_id", "c_event_id"
    )


def run_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "complete", timeout_s: int = 300
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the available data
    (trigger availableNow) into an in-memory table; returns the result as a
    batch DataFrame. Test/dev harness — production uses a real sink."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        q.stop()
    return sdf.sparkSession.table(name)


def _click_error_joined(
    errors: DataFrame, clicks: DataFrame, watermark: str, how: str
) -> DataFrame:
    """Shared builder for the watermarked error-vs-click stream joins: one
    place owns the filters, watermarks, and the 5-minute window bound so
    the join-matrix variants can never drift apart."""
    err = (
        errors.filter(F.col("event_type") == "error")
        .select(F.col("event_id"), F.col("user_id"), F.col("ts"))
        .withWatermark("ts", watermark)
    )
    clk = (
        clicks.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (clk.c_user_id == err.user_id)
        & (clk.c_ts >= err.ts - F.expr("INTERVAL 5 MINUTE"))
        & (clk.c_ts < err.ts)
    )
    return err.join(clk, cond, how)


def clicks_before_errors_stream_outer(
    errors: DataFrame, clicks: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: every error emits, with
    NULL click columns when no same-user click preceded it within 5
    minutes. The outer side is the operationally interesting one —
    "errors with no preceding interaction" is the alerting signal — and
    it exercises the part of the join state machine the inner join
    never touches: an unmatched error row is held in state and emitted
    with NULLs only when the watermark passes its join window (so
    results trail the watermark; with availableNow over a finite source,
    errors near the end of the data may stay buffered and unemitted —
    the correct streaming semantics, asserted in tests rather than
    papered over)."""
    return _click_error_joined(errors, clicks, watermark, "left_outer").select(
        "event_id", "user_id", "ts", "c_event_id"
    )


def clicks_errors_stream_full_outer(
    errors: DataFrame, clicks: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """FULL OUTER watermarked stream-stream join — the last cell of the
    stream-stream join matrix (inner / left outer / full outer): rows on
    EITHER side with no 5-minute counterpart are held in state and
    emitted NULL-padded when the watermark passes their join window.
    Full-outer requires a watermark + time bound on BOTH inputs (Spark
    rejects it otherwise — the state would be unbounded on both sides);
    same trailing-emission caveat as the left-outer variant."""
    return _click_error_joined(errors, clicks, watermark, "full_outer").select(
        "event_id", "user_id", "c_event_id", "c_user_id"
    )

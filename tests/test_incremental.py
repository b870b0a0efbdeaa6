"""agg_state / merge_states (operators/incremental.py): the mergeability
algebra merge(state(A), state(B)) == state(A ∪ B) checked against direct
aggregation, in any merge tree shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from app_insights_generator_spark.operators.incremental import (
    agg_state,
    merge_states,
)

def _measures():
    # built lazily: F.col needs an active SparkContext under classic pyspark
    return {
        "n": ("count", None),
        "s": ("sum", F.col("v")),
        "lo": ("min", F.col("v")),
        "hi": ("max", F.col("v")),
    }


def _rows(seed: int, n: int):
    rng = random.Random(seed)
    return [(rng.choice("abc"), rng.randint(-50, 50)) for _ in range(n)]


def _direct(rows):
    out = {}
    for k, v in rows:
        n, s, lo, hi = out.get(k, (0, 0, None, None))
        out[k] = (
            n + 1,
            s + v,
            v if lo is None else min(lo, v),
            v if hi is None else max(hi, v),
        )
    return out


@pytest.mark.parametrize("n_splits", [2, 5])
def test_merged_states_equal_direct_aggregation(spark, n_splits):
    rows = _rows(11, 300)
    df = spark.createDataFrame(rows, ["k", "v"])
    splits = df.randomSplit([1.0] * n_splits, seed=3)
    states = [agg_state(s, ["k"], _measures()) for s in splits]
    merged = merge_states(states, ["k"], _measures())
    got = {r.k: (r.n, r.s, r.lo, r.hi) for r in merged.collect()}
    assert got == _direct(rows)


def test_merge_tree_shapes_agree(spark):
    rows = _rows(23, 200)
    df = spark.createDataFrame(rows, ["k", "v"])
    a, b, c = df.randomSplit([1.0, 1.0, 1.0], seed=5)
    st = [agg_state(x, ["k"], _measures()) for x in (a, b, c)]
    flat = merge_states(st, ["k"], _measures())
    nested = merge_states(
        [merge_states(st[:2], ["k"], _measures()), st[2]], ["k"], _measures()
    )
    assert sorted(map(tuple, flat.collect())) == sorted(map(tuple, nested.collect()))


def test_rejects_unmergeable_kind(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(ValueError, match="unmergeable"):
        agg_state(df, ["k"], {"m": ("avg", F.col("v"))})


def test_rejects_empty_state_list(spark):
    with pytest.raises(ValueError, match="at least one"):
        merge_states([], ["k"], _measures())


def test_rollup_cascade_day_from_hour_equals_direct(spark, sf_dir):
    """The resolution tree extends: day states merged FROM the hour level
    (itself merged from minute states — queries/events_queries.py
    rollup_cascade_events) equal a direct day aggregation of raw events."""
    from app_insights_generator_spark.queries.events_queries import (
        _rollup_measures,
        rollup_cascade_events,
    )
    from app_insights_generator_spark.sources import load_table

    measures = _rollup_measures()
    hour = rollup_cascade_events(spark, sf_dir)
    day_cascade = merge_states(
        [
            hour.withColumn(
                "day_epoch", F.expr("CAST(hour_epoch DIV 86400 * 86400 AS BIGINT)")
            ).drop("hour_epoch")
        ],
        ["event_type", "day_epoch"],
        measures,
    )
    cents = F.round(F.col("value") * 100).cast("long")
    day_direct = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 "
                "* 86400 AS BIGINT)"
            ).alias("day_epoch"),
            cents.alias("cents"),
        )
        .groupBy("event_type", "day_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )
    got = {tuple(r) for r in day_cascade.collect()}
    want = {tuple(r) for r in day_direct.collect()}
    assert got == want and len(want) > 0

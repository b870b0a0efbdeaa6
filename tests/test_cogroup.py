"""Cogrouped applyInPandas as-of merge (operators/cogroup.py).

Plants the boundary cases the sf oracle run can't guarantee it hits:
the inclusive 3600 s window edge, an error exactly at the purchase
timestamp, a purchase-before-any-error NULL, and a user with no errors
at all.
"""

from __future__ import annotations

import pytest

from app_insights_generator_spark.operators.cogroup import asof_error_context

US = 1_000_000


@pytest.fixture(scope="module")
def result(spark):
    purchases = spark.createDataFrame(
        [
            # user 1: errors at t=100s and t=500s
            (1, 10, 50 * US),  # before any error -> NULL gap, 0 in window
            (1, 11, 100 * US),  # exactly at an error -> gap 0, inclusive count 1
            (1, 12, 3700 * US),  # 3700-100=3600 exactly -> window INCLUDES t=100
            (1, 13, 4101 * US),  # 4101-500=3601 -> t=500 outside, t=100 outside
            # user 2: no errors at all
            (2, 20, 100 * US),
        ],
        "user_id long, event_id long, ts_us long",
    )
    errors = spark.createDataFrame(
        [(1, 100 * US), (1, 500 * US)],
        "user_id long, ts_us long",
    )
    rows = asof_error_context(purchases, errors).collect()
    return {r.event_id: (r.gap_s, r.errors_1h) for r in rows}


def test_before_any_error_is_null(result):
    assert result[10] == (None, 0)


def test_exact_tie_counts_and_zero_gap(result):
    assert result[11] == (0, 1)


def test_window_edge_inclusive(result):
    # gap to last error (t=500) = 3200s; window [100, 3700] holds both
    assert result[12] == (3200, 2)


def test_window_edge_exclusive_past_3600(result):
    assert result[13] == (3601, 0)


def test_user_without_errors(result):
    assert result[20] == (None, 0)


def test_arrow_variant_matches_pandas(spark, sf_dir):
    from app_insights_generator_spark.operators.cogroup import (
        asof_error_context_arrow,
        purchase_error_streams,
    )

    purchases, errors = purchase_error_streams(spark, sf_dir)
    a = sorted(map(tuple, asof_error_context(purchases, errors).collect()))
    b = sorted(map(tuple, asof_error_context_arrow(purchases, errors).collect()))
    assert a == b and len(a) > 0


def test_count_survives_column_pruning(spark, sf_dir):
    """Spark 4.1's ColumnPruning pushes below the cogroup UDF when no
    output VALUES are consumed (df.count()), delivering the errors side
    as just [user_id] — both UDF cores must tolerate the pruned schema
    and still return one row per purchase (found by the round-9 sf0.1
    robustness sweep; collect()/sinks were never affected)."""
    from app_insights_generator_spark.operators.cogroup import (
        asof_error_context,
        asof_error_context_arrow,
        purchase_error_streams,
    )

    p, e = purchase_error_streams(spark, sf_dir)
    expected = len(asof_error_context_arrow(p, e).collect())
    assert asof_error_context_arrow(p, e).count() == expected
    assert asof_error_context(p, e).count() == expected


def test_cores_tolerate_fully_pruned_purchases():
    """House rule (SCALE.md, ADVICE r09 item 2): ANY non-key input column
    can be absent under cardinality-only plans — including event_id on
    the purchases side, which no Spark version prunes TODAY but a future
    one may (errors already arrives as [user_id] under count()). Both
    UDF cores must produce one row per purchase from a purchases frame
    carrying ONLY the grouping key."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from app_insights_generator_spark.operators.cogroup import (
        _merge_purchase_errors,
        _merge_purchase_errors_arrow,
    )

    p_pd = pd.DataFrame({"user_id": np.array([7, 7, 7], dtype="int64")})
    e_pd = pd.DataFrame({"user_id": np.array([7], dtype="int64")})
    out = _merge_purchase_errors(p_pd, e_pd)
    assert len(out) == 3 and list(out.columns) == [
        "user_id", "event_id", "gap_s", "errors_1h",
    ]

    p_pa = pa.table({"user_id": pa.array([7, 7, 7], pa.int64())})
    e_pa = pa.table({"user_id": pa.array([7], pa.int64())})
    out_pa = _merge_purchase_errors_arrow(p_pa, e_pa)
    assert out_pa.num_rows == 3


def test_misshaped_input_raises_eagerly(spark, sf_dir):
    """ADVICE r09 item 3: the permissive pruning fallback must be
    reachable only via plan-level pruning — a CALLER passing a
    DataFrame without ts_us/event_id gets a loud ValueError at the API
    boundary (full pre-pruning schema visible there), never silently
    NULL gaps."""
    import pytest

    from app_insights_generator_spark.operators.cogroup import (
        asof_error_context,
        asof_error_context_arrow,
        purchase_error_streams,
    )

    p, e = purchase_error_streams(spark, sf_dir)
    with pytest.raises(ValueError, match="errors DataFrame is missing"):
        asof_error_context(p, e.select("user_id"))
    with pytest.raises(ValueError, match="purchases DataFrame is missing"):
        asof_error_context(p.drop("event_id"), e)
    with pytest.raises(ValueError, match="errors DataFrame is missing"):
        asof_error_context_arrow(p, e.select("user_id"))

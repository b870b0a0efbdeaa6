"""Cogrouped applyInPandas: per-key sorted-merge of two event streams.

``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas(fn, schema)``
(SPARK-27463) hands each key's rows from BOTH sides to one Python
function as two pandas DataFrames — the batch API for per-key
reconciliation logic that is not a plain join: pointer merges, as-of
matching with side conditions, interleaved audits. The reference's
single-table pipeline (main.py:363-404) has no two-stream surface at
all; this covers the Spark API a migrating user would reach for.

Scale notes (100 TB): one shuffle per side on the cogroup key, both
sides co-partitioned to the same hash partitioning, then Arrow-batched
Python workers receive one key group at a time. Driver state: none.
Worker state: bounded by the largest single key's rows on both sides —
the hazard is a hot key (one user with millions of events). Mitigation
here is upstream stream-splitting: each side is pre-filtered to ONE
event type before the cogroup, so a group is the per-user slice of that
type, not the whole firehose; a genuinely pathological user would need
the same salting treatment as any skewed groupBy (split by time bucket,
merge the per-bucket as-of results with a second pass over bucket
boundaries).

The merge itself is O(p log e) numpy searchsorted per group — no
python-level row loop, no cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: Output schema of :func:`asof_error_context` (arrow-mapped; gap_s is a
#: nullable pandas Int64 so no-prior-error rows surface as SQL NULL, not
#: a float NaN smuggled through an integer column).
ASOF_CONTEXT_SCHEMA = "user_id long, event_id long, gap_s long, errors_1h long"

_USEC_PER_SEC = 1_000_000
_WINDOW_US = 3_600 * _USEC_PER_SEC


def _asof_arrays(p_us: "np.ndarray", e_us: "np.ndarray"):
    """Pure-numpy core shared by the pandas and arrow merges: for sorted
    error times e_us, per purchase time -> (gap seconds, has-prior mask,
    trailing-hour count). Integer microsecond arithmetic so the DuckDB
    oracle (epoch_us + ``//``) matches bit-for-bit."""
    e_us = np.sort(e_us)
    # idx = #errors with ts <= purchase ts (side='right' keeps equality);
    # lo  = first error index >= ts - 1h (side='left' keeps equality).
    idx = np.searchsorted(e_us, p_us, side="right")
    lo = np.searchsorted(e_us, p_us - _WINDOW_US, side="left")
    has_prior = idx > 0
    if len(e_us):
        gap = (p_us - e_us[np.maximum(idx - 1, 0)]) // _USEC_PER_SEC
    else:  # no errors for this key: every gap is NULL
        gap = np.zeros(len(p_us), dtype="int64")
    return np.where(has_prior, gap, 0), has_prior, (idx - lo).astype("int64")


def _pruned_error_ts(errors) -> bool:
    """True when Spark's ColumnPruning removed ts_us from the errors side.

    Measured on Spark 4.1 (round 9, SCALE_SPARK_r09): when NO output
    column's VALUES are consumed downstream (``df.count()``), Catalyst
    prunes the cogroup children to the grouping key, so the errors table
    arrives as just ``[user_id]`` — for both applyInPandas and
    applyInArrow. That plan only reads output CARDINALITY, which is one
    row per purchase regardless of the error stream, so substituting an
    empty error stream is exact for every plan that triggers the
    pruning. ``collect()``/sinks receive the full columns and never take
    this path (pinned by tests/test_cogroup.py)."""
    names = (
        errors.schema.names if hasattr(errors, "schema") else errors.columns
    )
    return "ts_us" not in names


def _merge_purchase_errors(purchases: pd.DataFrame, errors: pd.DataFrame) -> pd.DataFrame:
    """For each purchase row: seconds since the user's most recent error
    at-or-before it (NULL if none) and the count of errors in the
    inclusive [ts - 1h, ts] window."""
    if _pruned_error_ts(errors):
        errors = pd.DataFrame({"ts_us": pd.Series(dtype="int64")})
    if purchases.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "event_id": pd.Series(dtype="int64"),
                "gap_s": pd.Series(dtype="Int64"),
                "errors_1h": pd.Series(dtype="int64"),
            }
        )
    # ANY non-key input column can be absent under cardinality-only plans
    # (the SCALE.md house rule; ADVICE r09 item 2 extends the ts_us guard
    # to event_id) — values are unread under such plans, so zeros are exact.
    p_us = (
        purchases["ts_us"].to_numpy(dtype="int64")
        if "ts_us" in purchases.columns
        else np.zeros(len(purchases), dtype="int64")  # pruned: values unread
    )
    ev_id = (
        purchases["event_id"].to_numpy(dtype="int64")
        if "event_id" in purchases.columns
        else np.zeros(len(purchases), dtype="int64")  # pruned: values unread
    )
    gap, has_prior, n1h = _asof_arrays(
        p_us,
        errors["ts_us"].to_numpy(dtype="int64"),
    )
    gap_col = pd.array(gap, dtype="Int64")
    gap_col[~has_prior] = pd.NA
    return pd.DataFrame(
        {
            "user_id": purchases["user_id"].to_numpy(dtype="int64"),
            "event_id": ev_id,
            "gap_s": gap_col,
            "errors_1h": n1h,
        }
    )


def _merge_purchase_errors_arrow(purchases, errors):
    """Arrow-native twin of :func:`_merge_purchase_errors`
    (cogroup().applyInArrow): the group crosses as pyarrow Tables, the
    numpy core reads the Arrow buffers directly (zero pandas
    materialization), and NULL gaps travel as an Arrow validity mask."""
    import pyarrow as pa

    if purchases.num_rows == 0:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "gap_s": pa.array([], pa.int64()),
                "errors_1h": pa.array([], pa.int64()),
            }
        )
    p_us = (
        purchases.column("ts_us").combine_chunks().to_numpy()
        if "ts_us" in purchases.schema.names
        else np.zeros(purchases.num_rows, dtype="int64")  # pruned: unread
    )
    ev_id = (
        purchases.column("event_id").combine_chunks()
        if "event_id" in purchases.schema.names
        else pa.array(  # pruned: values unread (ADVICE r09 item 2)
            np.zeros(purchases.num_rows, dtype="int64"), pa.int64()
        )
    )
    e_us = (
        errors.column("ts_us").combine_chunks().to_numpy()
        if errors.num_rows and not _pruned_error_ts(errors)
        else np.empty(0, dtype="int64")
    )
    gap, has_prior, n1h = _asof_arrays(p_us, e_us)
    return pa.table(
        {
            "user_id": purchases.column("user_id").combine_chunks(),
            "event_id": ev_id,
            "gap_s": pa.array(gap, pa.int64(), mask=~has_prior),
            "errors_1h": pa.array(n1h, pa.int64()),
        }
    )


def purchase_error_streams(spark, sf_dir: str):
    """Shared input prep for the as-of merge (gated query, bench twin, and
    the pandas-vs-arrow parity test all call this, so they can never
    drift onto different inputs): events split into the purchase spine
    (user_id, event_id, ts_us) and the error stream (user_id, ts_us),
    timestamps as unix_micros BIGINTs."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts_us")
    return purchases, errors


def _require_columns(df: DataFrame, needed: tuple[str, ...], side: str) -> None:
    """Eager schema validation at the API boundary (ADVICE r09 item 3):
    the worker-side cores tolerate ANY missing non-key column because
    Catalyst legitimately prunes them under cardinality-only plans — so
    a caller passing a genuinely mis-shaped DataFrame would otherwise
    get silently wrong output (all gaps NULL, errors_1h=0) instead of
    an error. Here the FULL pre-pruning schema is visible, so a missing
    column is always a caller bug."""
    missing = [c for c in needed if c not in df.columns]
    if missing:
        raise ValueError(
            f"asof_error_context: {side} DataFrame is missing column(s) "
            f"{missing}; required schema is {list(needed)} (got "
            f"{df.columns}). Build inputs with purchase_error_streams() "
            "or precompute ts_us = unix_micros(ts) JVM-side."
        )


def asof_error_context(purchases: DataFrame, errors: DataFrame) -> DataFrame:
    """Cogroup two per-user event streams and merge them as-of.

    ``purchases`` needs columns (user_id, event_id, ts_us); ``errors``
    needs (user_id, ts_us) — ts_us = unix_micros(ts), precomputed
    JVM-side so the Python worker never touches timestamp objects.
    """
    _require_columns(purchases, ("user_id", "event_id", "ts_us"), "purchases")
    _require_columns(errors, ("user_id", "ts_us"), "errors")
    return (
        purchases.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInPandas(_merge_purchase_errors, schema=ASOF_CONTEXT_SCHEMA)
    )


def asof_error_context_arrow(purchases: DataFrame, errors: DataFrame) -> DataFrame:
    """Arrow-native variant of :func:`asof_error_context` via
    cogroup().applyInArrow — same inputs, same output, one
    serialization layer cheaper (no pandas Block construction per
    group); result equality is pinned in tests/test_cogroup.py and the
    per-round delta is measured in bench.py."""
    _require_columns(purchases, ("user_id", "event_id", "ts_us"), "purchases")
    _require_columns(errors, ("user_id", "ts_us"), "errors")
    return (
        purchases.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInArrow(_merge_purchase_errors_arrow, schema=ASOF_CONTEXT_SCHEMA)
    )

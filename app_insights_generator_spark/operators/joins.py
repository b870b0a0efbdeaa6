"""Temporal join operators Spark lacks natively: as-of join.

Implemented as a composition of built-in DataFrame ops (SURVEY.md §2.2
"custom operators" rule (a)): union the two sides, one window sort per key,
carry the latest right-side values forward with last(ignorenulls). This is
a single shuffle on the join key + one per-partition sort — the same cost
as a sort-merge join, with no Python in the hot path, so it scales to any
number of executors. (A pandas merge_asof inside applyInPandas would pin
each key group in one Python worker's memory instead.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with ``right.right_ts <= left.left_ts`` and equal ``on`` keys
    (backward as-of, exact matches allowed — DuckDB ``ASOF JOIN ... >=``
    semantics). Unmatched left rows keep NULLs (left join).

    ``tolerance``: optional INTERVAL string (e.g. ``'1 hour'``); right rows
    older than ``left_ts - tolerance`` are not matched.
    """
    on = list(on)
    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    out_values = [f"{c}_asof" for c in value_cols]

    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_src"),
        *[F.col(c).alias(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(value_cols, out_values)],
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_values)],
    )
    u = l2.unionByName(r2)

    # Right rows sort before left rows at equal timestamps so exact-ts
    # matches are visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_src"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *on,
        "_ats",
        "_src",
        *left_payload,
        *[F.last(o, ignorenulls=True).over(w).alias(o) for o in out_values],
        F.last(F.when(F.col("_src") == 0, F.col("_ats")), ignorenulls=True)
        .over(w)
        .alias("_match_ts"),
    )
    out = filled.filter(F.col("_src") == 1)
    if tolerance is not None:
        within = F.col("_match_ts") >= F.col("_ats") - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *on,
            "_ats",
            *left_payload,
            *[F.when(within, F.col(o)).alias(o) for o in out_values],
        )
    return out.select(*on, F.col("_ats").alias(left_ts), *left_payload, *out_values)

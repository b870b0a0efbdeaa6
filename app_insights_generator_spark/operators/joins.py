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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    keys: Sequence[str] = (),
    bucket_width: int = 3600,
) -> DataFrame:
    """Interval x interval overlap join: every (a, b) pair (same ``keys``)
    whose [start, end] epoch-second intervals overlap (closed ends:
    a_start <= b_end AND b_start <= a_end).

    A naive theta join is a nested loop — O(|a| x |b|) per key group. This
    plans as a HASH join instead: each interval explodes into the
    fixed-width epoch buckets it touches (sequence + explode, generated
    distributed), the sides equi-join on (keys..., bucket), duplicate
    bucket hits collapse with a distinct on the pair identity, and the
    exact overlap predicate verifies the candidates — the same
    candidate-generate-then-verify shape as the LSH band joins. Candidate
    cost is bounded by intervals-per-bucket, not group size; pick
    ``bucket_width`` near the typical interval length so most intervals
    touch O(1) buckets.

    Inputs must carry epoch-second (integer) start/end columns; all of
    a's and b's columns survive (b's renamed with a ``b_`` prefix on
    collision).
    """
    keys = list(keys)

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bk",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_width).cast("long"),
                    F.floor(F.col(e) / bucket_width).cast("long"),
                )
            ),
        )

    rename = {c: f"b_{c}" for c in b.columns if c in a.columns and c not in keys}
    b2 = b.select(
        [F.col(c).alias(rename.get(c, c)) for c in b.columns]
    )
    bs, be = rename.get(b_start, b_start), rename.get(b_end, b_end)

    # Stable per-row identities BEFORE the bucket explode: dedupe of
    # multi-bucket candidate hits must be on the (a-row, b-row) pair, not
    # on the whole payload — a whole-row distinct would also collapse
    # genuinely duplicate input rows (changing join cardinality vs a true
    # theta join) and requires every payload type to be distinct-comparable.
    aa = bucketed(
        a.withColumn("_aid", F.monotonically_increasing_id()), a_start, a_end
    )
    bb = bucketed(
        b2.withColumn("_bid", F.monotonically_increasing_id()), bs, be
    )
    joined = aa.join(bb, [*keys, "_bk"]).filter(
        (F.col(a_start) <= F.col(be)) & (F.col(bs) <= F.col(a_end))
    )
    # A pair overlapping k shared buckets appears k times: keep one.
    out_cols = [*a.columns, *[rename.get(c, c) for c in b.columns if c not in keys]]
    return joined.dropDuplicates(["_aid", "_bid"]).select(*out_cols)

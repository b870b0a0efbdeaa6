"""MERGE-style upsert (SCD type-1) as a pure DataFrame transform.

The reference has no table maintenance at all (main.py is scan->aggregate->
write); a complete engine needs the MERGE INTO shape users run daily:
apply a change batch to a dimension — update matched rows in place,
insert unmatched source rows, keep untouched target rows — WITHOUT a
transactional table format (the raw-parquet equivalent; Iceberg/Delta do
the same join under their snapshot machinery).

Scale shape: ONE full-outer join on the key. A daily change batch is
normally tiny next to the dimension, so Spark broadcasts it (or AQE
converts to a broadcast join at runtime); the dimension itself never
shuffles in that case. With both sides huge, pre-bucketing both on the
key makes the join exchange-free, same as the bucketed fact joins.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_COL = "_action"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE source INTO target ON keys.

    - matched          -> row updated from source (SCD1 overwrite)
    - source-only keys -> row inserted
    - target-only keys -> row kept unchanged

    Returns all target columns plus ``_action`` in
    {'insert', 'update', 'keep'}. Every non-key source column must exist
    in the target (updates are by column name); source may carry a subset
    of the target's columns — unlisted columns survive updates unchanged.

    Matched-vs-unmatched sides are detected with non-null marker columns
    (not key-null checks), so a legitimately NULL-keyed target row is
    'keep', not 'insert'; and matched rows take the source value
    UNCONDITIONALLY, so an explicit NULL in the change batch overwrites
    the target value — true SCD1 semantics.
    """
    missing = [c for c in source.columns if c not in target.columns]
    if missing:
        raise ValueError(f"source columns absent from target: {missing}")
    t = target.withColumn("_t_present", F.lit(True))
    s = source.select(
        *[F.col(c).alias(f"_s_{c}") for c in source.columns],
        F.lit(True).alias("_s_present"),
    )
    cond = reduce(lambda a, b: a & b, [t[k] == s[f"_s_{k}"] for k in keys])
    j = t.join(s, cond, "full_outer")
    t_miss = t["_t_present"].isNull()
    s_miss = s["_s_present"].isNull()
    action = (
        F.when(t_miss, F.lit("insert"))
        .when(s_miss, F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    out = []
    for c in target.columns:
        if f"_s_{c}" in s.columns:
            # Source side present -> source value wins even when NULL.
            out.append(F.when(s_miss, t[c]).otherwise(s[f"_s_{c}"]).alias(c))
        else:
            out.append(t[c].alias(c))
    return j.select(*out, action.alias(ACTION_COL))

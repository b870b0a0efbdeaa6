"""Cleaning operators: type casting and range filters.

Reference parity: do_column_type_casting (main.py:151-160) and
filter_playstore_df (main.py:206-218). Both are expressed as ONE ``select``
/ one conjunctive ``filter`` so Catalyst sees a single Project / Filter node
(long withColumn chains blow up plan size on wide tables).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def cast_to_int(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Cast ``cols`` to IntegerType in place; other columns untouched.

    ``try_cast``, not ``cast``: the reference ran with legacy cast
    semantics where malformed strings become NULL (main.py:209 relies on
    it for its dirty CSV), but Spark 4 defaults to ANSI mode where ``cast``
    THROWS on the first bad value. try_cast restores cast-failure -> NULL,
    which the range filters and per-set not-null filters then drop.
    """
    cols = set(cols)
    return df.select(
        *[
            F.col(f"`{c}`").try_cast(IntegerType()).alias(c) if c in cols else F.col(f"`{c}`")
            for c in df.columns
        ]
    )


def range_filter(df: DataFrame, ranges: dict[str, tuple[float, float]]) -> DataFrame:
    """Inclusive range predicates, conjunctive, null-rejecting.

    One Filter node; Catalyst pushes it into the scan (check
    ``.explain`` PushedFilters when reading parquet).
    """
    if not ranges:
        return df
    pred = None
    for col, (lo, hi) in ranges.items():
        clause = F.col(f"`{col}`").between(F.lit(lo), F.lit(hi))
        pred = clause if pred is None else (pred & clause)
    return df.filter(pred)

"""Bucketing: floor each numeric column to its bucket's lower bound.

Reference parity: do_bucketing (main.py:163-203), including the worked
example in its docstring (encoded as a unit test in
tests/test_bucketing.py). ``floor(col/size)*size`` keeps exact reference
semantics; the result type is LONG (Spark's floor). Backticks preserve
support for non-identifier column names like ``len screenshots``
(main.py:201).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_expr(col: str, size: int | float):
    """Lower bucket bound of ``col`` for width ``size`` as a Column."""
    return (F.floor(F.col(f"`{col}`") / F.lit(size)) * F.lit(int(size))).alias(col)


def bucketize(df: DataFrame, bucket_sizes: dict[str, int]) -> DataFrame:
    """Replace each numeric column with its bucket lower bound, in place.

    Single Project node — all bucket expressions in one ``select``.
    """
    if not bucket_sizes:
        return df
    return df.select(
        *[
            bucket_expr(c, bucket_sizes[c]) if c in bucket_sizes else F.col(f"`{c}`")
            for c in df.columns
        ]
    )

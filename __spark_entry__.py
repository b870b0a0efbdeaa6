"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``app_insights_generator_spark``; this module only
wires workloads to the contract. Query names map to SURVEY.md §2 operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from app_insights_generator_spark import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the native grouping-sets insight sweep on orders."""
    return Q.QUERIES["insights_sweep_orders"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return dict(Q.ORACLES)


def oracle_tiers() -> dict[str, str]:
    """Deepest scale factor each oracle compare routinely runs at:
    "sf0.1" (default) or "sf0.01" (the oracle — not the operator — is
    intractable above the gate tier, e.g. O(n^2) exact all-pairs truth
    sets). Machine-readable tier annotation, round 9; informational for
    the driver — the gate itself runs at sf0.01 either way."""
    return dict(Q.ORACLE_TIERS)

"""Query registry: named (spark, sf_dir) -> DataFrame callables plus their
DuckDB oracle SQL twins, consumed by ``__spark_entry__.py``.

Every operator in SURVEY.md §2 lands here as a registered query; the oracle
SQL uses the same column aliases as the Spark plan so the driver's
order-insensitive value-hash compare lines up.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` -> driver does a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Import for side effect: each module registers its queries.
from app_insights_generator_spark.queries import (  # noqa: E402,F401
    analytic_queries,
    events_queries,
    insights_queries,
    llm_queries,
    pipeline_queries,
    relational_queries,
    tpch_queries,
    trainprep_queries,
)

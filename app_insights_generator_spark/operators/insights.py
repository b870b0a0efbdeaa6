"""Insight query: group/count/threshold/format for ONE column combination.

Reference parity: get_insights_from_df (main.py:259-315). Semantics kept
exactly:

- pre-agg not-null filter on every grouping column (main.py:288)
- group + count(*) + per-ID display value pick (main.py:289-290) — the
  reference's order-nondeterministic ``F.first`` (main.py:285) is replaced
  by ``F.min`` so results are stable (SURVEY.md §7 risk 2)
- HAVING count >= int(threshold_percent/100 * N) with N the WHOLE filtered
  table's row count, shared across all combinations (main.py:280, 344)
- ID columns dropped after their display values are picked (main.py:292)
- numeric cols rendered ``[lo-(lo+size)]`` (main.py:301-305), every field
  ``name=value`` (main.py:307), all joined by ';' with the bare count last
  (main.py:309-314); NULL display values vanish (concat_ws skips NULLs)
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from app_insights_generator_spark.config import InsightsConfig
from app_insights_generator_spark.operators.bucketing import bucketize
from app_insights_generator_spark.operators.cleaning import cast_to_int, range_filter

INSIGHT_DELIM = ";"


def qcol(name: str) -> Column:
    """Column reference that tolerates non-identifier names (spaces)."""
    return F.col(f"`{name}`")


def prepare(df: DataFrame, cfg: InsightsConfig) -> DataFrame:
    """cast -> range-filter -> bucketize (reference main.py:385-388)."""
    df = cast_to_int(df, cfg.int_cast_cols)
    df = range_filter(df, cfg.range_filters)
    return bucketize(df, cfg.bucket_sizes)


def threshold_count(cfg: InsightsConfig, total_count: int) -> int:
    """int() floors — T=0 on tiny inputs, making the HAVING a no-op
    (reference main.py:280; SURVEY.md §7 risk 3)."""
    return int((cfg.threshold_percent / 100.0) * total_count)


def format_value(col: str, cfg: InsightsConfig, source: Column | None = None) -> Column:
    """Render one field: ``col=[lo-hi]`` for bucketed numerics else
    ``col=value`` (main.py:295-307). NULL value -> NULL field."""
    c = source if source is not None else qcol(col)
    if col in cfg.bucket_sizes:
        size = int(cfg.bucket_sizes[col])
        c = F.concat(F.lit("["), c, F.lit("-"), (c + F.lit(size)).cast("long"), F.lit("]"))
    return F.concat(F.lit(col), F.lit("="), c)


def insight_fields(
    group_cols: Sequence[str], display_cols: Sequence[str], cfg: InsightsConfig
) -> list[Column]:
    """Ordered field expressions: grouping cols (minus IDs), display cols,
    bare count — the reference's post-drop column order (main.py:292-312)."""
    fields = [format_value(c, cfg) for c in group_cols if c not in cfg.id_cols]
    fields += [format_value(c, cfg) for c in display_cols]
    fields.append(qcol("count"))
    return fields


def insight_query(
    df: DataFrame,
    combo: Sequence[str],
    cfg: InsightsConfig,
    total_count: int | None = None,
) -> DataFrame:
    """Insights for one combination of grouping columns -> DataFrame[Insights]."""
    if total_count is None:
        total_count = df.count()
    t = threshold_count(cfg, total_count)

    ids_in_combo = [c for c in combo if c in cfg.id_cols]
    display = [v for c in ids_in_combo for v in cfg.id_to_value[c]]
    aggs = [F.min(qcol(v)).alias(v) for v in display]
    aggs.append(F.count(F.lit(1)).alias("count"))

    not_null = reduce(lambda a, b: a & b, (qcol(c).isNotNull() for c in combo))
    grouped = (
        df.filter(not_null)
        .groupBy(*[qcol(c) for c in combo])
        .agg(*aggs)
        .filter(F.col("count") >= F.lit(t))
    )
    fields = insight_fields(list(combo), display, cfg)
    return grouped.select(F.concat_ws(INSIGHT_DELIM, *fields).alias("Insights"))

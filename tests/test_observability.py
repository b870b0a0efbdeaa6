"""Inline pipeline observability via df.observe (SURVEY.md §3.4: the
reference's observability is wall-clock prints + traceback; the rebuild
exposes data-quality metrics collected DURING the action, not by a second
scan — at 100 TB a separate validation pass doubles the read bill).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from app_insights_generator_spark.sources import load_table


def test_observation_metrics_collected_in_one_pass(spark, sf_dir):
    obs = Observation("ingest")
    li = load_table(spark, sf_dir, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count_if(F.col("l_quantity").isNull()).alias("null_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("gross_price"),
    )
    result = (
        observed.filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    assert len(result) > 0
    metrics = obs.get
    # The observe node sits above the scan, so rows_seen is the FULL input
    # count even though the downstream filter discards rows.
    assert metrics["rows_seen"] == li.count()
    assert metrics["null_qty"] == 0
    assert metrics["gross_price"] > 0

"""Measure the reference's TRUE 14-column / 16,383-set lattice once
(VERDICT r07 item 4): the widest gated sweep is 10 columns / 1,023 sets,
but the reference's actual workload is 14 columns (cols_for_aggregations,
main.py:88-103) swept over every non-empty subset (main.py:345-348).
This runs sweep_apriori on a 14-column lineitem base at the given SF and
prints per-level pruning telemetry + the distinct-tuple bound.

    python tools/lattice14_bench.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from app_insights_generator_spark.config import InsightsConfig  # noqa: E402
from app_insights_generator_spark.operators.bucketing import bucketize  # noqa: E402
from app_insights_generator_spark.operators.sweep import (  # noqa: E402
    _preaggregate,
    sweep_apriori,
)
from app_insights_generator_spark.session import get_spark  # noqa: E402
from app_insights_generator_spark.sources import load_table  # noqa: E402

# The round-7 wide config's 10 columns + 4 more derived from the test
# table's 11 physical columns (it carries no commitdate/receiptdate/
# shipmode): ship month (12 values), ship day-of-week (7), an orderkey
# bucket, and the last cents digit (10) — the reference's 14-column
# workload SHAPE with realistic mixed cardinalities.
BUCKETS = {
    "l_quantity": 10,
    "l_extendedprice": 20_000,
    "l_shipyear": 5,
    "l_discpct": 5,
    "l_taxpct": 4,
    "l_partgrp": 2_000,
    "l_suppgrp": 200,
    "l_ordergrp": 10_000,
}

COLS = (
    "l_returnflag",
    "l_linestatus",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_shipyear",
    "l_discpct",
    "l_taxpct",
    "l_partgrp",
    "l_suppgrp",
    "l_shipmonth",
    "l_shipdow",
    "l_ordergrp",
    "l_centmod",
)

CFG = InsightsConfig(agg_cols=COLS, bucket_sizes=BUCKETS, threshold_percent=2.0)


def base_df(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("l_shipyear", F.year("l_shipdate"))
        .withColumn("l_discpct", F.round(F.col("l_discount") * 100).cast("int"))
        .withColumn("l_taxpct", F.round(F.col("l_tax") * 100).cast("int"))
        .withColumn("l_partgrp", F.col("l_partkey"))
        .withColumn("l_suppgrp", F.col("l_suppkey"))
        .withColumn("l_shipmonth", F.month("l_shipdate"))
        .withColumn("l_shipdow", F.dayofweek("l_shipdate"))
        .withColumn("l_ordergrp", F.col("l_orderkey"))
        .withColumn(
            "l_centmod",
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) % 10"),
        )
    )
    return bucketize(df, CFG.bucket_sizes)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="lattice14")
    df = base_df(spark, args.sf)
    n_rows = df.count()
    n_tuples = _preaggregate(df, list(COLS), []).count()

    stats: list[dict] = []
    t0 = time.time()
    out = sweep_apriori(base_df(spark, args.sf), CFG, level_stats=stats)
    n_out = out.count()
    wall = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "n_cols": len(COLS),
                "n_sets_full": 2 ** len(COLS) - 1,
                "n_rows": n_rows,
                "n_distinct_tuples": n_tuples,
                "wall_sec": wall,
                "output_rows": n_out,
                "sets_evaluated_total": sum(s["sets_evaluated"] for s in stats),
                "levels": stats,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()

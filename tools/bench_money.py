"""One-off: benchmark DECIMAL vs integer-cents money aggregation (q1 shape)
at sf0.1 and verify the variants are value-identical. Round-4 verdict item 5:
q1 regressed +131% when money sums moved to Decimal128 (interpreted agg);
integer cents sums ride the codegen'd long fast path.

Run:  python tools/bench_money.py [--sf /root/testdata/sf0.1] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from app_insights_generator_spark.queries import _exact as _x
from app_insights_generator_spark.session import get_spark
from app_insights_generator_spark.sources.readers import load_table


def q1_base(li):
    return li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    ).groupBy("l_returnflag", "l_linestatus")


def variant_decimal(li):
    cnt = F.count(F.lit(1))
    return q1_base(li).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        _x.money_sum(_x.money("l_extendedprice")).alias("sum_base_price"),
        _x.money_sum(_x.disc_price()).alias("sum_disc_price"),
        _x.money_sum(_x.charge()).alias("sum_charge"),
        F.round(F.avg("l_quantity") + 1e-9, 2).alias("avg_qty"),
        F.round(F.sum(_x.money("l_extendedprice")).cast("double") / cnt + 1e-9, 2).alias("avg_price"),
        F.round(F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double") / cnt + 1e-9, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def _cents(col):
    return F.round(F.col(col) * 100, 0).cast("bigint")


def variant_cents(li):
    cnt = F.count(F.lit(1))
    li = (
        li.withColumn("_p100", _cents("l_extendedprice"))
        .withColumn("_d100", _cents("l_discount"))
        .withColumn("_t100", _cents("l_tax"))
    )
    units4 = F.col("_p100") * (F.lit(100) - F.col("_d100"))
    units6 = units4 * (F.lit(100) + F.col("_t100"))
    return q1_base(li).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (F.sum("_p100") / F.lit(100.0)).alias("sum_base_price"),
        (F.expr("(sum(_p100 * (100 - _d100)) + 50) DIV 100") / F.lit(100.0)).alias("sum_disc_price"),
        (F.expr("(sum(_p100 * (100 - _d100) * (100 + _t100)) + 5000) DIV 10000") / F.lit(100.0)).alias("sum_charge"),
        F.round(F.avg("l_quantity") + 1e-9, 2).alias("avg_qty"),
        F.round((F.sum("_p100") / F.lit(100.0)) / cnt + 1e-9, 2).alias("avg_price"),
        F.round((F.sum("_d100") / F.lit(100.0)) / cnt + 1e-9, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def variant_cents_split(li):
    """Overflow-safe cents: product sums split per row into whole-dollar
    and sub-dollar integer parts, recombined after aggregation — every
    partial stays < 2^63 even at 6e11 rows in one group."""
    cnt = F.count(F.lit(1))
    li = (
        li.withColumn("_p100", _cents("l_extendedprice"))
        .withColumn("_d100", _cents("l_discount"))
        .withColumn("_t100", _cents("l_tax"))
        .withColumn("_u4", F.expr("_p100 * (100 - _d100)"))
        .withColumn("_u6", F.expr("_p100 * (100 - _d100) * (100 + _t100)"))
    )
    disc_cents = (
        F.expr("sum(_u4 DIV 10000) * 100 + (sum(_u4 % 10000) + 50) DIV 100")
    )
    charge_cents = (
        F.expr("sum(_u6 DIV 1000000) * 100 + (sum(_u6 % 1000000) + 5000) DIV 10000")
    )
    return q1_base(li).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (F.sum("_p100") / F.lit(100.0)).alias("sum_base_price"),
        (disc_cents / F.lit(100.0)).alias("sum_disc_price"),
        (charge_cents / F.lit(100.0)).alias("sum_charge"),
        F.round(F.avg("l_quantity") + 1e-9, 2).alias("avg_qty"),
        F.round((F.sum("_p100") / F.lit(100.0)) / cnt + 1e-9, 2).alias("avg_price"),
        F.round((F.sum("_d100") / F.lit(100.0)) / cnt + 1e-9, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def variant_hybrid(li):
    """Plain money sums in cents (overflow-safe at any scale); the
    4/6-decimal product sums stay DECIMAL (their integer-unit sums get
    within ~2x of int64 range at 100 TB in low-cardinality groups)."""
    cnt = F.count(F.lit(1))
    li = li.withColumn("_p100", _cents("l_extendedprice")).withColumn(
        "_d100", _cents("l_discount")
    )
    return q1_base(li).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (F.sum("_p100") / F.lit(100.0)).alias("sum_base_price"),
        _x.money_sum(_x.disc_price()).alias("sum_disc_price"),
        _x.money_sum(_x.charge()).alias("sum_charge"),
        F.round(F.avg("l_quantity") + 1e-9, 2).alias("avg_qty"),
        F.round((F.sum("_p100") / F.lit(100.0)) / cnt + 1e-9, 2).alias("avg_price"),
        F.round((F.sum("_d100") / F.lit(100.0)) / cnt + 1e-9, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark()
    li = load_table(spark, args.sf, "lineitem")
    variants = {
        "decimal": variant_decimal,
        "cents": variant_cents,
        "cents_split": variant_cents_split,
        "hybrid": variant_hybrid,
    }

    key = lambda r: (r["l_returnflag"], r["l_linestatus"])
    baseline = {key(r): tuple(r) for r in variant_decimal(li).collect()}
    for name, fn in variants.items():
        got = {key(r): tuple(r) for r in fn(li).collect()}
        same = got == baseline
        print(f"values[{name}] identical to decimal: {same}")
        if not same:
            for k in baseline:
                if got[k] != baseline[k]:
                    print("  ", k, "\n   dec", baseline[k], "\n   got", got[k])
            raise SystemExit(1)

    for name, fn in variants.items():
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            fn(li).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(f"{name}: median {statistics.median(times):.3f}s  all {[round(t,3) for t in times]}")


if __name__ == "__main__":
    main()

"""Salted aggregation / salted join (operators/skew.py): results must be
identical to the unsalted plans, and the salt must actually spread rows."""

import pytest
from pyspark.sql import functions as F

from app_insights_generator_spark.operators.skew import salted_groupby, salted_join
from app_insights_generator_spark.sources import load_table


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").cache()


def test_salted_groupby_equals_plain(li):
    plain = {
        r["l_returnflag"]: (round(r["s"], 4), r["c"], round(r["a"], 6))
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("l_tax").alias("c"), F.avg("l_discount").alias("a"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["s"], 4), r["c"], round(r["a"], 6))
        for r in salted_groupby(
            li,
            ["l_returnflag"],
            {"s": ("sum", "l_quantity"), "c": ("count", "l_tax"), "a": ("avg", "l_discount")},
            salt_n=7,
        ).collect()
    }
    assert plain == salted


def test_salt_actually_spreads(li):
    from app_insights_generator_spark.operators.skew import _salt_col

    n = li.select(_salt_col(li, 16).alias("s")).distinct().count()
    assert n == 16


def test_salted_join_equals_plain(spark, sf_dir, li):
    s = load_table(spark, sf_dir, "supplier")
    plain = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["s_suppkey"])
        for r in li.join(s, li.l_suppkey == s.s_suppkey).collect()
    )
    salted = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["s_suppkey"])
        for r in salted_join(li, s, F.col("l_suppkey") == F.col("s_suppkey"), salt_n=5).collect()
    )
    assert plain == salted


def test_salted_join_rejects_outer(spark, sf_dir, li):
    s = load_table(spark, sf_dir, "supplier")
    with pytest.raises(ValueError):
        salted_join(li, s, F.col("l_suppkey") == F.col("s_suppkey"), how="full")


def test_salted_groupby_rejects_unknown_agg(li):
    with pytest.raises(ValueError):
        salted_groupby(li, ["l_returnflag"], {"x": ("median", "l_tax")})

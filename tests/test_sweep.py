"""Sweep equivalence: faithful loop mode == native grouping-sets mode
(SURVEY.md §7 M3), on real driver testdata (orders @ sf0.001), across
cube / batched-grouping-sets / pre-aggregated variants."""

from collections import Counter

import pytest

from app_insights_generator_spark.config import InsightsConfig
from app_insights_generator_spark.operators.insights import prepare
from app_insights_generator_spark.operators.sweep import (
    all_combinations,
    sweep_grouping_sets,
    sweep_loop_df,
)
from app_insights_generator_spark.sources import load_table

ORDERS_CFG = InsightsConfig(
    agg_cols=("o_orderstatus", "o_orderpriority", "o_totalprice"),
    bucket_sizes={"o_totalprice": 100_000},
    threshold_percent=2.0,
)


def _insights_multiset(df):
    return Counter(r.Insights for r in df.collect())


@pytest.fixture(scope="module")
def orders_prepared(spark, sf_dir):
    df = prepare(load_table(spark, sf_dir, "orders"), ORDERS_CFG).cache()
    df.count()
    yield df
    df.unpersist()


def test_combination_enumeration():
    combos = list(all_combinations(ORDERS_CFG))
    assert len(combos) == 2**3 - 1
    assert combos[0] == ("o_orderstatus",)
    assert combos[-1] == ("o_orderstatus", "o_orderpriority", "o_totalprice")


def test_loop_vs_cube(spark, orders_prepared):
    loop = _insights_multiset(sweep_loop_df(orders_prepared, ORDERS_CFG))
    cube = _insights_multiset(sweep_grouping_sets(orders_prepared, ORDERS_CFG))
    assert loop == cube
    assert sum(loop.values()) > 0


def test_cube_preagg_matches_no_preagg(spark, orders_prepared):
    with_pre = _insights_multiset(
        sweep_grouping_sets(orders_prepared, ORDERS_CFG, preaggregate=True)
    )
    without = _insights_multiset(
        sweep_grouping_sets(orders_prepared, ORDERS_CFG, preaggregate=False)
    )
    assert with_pre == without


def test_batched_grouping_sets_matches_cube(spark, orders_prepared):
    cube = _insights_multiset(sweep_grouping_sets(orders_prepared, ORDERS_CFG))
    batched = _insights_multiset(
        sweep_grouping_sets(orders_prepared, ORDERS_CFG, expand_batch_size=3)
    )
    assert cube == batched


def test_max_combo_size(spark, orders_prepared):
    cfg = InsightsConfig(
        agg_cols=ORDERS_CFG.agg_cols,
        bucket_sizes=ORDERS_CFG.bucket_sizes,
        threshold_percent=2.0,
        max_combo_size=1,
    )
    loop = _insights_multiset(sweep_loop_df(orders_prepared, cfg))
    native = _insights_multiset(sweep_grouping_sets(orders_prepared, cfg))
    assert loop == native
    # only 3 single-column sets -> every string has exactly one field + count
    assert all(s.count(";") == 1 for s in loop)


def test_id_columns_in_sweep(spark, sf_dir):
    # ID->display resolution inside the sweep: o_orderstatus as a fake ID
    # column whose "display" is itself duplicated via a projection.
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "orders").withColumn(
        "status_name", F.concat(F.lit("S_"), F.col("o_orderstatus"))
    )
    cfg = InsightsConfig(
        agg_cols=("o_orderstatus", "o_orderpriority"),
        id_to_value={"o_orderstatus": ("status_name",)},
        threshold_percent=2.0,
    )
    loop = _insights_multiset(sweep_loop_df(df, cfg))
    native = _insights_multiset(sweep_grouping_sets(df, cfg))
    assert loop == native
    assert any(s.startswith("status_name=S_") for s in loop)


def test_apriori_matches_cube(spark, orders_prepared):
    from app_insights_generator_spark.operators.sweep import sweep_apriori

    native = _insights_multiset(sweep_grouping_sets(orders_prepared, ORDERS_CFG))
    apriori = _insights_multiset(sweep_apriori(orders_prepared, ORDERS_CFG))
    assert native == apriori


def test_apriori_prunes_with_biting_threshold(spark, orders_prepared):
    # A threshold high enough that multi-column sets die early: output still
    # matches the exhaustive mode exactly (anti-monotone support property).
    from app_insights_generator_spark.operators.sweep import sweep_apriori

    cfg = InsightsConfig(
        agg_cols=ORDERS_CFG.agg_cols,
        bucket_sizes=ORDERS_CFG.bucket_sizes,
        threshold_percent=30.0,
    )
    native = _insights_multiset(sweep_grouping_sets(orders_prepared, cfg))
    apriori = _insights_multiset(sweep_apriori(orders_prepared, cfg))
    assert native == apriori


def test_reliable_checkpoint_dir_matches_default(spark, orders_prepared, ckpt_root):
    # checkpoint_dir switches the result pin from executor-local
    # localCheckpoint to a reliable-storage checkpoint (the cluster
    # deployment mode); output must be identical either way. Both sweeps
    # use small chunk sizes so the pin path actually executes.
    from app_insights_generator_spark.operators.sweep import sweep_apriori

    default = _insights_multiset(
        sweep_grouping_sets(orders_prepared, ORDERS_CFG, expand_batch_size=3)
    )
    reliable = _insights_multiset(
        sweep_grouping_sets(
            orders_prepared,
            ORDERS_CFG,
            expand_batch_size=3,
            checkpoint_dir=ckpt_root,
        )
    )
    assert default == reliable
    apriori_reliable = _insights_multiset(
        sweep_apriori(
            orders_prepared, ORDERS_CFG, checkpoint_dir=ckpt_root
        )
    )
    assert default == apriori_reliable

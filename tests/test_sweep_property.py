"""Property-based sweep equivalence (SURVEY.md §5 strategy): on arbitrary
small tables — random values, nulls, ID columns with display values, varying
thresholds — all three sweep modes (faithful loop, native grouping sets,
Apriori level-wise) must produce identical Insights multisets.

hypothesis generates the corner cases hand-written fixtures miss: all-null
columns, single-row tables, thresholds that kill everything, duplicate rows
that merge in the pre-aggregation.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from app_insights_generator_spark.config import InsightsConfig
from app_insights_generator_spark.operators.sweep import (
    sweep_apriori,
    sweep_grouping_sets,
    sweep_loop_df,
)

CFG = InsightsConfig(
    agg_cols=("g", "num", "idc"),
    bucket_sizes={"num": 10},
    id_to_value={"idc": ("disp",)},
    threshold_percent=20.0,
)

row = st.tuples(
    st.one_of(st.none(), st.sampled_from(["a", "b"])),          # g
    st.one_of(st.none(), st.integers(min_value=-15, max_value=25)),  # num
    st.one_of(st.none(), st.sampled_from(["x", "y"])),          # idc
    st.one_of(st.none(), st.sampled_from(["dx", "dy"])),        # disp
)


@given(rows=st.lists(row, min_size=1, max_size=30))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sweep_modes_equivalent(spark, rows):
    df = spark.createDataFrame(
        rows, "g string, num int, idc string, disp string"
    ).cache()
    try:
        total = df.count()
        outs = [
            Counter(r.Insights for r in mode(df, CFG, total_count=total).collect())
            for mode in (sweep_loop_df, sweep_grouping_sets, sweep_apriori)
        ]
        assert outs[0] == outs[1] == outs[2]
    finally:
        df.unpersist()

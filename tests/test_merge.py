"""merge_upsert (operators/merge.py): MERGE INTO semantics on constructed
frames — matched rows update, source-only keys insert, target-only keys
keep, and source columns may be a subset of the target's."""

import pytest
from pyspark.sql import functions as F

from app_insights_generator_spark.operators.merge import merge_upsert


def test_merge_actions_and_values(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "name", "bal"],
    )
    source = spark.createDataFrame(
        [(2, 99.0), (4, 40.0)],  # update id=2, insert id=4; no `name` column
        ["id", "bal"],
    )
    out = {
        r.id: (r.name, r.bal, r._action)
        for r in merge_upsert(target, source, keys=["id"]).collect()
    }
    assert out == {
        1: ("a", 10.0, "keep"),
        2: ("b", 99.0, "update"),  # bal overwritten, name preserved
        3: ("c", 30.0, "keep"),
        4: (None, 40.0, "insert"),  # unlisted column NULL on insert
    }


def test_merge_rejects_unknown_source_columns(spark):
    target = spark.createDataFrame([(1, 1.0)], ["id", "bal"])
    source = spark.createDataFrame([(1, 1.0)], ["id", "nope"])
    with pytest.raises(ValueError, match="nope"):
        merge_upsert(target, source, keys=["id"])


def test_merge_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], ["id", "k2", "v"]
    )
    source = spark.createDataFrame(
        [(1, "y", 9.0), (2, "x", 5.0)], ["id", "k2", "v"]
    )
    out = {
        (r.id, r.k2): (r.v, r._action)
        for r in merge_upsert(target, source, keys=["id", "k2"]).collect()
    }
    assert out == {
        (1, "x"): (1.0, "keep"),
        (1, "y"): (9.0, "update"),
        (2, "x"): (5.0, "insert"),
    }


def test_merge_null_value_overwrites(spark):
    """An explicit NULL in the change batch must overwrite the target
    value (SCD1 overwrite), not be coalesced away."""
    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, bal double")
    source = spark.createDataFrame([(1, None)], "id int, bal double")
    out = {
        r.id: (r.bal, r._action)
        for r in merge_upsert(target, source, keys=["id"]).collect()
    }
    assert out == {1: (None, "update"), 2: (20.0, "keep")}


def test_merge_null_keyed_target_row_kept(spark):
    """A legitimately NULL-keyed target row never matches any source key
    (SQL join semantics) and must come through as 'keep', not 'insert'."""
    target = spark.createDataFrame([(None, 7.0), (1, 1.0)], "id int, bal double")
    source = spark.createDataFrame([(1, 9.0), (None, 5.0)], "id int, bal double")
    rows = merge_upsert(target, source, keys=["id"]).collect()
    # NULL source key matches nothing either -> insert of a NULL-keyed row.
    assert sorted(
        [(r.id, r.bal, r._action) for r in rows],
        key=lambda x: (x[0] is not None, x[0] or 0, x[1]),
    ) == [
        (None, 5.0, "insert"),
        (None, 7.0, "keep"),
        (1, 9.0, "update"),
    ]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    t_keys=st.lists(st.integers(0, 12), min_size=0, max_size=8, unique=True),
    s_keys=st.lists(st.integers(0, 12), min_size=0, max_size=8, unique=True),
    seed=st.integers(0, 1000),
)
def test_merge_matches_dict_oracle_property(spark, t_keys, s_keys, seed):
    """Property: merge_upsert equals the trivial dict-merge oracle for any
    overlap pattern of target/source key sets (including empty sides)."""
    import random

    rng = random.Random(seed)
    target_rows = [(k, rng.randrange(100)) for k in t_keys]
    source_rows = [(k, 100 + rng.randrange(100)) for k in s_keys]
    expect = {}
    for k, v in target_rows:
        expect[k] = (v, "keep")
    for k, v in source_rows:
        expect[k] = (v, "update" if any(tk == k for tk, _ in target_rows) else "insert")

    target = spark.createDataFrame(target_rows, "id int, v int") if target_rows else \
        spark.createDataFrame([], "id int, v int")
    source = spark.createDataFrame(source_rows, "id int, v int") if source_rows else \
        spark.createDataFrame([], "id int, v int")
    got = {
        r.id: (r.v, r._action)
        for r in merge_upsert(target, source, keys=["id"]).collect()
    }
    assert got == expect

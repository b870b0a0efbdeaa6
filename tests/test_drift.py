"""schema_drift (operators/drift.py): column classification and integer
profile metrics against hand-computed values."""

from __future__ import annotations

from pyspark.sql import functions as F

from app_insights_generator_spark.operators.drift import schema_drift


def test_statuses_and_metrics(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", None), (3, None, 3.0), (4, "y", 4.0)],
        "id bigint, name string, score double",
    )
    new = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, None)],
        "id bigint, name int, extra string",
    )
    got = {r.col: r for r in schema_drift(old, new).collect()}
    assert set(got) == {"id", "name", "score", "extra"}
    assert got["id"].status == "kept"
    assert got["name"].status == "type_changed"
    assert got["score"].status == "removed"
    assert got["extra"].status == "added"
    # null basis points: floor(nulls*10000/n)
    assert got["name"].null_bp_old == 1 * 10000 // 4 == 2500
    assert got["name"].null_bp_new == 0
    assert got["extra"].null_bp_old is None
    assert got["extra"].null_bp_new == 1 * 10000 // 3
    assert got["score"].null_bp_new is None
    # exact distinct counts ignore nulls
    assert got["name"].ndv_old == 2 and got["name"].ndv_new == 3
    assert got["score"].ndv_old == 3 and got["score"].ndv_new is None


def test_identical_frames_all_kept_zero_drift(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rows = schema_drift(df, df).collect()
    assert all(r.status == "kept" for r in rows)
    assert all(r.null_bp_old == r.null_bp_new for r in rows)
    assert all(r.ndv_old == r.ndv_new for r in rows)


def test_approx_ndv_mode_runs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rows = schema_drift(df, df, exact_ndv=False).collect()
    assert all(r.ndv_old is not None for r in rows)

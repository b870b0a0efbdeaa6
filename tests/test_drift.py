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


def test_psi_terms_match_naive(spark, sf_dir):
    """Per-bin PSI terms must reproduce the textbook PSI computed
    driver-side from the same counts, and shares must be exact ppm."""
    import math

    from app_insights_generator_spark.queries.relational_queries import (
        psi_drift_orders_price,
    )

    rows = psi_drift_orders_price(spark, sf_dir).collect()
    na = sum(r.ca for r in rows)
    nb = sum(r.cb for r in rows)
    for r in rows:
        expect = (r.ca / na - r.cb / nb) * math.log(
            (max(r.ca, 1) * nb) / (max(r.cb, 1) * na)
        )
        assert abs(r.psi_term - expect) < 1e-12
        assert r.share_a_ppm == r.ca * 1_000_000 // na
        assert r.share_b_ppm == r.cb * 1_000_000 // nb
        assert r.psi_term >= 0 or (r.ca == 0 or r.cb == 0)
    assert {r.bin for r in rows} <= set(range(10))


def test_benford_audit_shape(spark, sf_dir):
    from app_insights_generator_spark.queries.relational_queries import (
        _BENFORD_PPM,
        benford_first_digit_orders,
    )

    assert sum(_BENFORD_PPM) == 1_000_000
    rows = benford_first_digit_orders(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    for r in rows:
        assert r.deviation_ppm == r.observed_ppm - r.expected_ppm
        assert r.expected_ppm == _BENFORD_PPM[r.digit - 1]

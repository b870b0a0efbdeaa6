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


def test_psi_moments_reconstruct_textbook_psi(spark, sf_dir):
    """The gated output carries exact integer moments only (no ln() in
    the hash — ADVICE r07: a JVM-vs-libm last-ulp difference could flip
    a raw-double gate). The reader-side reconstruction must yield the
    textbook PSI: every term finite, non-negative except empty-bin
    clamps, and shares exact ppm; the emitted na/nb must equal the
    column sums."""
    import math

    from app_insights_generator_spark.queries.relational_queries import (
        psi_drift_orders_price,
    )

    rows = psi_drift_orders_price(spark, sf_dir).collect()
    na = sum(r.ca for r in rows)
    nb = sum(r.cb for r in rows)
    psi = 0.0
    for r in rows:
        assert (r.na, r.nb) == (na, nb)
        term = (r.ca / na - r.cb / nb) * math.log(
            (max(r.ca, 1) * nb) / (max(r.cb, 1) * na)
        )
        assert math.isfinite(term)
        assert term >= 0 or (r.ca == 0 or r.cb == 0)
        psi += term
        assert r.share_a_ppm == r.ca * 1_000_000 // na
        assert r.share_b_ppm == r.cb * 1_000_000 // nb
    assert psi >= 0
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


def test_mannwhitney_matches_naive(spark, sf_dir):
    """Doubled-rank U must equal the textbook tie-corrected U recomputed
    driver-side, and u2_a + u2_b == 2*na*nb must hold exactly."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.queries.relational_queries import (
        mannwhitney_drift_orders_price,
    )
    from app_insights_generator_spark.sources import load_table

    r = mannwhitney_drift_orders_price(spark, sf_dir).first()
    assert r.u2_a + r.u2_b == 2 * r.na * r.nb
    rows = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
            (F.col("o_orderkey") % 2 == 0).alias("is_a"),
        )
        .collect()
    )
    vals = sorted((x.cents, x.is_a) for x in rows)
    # tie-averaged ranks, doubled
    r2 = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][0] == vals[i][0]:
            j += 1
        r2[vals[i][0]] = 2 * i + (j - i) + 1  # 2*f_below + cv + 1
        i = j
    na = sum(1 for _, a in vals if a)
    r2a = sum(r2[v] for v, a in vals if a)
    assert r.u2_a == r2a - na * (na + 1)
    assert r.auc_ppm == (r2a - na * (na + 1)) * 500000 // (na * (len(vals) - na))


def test_spearman_matches_naive(spark, sf_dir):
    """Rho must equal Pearson over tie-averaged ranks recomputed
    driver-side; perfect monotone data gives rho = 1."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.queries.relational_queries import (
        spearman_qty_price_lineitem,
    )
    from app_insights_generator_spark.sources import load_table

    got = spearman_qty_price_lineitem(spark, sf_dir).first()
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("x"),
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("y"),
        )
        .collect()
    )

    def dranks(vals):
        s = sorted(vals)
        out, i = {}, 0
        while i < len(s):
            j = i
            while j < len(s) and s[j] == s[i]:
                j += 1
            out[s[i]] = 2 * i + (j - i) + 1
            i = j
        return out

    xs = [r.x for r in rows]
    ys = [r.y for r in rows]
    rx, ry = dranks(xs), dranks(ys)
    n = len(rows)
    dx = [rx[v] - (n + 1) for v in xs]
    dy = [ry[v] - (n + 1) for v in ys]
    sxy = sum(a * b for a, b in zip(dx, dy))
    sxx = sum(a * a for a in dx)
    syy = sum(b * b for b in dy)
    assert (got.n, got.sxy, got.sxx, got.syy) == (n, sxy, sxx, syy)
    import math

    assert abs(got.spearman_rho - sxy / math.sqrt(sxx * syy)) < 1e-12


def test_jsd_terms_reconstruct_bounded_divergence(spark, sf_dir):
    """Reader-side reconstruction: JSD = (sum p_terms + q_terms)/2e12 must
    be within the 1/1024 quantization error of the float JSD from the
    same counts, and inside [0, ln 2]."""
    import math

    from app_insights_generator_spark.queries.relational_queries import (
        jsd_drift_orders_price,
    )

    rows = jsd_drift_orders_price(spark, sf_dir).collect()
    na = sum(r.ca for r in rows)
    nb = sum(r.cb for r in rows)
    got = (sum(r.p_term_ppm2 for r in rows) + sum(r.q_term_ppm2 for r in rows)) / 2e12
    truth = 0.0
    for r in rows:
        p, q = r.ca / na, r.cb / nb
        m = (p + q) / 2
        if p > 0:
            truth += 0.5 * p * math.log(p / m)
        if q > 0:
            truth += 0.5 * q * math.log(q / m)
    assert 0 <= got <= math.log(2) + 1e-9, got
    assert abs(got - truth) < 2e-3, (got, truth)

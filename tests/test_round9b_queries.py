"""Invariant tests for the round-9 second-batch additions (Mann-Kendall,
Hamilton apportionment, Adamic-Adar, DSIR, Markov accuracy eval,
Kruskal-Wallis, Holt trend, KMV sketch). The cross-engine value gate is
check_oracle/the driver; these pin the MATHEMATICAL invariants that a
hash compare alone can't name when it fails.
"""

from __future__ import annotations

import duckdb

from app_insights_generator_spark.queries import QUERIES


def test_apportionment_sums_to_budget_exactly(spark, sf_dir):
    rows = QUERIES["apportion_largest_remainder_documents"](
        spark, sf_dir
    ).collect()
    assert sum(r.alloc for r in rows) == 1000  # the Hamilton contract
    for r in rows:
        assert r.alloc - r.floor_quota in (0, 1), r
        assert 0 <= r.remainder, r


def test_mann_kendall_bounds(spark, sf_dir):
    r = QUERIES["mann_kendall_daily_revenue_orders"](spark, sf_dir).collect()[0]
    assert r.var18 > 0
    assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2
    # z sign agrees with S sign
    assert (r.z_mk > 0) == (r.s_stat > 0) or r.s_stat == 0


def test_adamic_adar_pairs_are_nonadjacent_and_positive(spark, sf_dir):
    rows = QUERIES["adamic_adar_nation_trade"](spark, sf_dir).collect()
    assert rows, "heavy-trade graph produced no non-adjacent candidate pairs"
    for r in rows:
        assert r.node_a < r.node_b
        assert r.n_common >= 1
        assert r.aa_ppm > 0


def test_markov_accuracy_in_range(spark, sf_dir):
    rows = QUERIES["markov_next_event_accuracy_events"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test
        assert 0 <= r.acc_bp <= 10000


def test_kruskal_wallis_h_nonnegative_and_shared(spark, sf_dir):
    rows = QUERIES["kruskal_wallis_orders_priority"](spark, sf_dir).collect()
    assert len(rows) == 5  # the five order priorities
    assert len({(r.h_micro, r.h_corr_micro, r.n_total) for r in rows}) == 1
    r = rows[0]
    # H is chi-square-like: nonnegative up to the documented < 12-micro
    # quantization slack; tie correction (divide by 1-c) grows |H|.
    assert r.h_micro >= -12
    assert abs(r.h_corr_micro) >= abs(r.h_micro)
    assert sum(x.n_i for x in rows) == r.n_total


def test_kmv_estimate_brackets_exact_ndv(spark, sf_dir):
    rows = QUERIES["kmv_vocab_ndv_sources"](spark, sf_dir).collect()
    by_src = {r.source: r for r in rows}
    assert "__union__" in by_src
    uni = by_src.pop("__union__")
    # union exact NDV is at most the sum and at least the max of sources
    assert uni.exact_ndv <= sum(r.exact_ndv for r in by_src.values())
    assert uni.exact_ndv >= max(r.exact_ndv for r in by_src.values())
    for r in list(by_src.values()) + [uni]:
        if r.exact_ndv >= 64:
            # k=64 bottom-k: 1-sigma relative error ~ 1/sqrt(62) ~ 12.7%;
            # factor-2 brackets are ~8 sigma, deterministic on this corpus.
            assert r.exact_ndv / 2 <= r.kmv_est <= r.exact_ndv * 2, r
        else:
            assert r.kmv_est == r.exact_ndv, r


def test_dsir_top50_enriched_for_target_lang(spark, sf_dir):
    """The importance selection must actually tilt toward the target
    (lang='en') distribution: the en share of the top-50 must beat the
    corpus base rate (computed from the same table, so the assertion
    holds at every SF's mix)."""
    rows = QUERIES["dsir_importance_documents"](spark, sf_dir).collect()
    assert len(rows) == 50
    en = sum(1 for r in rows if r.lang == "en")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter("lang = 'en'").count() / docs.count()
    assert en / 50 > base, f"top-50 en share {en}/50 not above base {base:.2f}"
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, 51)
    )


def test_holt_trunc_div_matches_duckdb_on_negative_trend():
    """The cross-engine trap this operator exists to document: Python //
    FLOORS while Spark DIV and DuckDB // TRUNCATE toward zero. Replay
    the Holt recursion on a DECREASING synthetic series (trend stays
    negative, so the division sign case is exercised every step) with
    the grouped-map core's trunc-div and compare state-by-state against
    DuckDB's recursive CTE."""

    def tdiv(a: int, d: int) -> int:
        q = abs(a) // d
        return q if a >= 0 else -q

    y = [1000, 900, 790, 700, 580, 500, 410, 300, 220, 100]
    lev, tr = y[0], y[1] - y[0]
    py_states = []
    for t in range(1, len(y)):
        lev_new = tdiv(2 * y[t] + 8 * (lev + tr), 10)
        tr = tdiv((lev_new - lev) + 9 * tr, 10)
        lev = lev_new
        py_states.append((t + 1, lev, tr))

    vals = ", ".join(f"({i + 1}, {v})" for i, v in enumerate(y))
    sql = f"""
    WITH RECURSIVE d(rn, rev) AS (VALUES {vals}),
    rec AS (
      SELECT CAST(1 AS BIGINT) AS rn, d1.rev AS l,
             CAST(d2.rev - d1.rev AS BIGINT) AS b
      FROM d d1 JOIN d d2 ON d1.rn = 1 AND d2.rn = 2
      UNION ALL
      SELECT CAST(n.rn AS BIGINT),
             (2 * n.rev + 8 * (r.l + r.b)) // 10,
             (((2 * n.rev + 8 * (r.l + r.b)) // 10) - r.l + 9 * r.b) // 10
      FROM rec r JOIN d n ON n.rn = r.rn + 1
    )
    SELECT rn, l, b FROM rec WHERE rn > 1 ORDER BY rn
    """
    duck_states = [tuple(map(int, r)) for r in duckdb.sql(sql).fetchall()]
    assert duck_states == py_states
    assert any(tr < 0 for _, _, tr in py_states), "test series never went negative"


def test_wasserstein_nonnegative_and_bounded(spark, sf_dir):
    r = QUERIES["wasserstein_drift_orders_price"](spark, sf_dir).collect()[0]
    assert r.w1_scaled >= 0
    assert r.w1_cents >= 0
    # W1 can't exceed the price range of the pooled sample
    assert r.w1_cents == r.w1_scaled / (r.na * r.nb)


def test_simpson_diversity_in_range(spark, sf_dir):
    rows = QUERIES["simpson_diversity_sources"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.simpson_bp <= 10000
        # D = 0 iff one language dominates completely
        if r.n_langs == 1 and r.n_docs >= 2:
            assert r.simpson_bp == 0


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["vocab_coverage_curve_documents"](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [64, 256, 1024, 4096, 16384]
    for a, b in zip(rows, rows[1:]):
        assert a.coverage_bp <= b.coverage_bp
        assert a.types_used <= b.types_used
    for r in rows:
        assert r.types_used == min(r.k, rows[-1].types_used)
        if r.types_used == rows[-1].types_used and r.k >= rows[-1].types_used:
            assert r.coverage_bp == 10000


def test_quantile_normalize_preserves_count_and_bounds(spark, sf_dir):
    rows = QUERIES["quantile_normalize_doclen_sources"](spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    lo, hi = docs.selectExpr("min(n_chars)", "max(n_chars)").collect()[0]
    for r in rows:
        # normalized values live inside the pooled value range
        assert r.n_docs * lo <= r.sum_after <= r.n_docs * hi, r
        assert r.max_abs_shift >= 0


def test_fano_positive_and_consistent(spark, sf_dir):
    rows = QUERIES["fano_burstiness_event_types"](spark, sf_dir).collect()
    assert rows
    n_days = {r.n_days for r in rows}
    assert len(n_days) == 1  # shared observed-day grid
    for r in rows:
        assert r.sum_c > 0 and r.sum_c2 >= r.sum_c
        assert r.fano == (r.n_days * r.sum_c2 - r.sum_c**2) / (
            r.n_days * r.sum_c
        )
        assert r.fano >= 0


def test_ab_srm_split_is_deterministic_and_balanced(spark, sf_dir):
    rows = QUERIES["ab_srm_audit_events"](spark, sf_dir).collect()
    by_type = {r.event_type: r for r in rows}
    u = by_type["__users__"]
    assert u.n_a > 0 and u.n_b > 0
    # md5 is uniform: a 50/50 split's SRM chi2 should be far below the
    # p=0.001 threshold (10.8) on this deterministic corpus
    assert u.srm_chi2 < 10.8, (u.n_a, u.n_b)
    rerun = {
        r.event_type: (r.n_a, r.n_b)
        for r in QUERIES["ab_srm_audit_events"](spark, sf_dir).collect()
    }
    assert rerun == {r.event_type: (r.n_a, r.n_b) for r in rows}


def test_mcnemar_consistent_with_kappa_table(spark, sf_dir):
    """McNemar's discordant cells must equal kappa's n10/n01 — the two
    queries compose the SAME labelers, so a drift here means one of
    them changed a labeler definition unilaterally."""
    k = QUERIES["cohens_kappa_quality_documents"](spark, sf_dir).collect()[0]
    m = QUERIES["mcnemar_quality_documents"](spark, sf_dir).collect()[0]
    assert (m.n10, m.n01) == (k.n10, k.n01)
    assert m.diff_sq == (m.n10 - m.n01) ** 2
    if m.n10 + m.n01:
        assert m.mcnemar_chi2_cc <= m.mcnemar_chi2 or m.diff_sq == 0


def test_ab_conversion_shares_srm_arms(spark, sf_dir):
    """The readout's user margins must equal the SRM audit's arm counts
    (shared md5 assignment)."""
    srm = {
        r.event_type: r
        for r in QUERIES["ab_srm_audit_events"](spark, sf_dir).collect()
    }["__users__"]
    c = QUERIES["ab_conversion_chi2_events"](spark, sf_dir).collect()[0]
    assert (c.a1 + c.a0, c.b1 + c.b0) == (srm.n_a, srm.n_b)
    assert 0 <= c.conv_a_bp <= 10000 and 0 <= c.conv_b_bp <= 10000
    assert c.chi2 >= 0


def test_topk_churn_bounds(spark, sf_dir):
    r = QUERIES["topk_churn_customers_orders"](spark, sf_dir).collect()[0]
    assert 0 <= r.n_overlap <= 20
    assert r.jaccard_bp == r.n_overlap * 10000 // (40 - r.n_overlap)
    assert r.churn_bp == (20 - r.n_overlap) * 10000 // 20


# --- Round-10 statistics additions -------------------------------------------


def test_ols_r2_in_range_and_moments_shared(spark, sf_dir):
    r = QUERIES["ols_trend_daily_revenue_orders"](spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_days > 0
    assert 0.0 <= row.r2 <= 1.0 + 1e-12


def test_theil_sen_robust_to_planted_outlier(spark):
    """The estimator's reason to exist: on a perfect integer line with
    ONE wildly corrupted day, the Theil-Sen slope stays the true slope
    (median of pairwise slopes; > 50% of pairs avoid the outlier) while
    the OLS slope on the same data would not. Uses the same ppm/median
    construction as the gated query, driven through the operators'
    arithmetic directly."""
    import duckdb

    days = [(t, 7 * t + 100) for t in range(41)]
    days[20] = (20, 100000)  # corrupted day
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE daily AS SELECT CAST(t AS BIGINT) AS t, "
        "CAST(y AS BIGINT) AS y FROM (VALUES "
        + ",".join(f"({t},{y})" for t, y in days)
        + ") AS v(t, y)"  # BIGINT like the gated query — VALUES infers INT32
    )
    slope = con.execute(
        """
        WITH slopes AS (
          SELECT a.t AS ti, b.t AS tj,
                 (b.y - a.y) * 1000000 // (b.t - a.t) AS s_ppm
          FROM daily a JOIN daily b ON b.t > a.t
        )
        SELECT s_ppm FROM (
          SELECT s_ppm, ROW_NUMBER() OVER (ORDER BY s_ppm, ti, tj) AS rn,
                 COUNT(*) OVER () AS np FROM slopes
        ) WHERE rn = (np + 1) // 2
        """
    ).fetchone()[0]
    assert slope == 7_000_000  # exactly the planted slope, in ppm


def test_trimmed_winsorized_invariants(spark, sf_dir):
    """Structural invariants of the tail guards: trimmed uses n-2k
    observations; winsorized keeps all n; winsorized sum is bracketed
    by clamping (<= raw sum when the top tail dominates is NOT
    guaranteed, but both means must lie within [min, max] of the raw
    cents, and k = n DIV 100 exactly)."""
    rows = QUERIES["trimmed_winsorized_value_events"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.k_trim == r.n_events // 100
        n_used = r.n_events - 2 * r.k_trim
        assert n_used > 0
        assert abs(r.trimmed_mean_cents - r.trimmed_sum_cents / n_used) < 1e-9
        assert abs(r.winsor_mean_cents - r.winsor_sum_cents / r.n_events) < 1e-9


def test_cuped_reduces_or_preserves_variance_terms(spark, sf_dir):
    """rho2 in [0, 1] (it is a squared correlation from exact moments),
    theta shared across arms, and the CUPED adjustment preserves the
    overall weighted mean up to the mean(X) centering identity:
    sum over arms of n_arm * (mean_y - mean_y_cuped) equals
    theta * sum of n_arm * (mean_x_arm - mean_x_all) == 0."""
    rows = QUERIES["cuped_adjusted_metric_events"](spark, sf_dir).collect()
    assert len(rows) == 2
    t0, t1 = rows[0], rows[1]
    assert abs(t0.theta - t1.theta) < 1e-12
    assert 0.0 <= t0.rho2 <= 1.0 + 1e-12
    shift = sum(r.n_users * (r.mean_y - r.mean_y_cuped) for r in rows)
    assert abs(shift) < 1e-4  # theta * (sum_x_all - sum_x_all)


def test_jackknife_degenerate_single_bucket_no_error(spark, tmp_path):
    """ADVICE r10 item 5: when every user hashes into ONE bucket (nb=1)
    the leave-one-out denominator is 0; the guard must make both engines
    return the totals row with zero pseudo-values and NULL stderr
    instead of raising a division error."""
    import duckdb as _dd
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from app_insights_generator_spark.queries import ORACLES

    # One user -> one per-user row -> exactly one jackknife bucket.
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
            "user_id": [7, 7, 7],
            "event_type": ["view", "view", "purchase"],
            "value": [1.25, 2.50, 0.25],
            "props": ["{}", "{}", "{}"],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))

    got = QUERIES["jackknife_ratio_stderr_events"](
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r.total_num_cents == 400 and r.total_den_events == 3
    assert r.n_buckets == 0 and r.stderr_ppm is None

    con = _dd.connect()
    con.register("events", df)
    orc = con.sql(ORACLES["jackknife_ratio_stderr_events"]).fetchall()
    assert len(orc) == 1
    assert orc[0][0] == 400 and orc[0][1] == 3
    assert orc[0][3] == 0 and orc[0][5] is None


def test_gini_histogram_form_bit_equal_to_row_form(spark, sf_dir):
    """VERDICT r10 item 6: the histogram-form Gini (bounded value grid,
    closed-form tie-run rank moment) must reproduce the row-level form
    BIT-FOR-BIT — same integer moments, same single final division."""
    row = QUERIES["gini_revenue_customers"](spark, sf_dir).collect()[0]
    hist = QUERIES["gini_revenue_histogram_customers"](
        spark, sf_dir
    ).collect()[0]
    assert row.n_customers == hist.n_customers
    assert row.total_cents == hist.total_cents
    assert row.gini == hist.gini  # exact: identical int64 moments


def test_siegel_slope_within_inner_median_bounds(spark, sf_dir):
    """Siegel invariants: n_pairs = n_days*(n_days-1) (directed j != i
    pairs), and the repeated-median slope must be bracketed by the
    Theil-Sen slope's pair-slope support (both are medians of subsets of
    the same slope multiset, so both lie in [min, max] pair slope;
    cheap proxy: the two robust slopes should land within the data's
    slope range and be finite int64)."""
    r = QUERIES["siegel_repeated_median_daily_revenue_orders"](
        spark, sf_dir
    ).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1)
    ts = QUERIES["theil_sen_daily_revenue_orders"](spark, sf_dir).collect()[0]
    assert ts.n_days == r.n_days
    # both robust estimators agree on the trend SIGN on this fixture
    assert (r.slope_ppm >= 0) == (ts.slope_ppm >= 0)


def test_ivf_refit_decision_row_shape(spark, sf_dir):
    """Control-plane verdict invariants: cosine in [-1, 1]+eps, segment
    counts positive and consistent with the 4/5 cut, decision derived
    from the cosine threshold exactly."""
    r = QUERIES["ivf_refit_decision_embeddings"](spark, sf_dir).collect()[0]
    assert r.n_old > 0 and r.n_batch > 0
    assert -1.000001 <= r.cos_centroid <= 1.000001
    assert r.decision == ("keep" if r.cos_centroid >= 0.99 else "refit")


def test_unigram_entropy_bounds(spark, sf_dir):
    """Entropy invariants under the 1/1024 quantization: H >= 0, and
    H <= ln(n_types) + the table's resolution slack (bucket-0 floor is
    -ln(1/1025), so each term overshoots by at most ln(1025/1024) plus
    share rounding — ln(V)+0.7 nats is a safe ceiling at gate scale);
    single-type degenerate sources would read ~0."""
    import math

    rows = QUERIES["unigram_entropy_by_source_documents"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_types <= r.n_tokens
        h_nats = r.h_ppm2 / 1e12
        assert h_nats >= 0
        assert h_nats <= math.log(r.n_types) + 0.7, r


def test_kl_vs_corpus_consistency(spark, sf_dir):
    """KL invariants under quantization: ce = h + kl exactly (integer
    identity), h matches the sibling entropy query bit-for-bit on the
    shared recipe, and KL is bounded below by a small quantization
    slack (true KL >= 0; the 1/1024 snap can dip a hair negative)."""
    rows = {
        r.source: r
        for r in QUERIES["kl_source_vs_corpus_documents"](
            spark, sf_dir
        ).collect()
    }
    ent = {
        r.source: r
        for r in QUERIES["unigram_entropy_by_source_documents"](
            spark, sf_dir
        ).collect()
    }
    assert rows.keys() == ent.keys()
    for s, r in rows.items():
        assert r.ce_ppm2 == r.h_ppm2 + r.kl_ppm2
        assert r.h_ppm2 == ent[s].h_ppm2
        assert r.kl_ppm2 >= -0.05e12  # >= -0.05 nats quantization slack

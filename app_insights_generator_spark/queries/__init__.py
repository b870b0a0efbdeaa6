"""Query registry: named (spark, sf_dir) -> DataFrame callables plus their
DuckDB oracle SQL twins, consumed by ``__spark_entry__.py``.

Every operator in SURVEY.md §2 lands here as a registered query; the oracle
SQL uses the same column aliases as the Spark plan so the driver's
order-insensitive value-hash compare lines up.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Highest scale factor at which each query's cross-engine oracle compare
#: is routinely run (machine-readable since round 9 — previously this
#: lived only in docstring prose, the dedup_rate_by_source precedent).
#: "sf0.1" (default): deep local checks pass at sf0.01 AND sf0.1.
#: "sf0.01": the ORACLE (not the operator) is intractable above the gate
#: tier — e.g. the O(n^2) exact all-pairs Jaccard truth set, where DuckDB
#: did not finish 12.5M list-intersect pairs at sf0.1 in 45 min (measured
#: round 8); the Spark side still gets a rows/bounds sanity run at sf0.1.
ORACLE_TIERS: dict[str, str] = {}

_VALID_TIERS = ("sf0.01", "sf0.1")


def register(
    name: str, oracle: str | None = None, tier: str = "sf0.1"
) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` -> driver does a rows-only check.
    ``tier`` records the deepest SF the oracle compare runs at (see
    ORACLE_TIERS)."""
    assert tier in _VALID_TIERS, f"{name}: unknown oracle tier {tier!r}"

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        ORACLE_TIERS[name] = tier
        return fn

    return deco


# Import for side effect: each module registers its queries.
from app_insights_generator_spark.queries import (  # noqa: E402,F401
    analytic_queries,
    events_queries,
    insights_queries,
    llm_queries,
    pipeline_queries,
    relational_queries,
    tpch_queries,
    trainprep_queries,
)

# The round driver gates the FIRST 50 registered queries (verified:
# CORRECTNESS_r02-r09's rows are exactly positions 0-49 of this dict).
#
# Round-10 rotation (VERDICT r09 item #1): (a) ALL 29 never-driver-sampled
# round-9 post-sweep additions — the entire r09 ROTATION_NEXT, the only
# registry entries without a driver row; each carries local oracle-green at
# sf0.01 (+sf0.1 where the oracle is tractable), a 3-fresh-session
# zero-flip sweep (GATE_SWEEP_r09b–g), and a clean sf0.1 Spark-side run
# (SCALE_SPARK_r09). A green window makes the whole 322-query registry
# driver-confirmed for the first time. (b) 21 r-green padding rows,
# preferring queries whose code paths round 10 touches: the
# similarity/ANN family (persist-and-refresh index surface lands in
# similarity.py — VERDICT item #4), the cogroup as-of family (event_id
# pruning guard + eager schema validation — ADVICE items 2–3), trainprep
# (the quantile-normalization equi-join fix — ADVICE item 1 — plus the
# packing family sharing that file), the incremental-dedup pattern the new
# ANN probe mirrors, the insights-sweep core, and a core spread tail.
_GATE_PRIORITY = [
    # (a) the 29 round-10 rotation queries (r09 ROTATION_NEXT order)
    "sparse_dense_agreement_documents",
    "rrf_fusion_documents",
    "cohens_kappa_quality_documents",
    "dedup_cluster_profile_documents",
    "mutual_information_source_lang_documents",
    "token_budget_waterfill_documents",
    "listagg_top_customers_orders",
    "roc_auc_quality_documents",
    "oov_ngram_rate_by_split_documents",
    "split_centroid_drift_embeddings",
    "weighted_median_lineitem",
    "lang_confusion_matrix_documents",
    "mann_kendall_daily_revenue_orders",
    "apportion_largest_remainder_documents",
    "adamic_adar_nation_trade",
    "dsir_importance_documents",
    "markov_next_event_accuracy_events",
    "kruskal_wallis_orders_priority",
    "holt_trend_weekly_revenue_orders",
    "kmv_vocab_ndv_sources",
    "wasserstein_drift_orders_price",
    "simpson_diversity_sources",
    "vocab_coverage_curve_documents",
    "quantile_normalize_doclen_sources",
    "fano_burstiness_event_types",
    "ab_srm_audit_events",
    "mcnemar_quality_documents",
    "ab_conversion_chi2_events",
    "topk_churn_customers_orders",
    # (b1) similarity/ANN family -- persist-and-refresh lands in this file
    "ann_topk_ivf_embeddings",
    "ann_recall_ivf_embeddings",
    "pq_codes_embeddings",
    "pq_adc_search_embeddings",
    "semdedup_embeddings",
    "kmeans_clusters_embeddings",
    "similarity_join_lsh_embeddings",
    "oracle_exact_cosine_pairs",
    # (b2) cogroup as-of family -- pruning guard + eager validation
    "cogroup_purchase_error_asof_events",
    "asof_join_purchase_signup",
    # (b3) trainprep -- quantile-norm equi-join fix lives in this file
    "pack_documents_token_budget",
    "chunk_spans_documents",
    "leakage_safe_split_documents",
    "pack_next_fit_sql_documents",
    "pack_next_fit_documents",
    # (b4) incremental-dedup pattern the new ANN probe mirrors
    "dedup_incremental_minhash_documents",
    "dedup_exact_documents",
    # (b5) insights-sweep core + core spread
    "insights_sweep_lineitem",
    "insights_sweep_orders",
    "q1_pricing_summary",
    "tumbling_window_events",
]

# ROUND-11 ROTATION CHECKLIST, as data (VERDICT r07 item #2: the checklist
# lived in SURVEY.md prose, the bookkeeping class that silently dropped
# multimodal_gif_codec_features in r06). Every query registered after this
# round's definitive gate sweep MUST be appended here the moment it is
# registered; tests/test_registry.py pins "never-driver-sampled implies
# in-window-or-listed" against the committed CORRECTNESS_r*.json history.
ROTATION_NEXT: list[str] = [
    "ann_incremental_probe_embeddings",
    "trainprep_pipeline_documents",
    "pq_incremental_codes_embeddings",
    "ols_trend_daily_revenue_orders",
    "cuped_adjusted_metric_events",
    "theil_sen_daily_revenue_orders",
    "trimmed_winsorized_value_events",
    "jackknife_ratio_stderr_events",
    "diff_in_diff_events",
    "gini_revenue_customers",
    "friedman_weekday_revenue_orders",
    "ltv_cohort_curve_orders",
    "new_vs_returning_weekly_events",
    "kendall_tau_qty_price_lineitem",
    "shrunk_source_quality_documents",
]

_missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
assert not _missing, f"_GATE_PRIORITY names not registered: {_missing}"

# ADVICE r09 item 4: a ROTATION_NEXT typo must fail at import time, not
# surface a round later when the rotation is promoted into the window.
_missing_rot = [n for n in ROTATION_NEXT if n not in QUERIES]
assert not _missing_rot, f"ROTATION_NEXT names not registered: {_missing_rot}"

_front = {n: QUERIES[n] for n in _GATE_PRIORITY}
_rest = {n: fn for n, fn in QUERIES.items() if n not in _front}
QUERIES.clear()
QUERIES.update(_front)
QUERIES.update(_rest)

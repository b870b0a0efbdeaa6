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
# CORRECTNESS_r02-r10's rows are exactly positions 0-49 of this dict).
#
# Round-11 rotation (VERDICT r10 item #1): (a) ALL 15 never-driver-sampled
# round-10 post-sweep additions — the entire r10 ROTATION_NEXT, the only
# registry entries without a driver row (VERDICT r10 verified the set
# name-for-name). Each carries local oracle-green at sf0.001+sf0.01+sf0.1,
# a 3-fresh-session zero-flip sweep (GATE_SWEEP_r10a–k), and a clean sf0.1
# Spark-side run (SCALE_SPARK_r10). A green window driver-confirms the
# entire 337-query registry for the first time. (b) 35 r-green padding
# rows, preferring queries whose code paths round 11 touches: the
# similarity/IVF family (refresh_ivf_index return fix — ADVICE item 3 —
# plus the SF-override quartet the sweep tooling retimes, VERDICT item #4),
# trainprep packing (per-(split,shard) packing rework shares
# llm_queries.py — VERDICT item #3), the events experimentation siblings
# of the jackknife guard fix (ADVICE item 5), the stats/histogram family
# next to the new histogram-form Gini twin (VERDICT item #6), the
# winnowing/spans pair under bench adjudication (VERDICT item #2), the
# incremental-dedup pattern the streaming exactly-once fix exercises
# (ADVICE items 1–2), and the insights-sweep core.
_GATE_PRIORITY = [
    # (a) the 15 round-11 rotation queries (r10 ROTATION_NEXT order)
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
    # (b1) similarity/IVF family -- refresh fix + SF-override quartet
    "ann_topk_ivf_embeddings",
    "ann_recall_ivf_embeddings",
    "pq_codes_embeddings",
    "pq_adc_search_embeddings",
    "kmeans_clusters_embeddings",
    "semdedup_embeddings",
    "similarity_join_lsh_embeddings",
    "knn_label_accuracy_embeddings",
    "dedup_embedding_cosine_embeddings",
    "oracle_exact_cosine_pairs",
    "cosine_topk_embeddings",
    # (b2) trainprep packing family -- per-(split,shard) rework file
    "pack_documents_token_budget",
    "pack_next_fit_documents",
    "pack_next_fit_sql_documents",
    "shard_shuffle_documents",
    "chunk_spans_documents",
    "leakage_safe_split_documents",
    "train_val_test_split_documents",
    # (b3) events experimentation siblings of the jackknife guard
    "ab_srm_audit_events",
    "ab_conversion_chi2_events",
    "tumbling_window_events",
    "dedup_watermark_batch_twin_events",
    # (b4) stats/histogram family next to the Gini histogram twin
    "equidepth_histogram_orders",
    "length_percentiles_by_source",
    "token_gini_by_source",
    # (b5) winnowing adjudication pair
    "winnowing_fingerprints_documents",
    "duplicate_spans_documents",
    # (b6) incremental-dedup pattern the streaming fixes exercise
    "dedup_incremental_minhash_documents",
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "cross_split_contamination_documents",
    # (b7) insights-sweep core + spread
    "insights_sweep_lineitem",
    "insights_sweep_orders",
    "insights_sweep_lineitem_wide",
    "q1_pricing_summary",
]

# ROUND-12 ROTATION CHECKLIST, as data (VERDICT r07 item #2: the checklist
# lived in SURVEY.md prose, the bookkeeping class that silently dropped
# multimodal_gif_codec_features in r06). Every query registered after this
# round's definitive gate sweep MUST be appended here the moment it is
# registered; tests/test_registry.py pins "never-driver-sampled implies
# in-window-or-listed" against the committed CORRECTNESS_r*.json history.
ROTATION_NEXT: list[str] = [
    "gini_revenue_histogram_customers",
    "ivf_refit_decision_embeddings",
    "siegel_repeated_median_daily_revenue_orders",
    "unigram_entropy_by_source_documents",
    "kl_source_vs_corpus_documents",
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

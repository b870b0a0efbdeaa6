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
# CORRECTNESS_r02-r11's rows are exactly positions 0-49 of this dict).
#
# Round-12 rotation (VERDICT r11 item #1): (a) the 5 never-driver-sampled
# round-11 post-sweep additions — the entire r11 ROTATION_NEXT, the only
# registry entries without a driver row (VERDICT r11 verified the set
# name-for-name and re-ran all five against the oracle: ALL PASS). Each
# carries local oracle-green at sf0.001+sf0.01+sf0.1 and a
# 3-fresh-session zero-flip sweep (GATE_SWEEP_r11b–e). A green window
# driver-confirms the ENTIRE 342-query registry. (b) 45 r-green padding
# rows, preferring queries whose code paths round 12 touches: the
# IVF/PQ persist-and-refresh family (assign_to_index now reads only the
# centroid table and refresh_ivf_index pins its assignment — ADVICE r11
# items 1+4 land in operators/similarity.py, which this whole family
# exercises), the streaming batch twins next to the lineage/query-id
# re-check all three foreachBatch streams gained (ADVICE item 2), the
# udtf_chunk adjudication trio (VERDICT item #3 — driver-side timing rows
# for the watch set), the incremental-dedup family that shares the
# persisted-index pattern the compaction gc fix hardens (ADVICE item 3),
# the trainprep/experimentation spread, the stats neighbors of the Gini
# histogram twin in rotation slot 1, and the insights-sweep core.
_GATE_PRIORITY = [
    # (a) the 5 round-12 rotation queries (r11 ROTATION_NEXT order)
    "gini_revenue_histogram_customers",
    "ivf_refit_decision_embeddings",
    "siegel_repeated_median_daily_revenue_orders",
    "unigram_entropy_by_source_documents",
    "kl_source_vs_corpus_documents",
    # (b1) IVF/PQ persist-and-refresh family -- similarity.py touched
    "ann_incremental_probe_embeddings",
    "pq_incremental_codes_embeddings",
    "ann_topk_ivf_embeddings",
    "ann_recall_ivf_embeddings",
    "pq_codes_embeddings",
    "pq_adc_search_embeddings",
    "kmeans_clusters_embeddings",
    "semdedup_embeddings",
    "cosine_topk_embeddings",
    "similarity_join_lsh_embeddings",
    "knn_label_accuracy_embeddings",
    "dedup_embedding_cosine_embeddings",
    "oracle_exact_cosine_pairs",
    # (b2) streaming batch twins -- lineage re-check in all 3 streams
    "dedup_watermark_batch_twin_events",
    "enrich_stream_static_batch_twin",
    "stateful_type_stats_batch_twin_events",
    "tumbling_window_events",
    # (b3) udtf_chunk adjudication trio + neighbors
    "udtf_chunk_documents",
    "multimodal_mp4_codec_features",
    "cogroup_purchase_error_asof_events",
    "chunk_spans_documents",
    "multimodal_mp4_frame_sample",
    # (b4) incremental-dedup family -- shares the persisted-index pattern
    "dedup_incremental_minhash_documents",
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "cross_split_contamination_documents",
    # (b5) insights-sweep core
    "insights_sweep_lineitem",
    "insights_sweep_orders",
    "insights_sweep_lineitem_wide",
    "insights_sweep_lineitem_loop",
    "q1_pricing_summary",
    # (b6) trainprep spread
    "pack_documents_token_budget",
    "pack_next_fit_documents",
    "pack_next_fit_sql_documents",
    "shard_shuffle_documents",
    "leakage_safe_split_documents",
    "train_val_test_split_documents",
    # (b7) experimentation spread
    "ab_srm_audit_events",
    "ab_conversion_chi2_events",
    "jackknife_ratio_stderr_events",
    "cuped_adjusted_metric_events",
    "diff_in_diff_events",
    # (b8) stats neighbors of the Gini histogram twin (slot 1)
    "gini_revenue_customers",
    "equidepth_histogram_orders",
    "token_gini_by_source",
]

# ROUND-13 ROTATION CHECKLIST, as data (VERDICT r07 item #2: the checklist
# lived in SURVEY.md prose, the bookkeeping class that silently dropped
# multimodal_gif_codec_features in r06). Every query registered after this
# round's definitive gate sweep MUST be appended here the moment it is
# registered; tests/test_registry.py pins "never-driver-sampled implies
# in-window-or-listed" against the committed CORRECTNESS_r*.json history.
ROTATION_NEXT: list[str] = [
    "ivf_compaction_probe_embeddings",
    "pq_refit_decision_embeddings",
    "ivf_compaction_receipt_embeddings",
    "dedup_compaction_receipt_documents",
    "sq8_adc_search_embeddings",
    "matryoshka_prefix_recall_embeddings",
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

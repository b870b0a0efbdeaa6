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


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` -> driver does a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
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
# CORRECTNESS_r02's 50 rows are exactly positions 0-49 of this dict).
# 68 of 120 queries had never been sampled after two rounds — all of
# TPC-H, the pipeline round-trips, trainprep, and the similarity path.
# Front-load a curated 50 of the never-gated queries so every capability
# earns a recorded hard signal; the ~18 remaining never-gated names sit
# immediately after and rotate in next round.
_GATE_PRIORITY = [
    # similarity — the subsystem with no surviving driver row (VERDICT r02 #3)
    "similarity_join_lsh_embeddings",
    "ann_topk_lsh_embeddings",
    "ann_topk_ivf_embeddings",
    "oracle_exact_cosine_pairs",
    # sketches / sampling graduating from rows-only this round
    "hll_sketch_parts_mergeable",
    "approx_distinct_parts",
    "stratified_sample_orders",
    # all of TPC-H
    "q1_pricing_summary",
    "q2_min_supplier_per_part",
    "q3_shipping_priority",
    "q4_order_priority_late",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_part_value",
    "q12_priority_by_lineclass",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count_by_partclass",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_supply_suppliers",
    "q21_only_late_supplier",
    "q22_inactive_rich_customers",
    # trainprep
    "decontaminate_ngram_documents",
    "pack_documents_token_budget",
    "pseudonymize_events_kanon",
    "tfidf_top_terms_documents",
    # sources/sinks + pipeline round-trips
    "csv_roundtrip_nation",
    "json_roundtrip_part",
    "orc_roundtrip_customer",
    "text_roundtrip_documents",
    "partitioned_parquet_orders",
    "sorted_sink_rowgroup_skip_lineitem",
    "bucketed_join_orders_lineitem",
    "pipeline_extract_orders",
    "pipeline_extract_orders_loop",
    # llm curation
    "curation_pipeline_documents",
    "repetition_signals_documents",
    "domain_mix_sample_documents",
    # relational joins/windows never yet gated
    "join_revenue_by_nation",
    "semi_join_active_customers",
    "anti_join_customers_without_orders",
    "window_top3_orders_per_customer",
    "salted_join_supplier_revenue",
]

_missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
assert not _missing, f"_GATE_PRIORITY names not registered: {_missing}"

_front = {n: QUERIES[n] for n in _GATE_PRIORITY}
_rest = {n: fn for n, fn in QUERIES.items() if n not in _front}
QUERIES.clear()
QUERIES.update(_front)
QUERIES.update(_rest)

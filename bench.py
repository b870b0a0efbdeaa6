"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines (VERDICT r08 #1: round 8's single line outgrew the
driver's ~2 KB stdout-tail capture and BENCH_r08 recorded parsed:null):
  1. a DETAIL line {"detail": ..., "calibration": ..., "queries_warm3":
     ..., "queries_calibrated": ...} — probe runs, per-query warm-third
     (the adjudication instrument VERDICT r08 #3 asked for), calibrated
     times; arbitrarily long, NOT for the driver;
  2. LAST, the compact driver-facing line {"metric", "value", "unit",
     "sf", "machine_factor", "queries"} kept under ~1.5 KB (2-decimal
     medians) so the tail capture always contains it whole.

Each query is forced end-to-end with the noop sink (full computation, no
driver-side result transfer). The headline is the 63-set lineitem insight
sweep in native grouping-sets mode; its faithful-loop twin runs too so
BASELINE.md's M2-vs-M3 comparison is re-measured every round.

Each query is timed REPEATS times and the MEDIAN recorded (VERDICT r02
item 4): single-run timing let one noisy neighbor rewrite round history —
BENCH_r02 recorded a phantom 1.8x regression on unchanged code that
vanished on an idle machine.

Calibration (VERDICT r07 item 6): cross-round wall-clocks swung ~2x with
machine load on IDENTICAL code (r05-r07 each spent a verdict cycle
adjudicating noise). Before the suite, a fixed probe (the native sweep,
3 runs, warm-third) measures THIS session's machine speed against the
pinned idle-machine reference; the output carries both raw and
calibrated (raw / machine_factor) times, so rounds compare without a
BASELINE.md cross-reference. A SECOND identical probe runs after the
suite (VERDICT r11 item 4): the start probe alone missed three
intra-session bursts, so the detail line now carries both probes plus a
``burst_suspected`` flag (probe disagreement > 1.25x) — when set,
per-query regressions inside that session are environment-suspect by
default, no worktree adjudication needed.
"""

from __future__ import annotations

import atexit
import json
import os
import statistics
import sys
import time

REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

#: The calibration probe and its pinned idle-machine reference: warm-third
#: of 3 fresh-JVM runs of the native 63-set lineitem sweep at sf0.1,
#: measured round 8 (2026-08-15, runs [7.186, 2.439, 2.410]). NEVER
#: re-pin this without renaming the field — its whole value is staying
#: constant across rounds.
PROBE_QUERY = "insights_sweep_lineitem"
REF_PROBE_SEC = 2.41

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from app_insights_generator_spark.session import get_spark  # noqa: E402
from app_insights_generator_spark.queries import QUERIES  # noqa: E402
from app_insights_generator_spark.queries.llm_queries import (  # noqa: E402
    similarity_join_lsh_production,
)

# Per-sf_dir persisted-index scratch dirs; removed at process exit
# (ADVICE r10 item 4 — mkdtemp dirs leaked one index per bench run).
_IVF_INDEX_CACHE: dict[str, str] = {}
_PQ_INDEX_CACHE: dict[str, str] = {}


def _cleanup_index_caches() -> None:
    import shutil

    for cache in (_IVF_INDEX_CACHE, _PQ_INDEX_CACHE):
        for d in cache.values():
            shutil.rmtree(d, ignore_errors=True)
        cache.clear()


atexit.register(_cleanup_index_caches)


def _ann_probe_persisted_production(spark, sf_dir):
    """Bench-local serving-path probe (round 10): the persisted IVF index
    is built+written ONCE per sf_dir (outside every timed repeat after
    the first — the median and warm-third measure the steady-state
    serve), then the 20-query panel probes the partition-pruned lists.
    The correctness twin ann_incremental_probe_embeddings is driver-
    gated with recall invariants; this times the pure probe."""
    import tempfile

    from app_insights_generator_spark.operators import similarity as S
    from app_insights_generator_spark.sources import load_table
    from pyspark.sql import functions as F

    embs = load_table(spark, sf_dir, "embeddings")
    idx = _IVF_INDEX_CACHE.get(sf_dir)
    if idx is None:
        idx = tempfile.mkdtemp(prefix="aig_bench_ivf_")
        cent, assigned = S.build_ivf_index(
            embs.filter(F.col("vec_id") >= 20), "embedding", "vec_id"
        )
        S.write_ivf_index(idx, cent, assigned)
        _IVF_INDEX_CACHE[sf_dir] = idx
    queries = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return S.ann_probe_persisted(spark, idx, queries, k=10, n_probe=3)


def _pq_incremental_encode_production(spark, sf_dir):
    """Bench-local PQ ingest steady state (VERDICT r10 item 7b, next to
    ann_probe_persisted): the 4 subspace codebooks are fitted and
    persisted ONCE per sf_dir (outside every timed repeat after the
    first); the timed path is the daily job — encode the ingest batch
    (top 1/5 of the id space) against the FROZEN codebooks read back
    from parquet, one assign half-step per subspace, O(batch). The
    correctness twin pq_incremental_codes_embeddings is driver-gated
    hash-exact; this times the pure encode."""
    import tempfile
    from functools import reduce

    from app_insights_generator_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_fixed_point,
        quantized_long_form,
    )
    from app_insights_generator_spark.queries.llm_queries import (
        _KM_OFF,
        _KM_SCALE,
        _PQ_K,
        _PQ_M,
        _PQ_SUBDIM,
    )
    from app_insights_generator_spark.sources import load_table
    from pyspark.sql import functions as F

    embs = load_table(spark, sf_dir, "embeddings")
    cut = embs.agg(F.expr("max(vec_id) * 4 DIV 5").cast("long")).first()[0]
    idx = _PQ_INDEX_CACHE.get(sf_dir)
    if idx is None:
        idx = tempfile.mkdtemp(prefix="aig_bench_pq_")
        old = embs.filter(F.col("vec_id") < cut)
        for s in range(_PQ_M):
            sl = F.expr(
                f"slice(embedding, {_PQ_SUBDIM * s + 1}, {_PQ_SUBDIM})"
            )
            _a, cent = kmeans_fixed_point(
                old.select("vec_id", sl.alias("sub")), "vec_id", "sub",
                k=_PQ_K, n_iter=2, scale=_KM_SCALE, offset=_KM_OFF,
            )
            cent.select(
                F.lit(s).alias("subspace"), "cid", "d", "v"
            ).write.mode("append").parquet(f"{idx}/codebooks")
        _PQ_INDEX_CACHE[sf_dir] = idx
    books = spark.read.parquet(f"{idx}/codebooks")
    batch = embs.filter(F.col("vec_id") >= cut)
    encoded = [
        assign_to_centroids(
            quantized_long_form(
                batch.select(
                    "vec_id",
                    F.expr(
                        f"slice(embedding, {_PQ_SUBDIM * s + 1}, "
                        f"{_PQ_SUBDIM})"
                    ).alias("sub"),
                ),
                "vec_id", "sub", _KM_SCALE, _KM_OFF,
            ),
            books.filter(F.col("subspace") == s).select("cid", "d", "v"),
        ).select(F.lit(s).alias("subspace"), "vid", "cid", "dist")
        for s in range(_PQ_M)
    ]
    return reduce(lambda x, y: x.unionByName(y), encoded)


def _cogroup_asof_pandas(spark, sf_dir):
    """Bench-local pandas twin of cogroup_purchase_error_asof_events (the
    registered/gated query is the applyInArrow form since round 7 — the
    pandas form measured 3.8x slower for identical output, BENCH_r06);
    this keeps the applyInPandas API covered and its per-round overhead
    measured. Inputs come from the SAME shared builder as the gated
    query and the parity test."""
    from app_insights_generator_spark.operators.cogroup import (
        asof_error_context,
        purchase_error_streams,
    )

    return asof_error_context(*purchase_error_streams(spark, sf_dir))


# Bench-only callables: the raw banded-LSH join is deliberately NOT in the
# query registry (its correctness twin similarity_join_lsh_embeddings is
# driver-gated with the same parameters; the raw pair set has no SQL
# oracle) but it IS the scale path worth timing.
_EXTRA = {
    "similarity_join_lsh_production": similarity_join_lsh_production,
    "cogroup_asof_pandas": _cogroup_asof_pandas,
    "ann_probe_persisted": _ann_probe_persisted_production,
    "pq_incremental_encode": _pq_incremental_encode_production,
}

HEADLINE = [
    "insights_sweep_lineitem",        # native grouping-sets sweep (M3)
    "insights_sweep_lineitem_loop",   # faithful reference loop (M2 baseline)
    "insights_sweep_lineitem_wide",   # 10-col/1023-set sweep, Apriori-pruned
    "insights_sweep_lineitem_wide_lowcard",  # same lattice, compressible tuples
    "insights_sweep_orders",
    "q1_pricing_summary",
    "join_revenue_by_nation",
    "window_top3_orders_per_customer",
    "distinct_parts_per_flag",
    "tumbling_window_events",
    "session_window_events",
    "asof_join_purchase_signup",
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "dedup_components_documents",
    "duplicate_spans_documents",   # round-5: substring-level dup spans
    "shard_shuffle_documents",     # round-5: deterministic corpus shuffle
    "cosine_topk_embeddings",
    "similarity_join_lsh_production",  # bench-local: raw LSH join, see _EXTRA
    "text_stats_documents",
    "curation_pipeline_documents",
    "multimodal_mp4_codec_features",  # round-6: real MP4 decode throughput

    "bucketed_join_orders_lineitem",
    "udtf_chunk_documents",
    "cogroup_purchase_error_asof_events",  # round-7: gated applyInArrow merge
    "cogroup_asof_pandas",                 # bench-local: applyInPandas twin
    "chunk_spans_documents",               # round-6: LM block chunker
    "winnowing_fingerprints_documents",    # round-7: MOSS fingerprint selection
    "semdedup_embeddings",                 # round-7: cluster-partitioned dedup
    "containment_join_documents",          # round-7: prefix-filtered containment
    "dsir_importance_documents",           # round-9: hashed-model data selection
    "kmv_vocab_ndv_sources",               # round-9: bottom-k NDV sketch
    "ann_probe_persisted",                 # round-10: persisted-IVF serving probe
    "pq_incremental_encode",               # round-11: frozen-codebook PQ ingest
    "trainprep_pipeline_documents",        # round-10: end-to-end prep chain
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    spark = get_spark(app_name="bench")

    # Warmup: absorb one-time JVM/codegen/shuffle-system startup so per-query
    # numbers measure steady state, not whichever query runs first.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    # Calibration probe: 3 runs, warm-third, against the pinned reference.
    # The factor is meaningful ONLY at the reference's sf (0.1) — at any
    # other sf it is emitted as null so cross-round consumers can't ingest
    # an invalid calibration (ADVICE r08).
    probe_runs = []
    for _ in range(3):
        t0 = time.time()
        QUERIES[PROBE_QUERY](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        probe_runs.append(round(time.time() - t0, 3))
    probe = probe_runs[-1]
    factor = round(probe / REF_PROBE_SEC, 3) if float(sf) == 0.1 else None

    timings: dict[str, float] = {}
    warm3: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name) or _EXTRA[name]
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)
        warm3[name] = round(runs[-1], 3)

    # END-of-suite probe (VERDICT r11 item 4): the single start probe has
    # missed three intra-session bursts — a query can plateau 2-3x for all
    # its repeats while the start probe read fast. Re-running the SAME
    # probe after the suite turns burst adjudication into a read: if the
    # two probes disagree materially, per-query regressions inside this
    # session are suspect before anyone builds a worktree.
    probe_runs_end = []
    for _ in range(3):
        t0 = time.time()
        QUERIES[PROBE_QUERY](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        probe_runs_end.append(round(time.time() - t0, 3))
    probe_end = probe_runs_end[-1]
    factor_end = (
        round(probe_end / REF_PROBE_SEC, 3) if float(sf) == 0.1 else None
    )
    disagreement = (
        round(max(probe, probe_end) / min(probe, probe_end), 3)
        if min(probe, probe_end) > 0
        else None
    )
    burst_suspected = bool(disagreement and disagreement > 1.25)

    total = round(sum(timings.values()), 3)
    calibrated = (
        {k: round(v / factor, 3) for k, v in timings.items()} if factor else None
    )
    detail = {
        "detail": "bench-full",
        "calibration": {
            "probe_query": PROBE_QUERY,
            "probe_runs_sec": probe_runs,
            "probe_warm_third_sec": probe,
            "ref_probe_sec": REF_PROBE_SEC,
            "ref_sf": 0.1,
            "machine_factor": factor,
            "probe_runs_end_sec": probe_runs_end,
            "probe_end_warm_third_sec": probe_end,
            "machine_factor_end": factor_end,
            "probe_disagreement": disagreement,
            "burst_suspected": burst_suspected,
        },
        "queries_warm3": warm3,
        "value_calibrated": (
            round(sum(calibrated.values()), 3) if calibrated else None
        ),
        "queries_calibrated": calibrated,
    }
    compact = {
        "metric": "headline-suite-wall-clock",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "machine_factor": factor,
        "machine_factor_end": factor_end,
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    print(json.dumps(detail))
    # The driver-facing line goes LAST and must stay under the ~2 KB
    # stdout-tail capture; assert so a future query addition fails loudly
    # here instead of silently producing an unparseable BENCH artifact.
    line = json.dumps(compact)
    assert len(line) <= 1536, f"driver-facing bench line {len(line)}B > 1536B"
    print(line)


if __name__ == "__main__":
    main()

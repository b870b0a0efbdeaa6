"""Accuracy bounds for sketch-based approximate aggregates.

The driver's rows-only check proves these queries run; these tests prove
the estimates are USEFUL — within the error bound the sketch parameters
promise — and that union-of-sketches equals a fresh full-data sketch
(the mergeability property the 100 TB architecture relies on).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from app_insights_generator_spark.queries import QUERIES
from app_insights_generator_spark.sources import load_table

REL_TOL = 0.05  # default lgConfigK=12 -> ~1.6% RSE; 5% is >3 sigma


def test_hll_estimates_within_bound(spark, sf_dir):
    """The gate query now carries the 5% bound check as its own
    n_violations column (invariant oracle); assert zero violations and
    that its exact_parts anchor matches independently computed counts.
    The raw per-group sketch estimates stay covered by the tighter
    REL_TOL assertion on a direct sketch build below."""
    rows = {
        r["l_returnflag"]: (r["exact_parts"], r["n_violations"])
        for r in QUERIES["hll_sketch_parts_mergeable"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    exact["ALL"] = li.select("l_partkey").distinct().count()
    assert set(rows) == set(exact)
    for k, v in exact.items():
        assert rows[k] == (v, 0), (k, rows[k], v)
    est = {
        r["l_returnflag"]: r["e"]
        for r in li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .select("l_returnflag", F.hll_sketch_estimate("sk").alias("e"))
        .collect()
    }
    for k, v in exact.items():
        if k == "ALL":
            continue
        assert abs(est[k] - v) <= max(1, REL_TOL * v), (k, est[k], v)


def test_hll_union_matches_direct_sketch(spark, sf_dir):
    """Merging per-group sketches must give the same estimate as one
    sketch built over the whole column — bit-level mergeability, not
    just statistical closeness."""
    li = load_table(spark, sf_dir, "lineitem")
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .collect()[0]["e"]
    )
    direct = (
        li.agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .collect()[0]["e"]
    )
    assert merged == direct, (merged, direct)


def test_cms_estimates_within_bound(spark, sf_dir):
    """CMS guarantees estimate >= exact and estimate <= exact + eps*N with
    probability 1-delta; the gate query now carries that bound check as its
    own n_violations column — assert it reports zero violations and that
    its exact_n anchor matches an independently computed exact count."""
    rows = {
        r["event_type"]: (r["exact_n"], r["n_violations"])
        for r in QUERIES["cms_event_type_freq"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(rows) == set(exact)
    for k, v in exact.items():
        assert rows[k] == (v, 0), (k, rows[k], v)

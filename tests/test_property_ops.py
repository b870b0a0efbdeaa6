"""Property-based equivalence for the round-6 third-wave operators
(SURVEY.md §5 strategy): hypothesis-generated small inputs vs brute-force
pure-Python references — the corner cases (duplicate points, all-one-tier,
empty sides, simultaneous timestamps) that hand fixtures miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from app_insights_generator_spark.operators.cogroup import asof_error_context
from app_insights_generator_spark.queries.relational_queries import skyline_2d

US = 1_000_000

pt = st.tuples(
    st.integers(min_value=0, max_value=20),  # price_cents (tiny domain: ties!)
    st.integers(min_value=0, max_value=6),  # p_size
)


def _brute_skyline(pts):
    out = []
    for i, (p, s) in enumerate(pts):
        dominated = any(
            (q <= p and t >= s and (q < p or t > s)) for q, t in pts
        )
        if not dominated:
            out.append(i)
    return set(out)


@given(pts=st.lists(pt, min_size=1, max_size=25))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_skyline_matches_bruteforce(spark, pts):
    df = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(pts)],
        "p_partkey long, price_cents long, p_size long",
    )
    got = {r.p_partkey for r in skyline_2d(df).collect()}
    assert got == _brute_skyline(pts)


ev_ts = st.integers(min_value=0, max_value=8000)  # seconds, forces 1h-window edges


def _brute_asof(purchases, errors):
    out = {}
    for eid, (u, t) in enumerate(purchases):
        prior = [et for eu, et in errors if eu == u and et <= t]
        gap = (t - max(prior)) if prior else None
        n1h = sum(1 for et in prior if et >= t - 3600)
        out[eid] = (gap, n1h)
    return out


@given(
    purchases=st.lists(
        st.tuples(st.integers(0, 2), ev_ts), min_size=1, max_size=15
    ),
    errors=st.lists(st.tuples(st.integers(0, 2), ev_ts), min_size=0, max_size=15),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cogroup_asof_matches_bruteforce(spark, purchases, errors):
    p_df = spark.createDataFrame(
        [(u, eid, t * US) for eid, (u, t) in enumerate(purchases)],
        "user_id long, event_id long, ts_us long",
    )
    e_df = spark.createDataFrame(
        [(u, t * US) for u, t in errors] or [(99, 0)],
        "user_id long, ts_us long",
    )
    if not errors:
        e_df = e_df.filter("user_id < 0")  # truly empty side
    got = {
        r.event_id: (r.gap_s, r.errors_1h)
        for r in asof_error_context(p_df, e_df).collect()
    }
    assert got == _brute_asof(purchases, errors)


doc = st.tuples(
    st.sampled_from(["s1", "s2"]),
    st.integers(min_value=0, max_value=40),  # n_tokens (0 -> one empty token)
)


@given(docs=st.lists(doc, min_size=1, max_size=20))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_spans_partition_the_stream(spark, docs, tmp_path_factory):
    """Invariants of the LM block chunker on arbitrary corpora: per
    source, the spans exactly tile each document's tokens (sum of
    hi-lo == n_tokens), every span lies inside its 128-token block, and
    consecutive blocks of one document abut."""
    import os

    from app_insights_generator_spark.queries import QUERIES

    d = str(tmp_path_factory.mktemp("chunkprop"))
    text = lambda n: " ".join(["w"] * n)  # noqa: E731
    rows = [(i, text(n), "en", src, n) for i, (src, n) in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    out = QUERIES["chunk_spans_documents"](spark, d).collect()
    by_doc: dict = {}
    for r in out:
        assert 0 <= r.lo < r.hi <= 128, r
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, (src, n) in enumerate(docs):
        spans = by_doc.get(i, [])
        # the split-on-space token convention (shared with
        # pack_documents_token_budget) counts empty text as ONE token
        n_tok = max(n, 1)
        assert sum(r.hi - r.lo for r in spans) == n_tok
        spans.sort(key=lambda r: r.block_id)
        for a, b in zip(spans, spans[1:]):
            assert b.block_id == a.block_id + 1 and a.hi == 128 and b.lo == 0


def test_pack_next_fit_invariants(spark, sf_dir):
    """Next-fit packing invariants: no multi-doc window exceeds the 512
    budget; an over-budget window holds exactly one document; waste is
    the exact remainder; every document lands in exactly one window; and
    windows are contiguous 0..k per shard."""
    from app_insights_generator_spark.queries.trainprep_queries import (
        pack_next_fit_documents,
    )
    from app_insights_generator_spark.sources import load_table

    rows = pack_next_fit_documents(spark, sf_dir).collect()
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    by_shard = {}
    for r in rows:
        assert r.fill_tokens <= 512 or r.n_docs == 1, r
        assert r.waste_tokens == max(512 - r.fill_tokens, 0), r
        by_shard.setdefault(r.shard, []).append(r.win)
    for shard, wins in by_shard.items():
        assert sorted(wins) == list(range(len(wins))), (shard, sorted(wins))


def test_pack_next_fit_matches_reference_loop(spark):
    """Constructed corpus incl. an over-budget document and an exact-fit
    boundary: the distributed grouped-map must equal a driver-side
    next-fit reimplementation."""
    from app_insights_generator_spark.queries.trainprep_queries import (
        _PACK_BUDGET,
    )
    import pandas as pd
    from pyspark.sql import functions as F

    sizes = [100, 412, 1, 600, 511, 1, 512, 5]  # 412+100=512 exact fit
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * s)) for i, s in enumerate(sizes)],
        ["doc_id", "text"],
    )
    # inline the query body on this frame: shard = doc_id DIV 500 -> one shard
    from app_insights_generator_spark.queries.trainprep_queries import (
        pack_next_fit_documents,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.withColumn("source", F.lit("s")).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {
            (r.shard, r.win): (r.n_docs, r.fill_tokens)
            for r in pack_next_fit_documents(spark, d).collect()
        }
    wins = []
    for n in sizes:
        if wins and wins[-1][1] + n <= _PACK_BUDGET:
            wins[-1] = (wins[-1][0] + 1, wins[-1][1] + n)
        else:
            wins.append((1, n))
    expect = {(0, i): w for i, w in enumerate(wins)}
    assert got == expect


def test_pack_next_fit_sql_twin_matches_grouped_map_semantics(spark):
    """The WITH RECURSIVE twin must implement the identical next-fit
    recurrence: on a constructed corpus spanning 25-doc shards
    (incl. over-budget and exact-fit docs), its windows must equal a
    driver-side next-fit run per 100-doc shard."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from app_insights_generator_spark.queries.trainprep_queries import (
        _PACK_BUDGET,
        pack_next_fit_sql_documents,
    )

    sizes = {i: (i * 37) % 300 + 1 for i in range(20, 35)}  # crosses shard edge
    sizes[22] = 600  # over budget
    sizes[24] = _PACK_BUDGET  # exact fit
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * s)) for i, s in sorted(sizes.items())],
        ["doc_id", "text"],
    )
    with tempfile.TemporaryDirectory() as d:
        docs.withColumn("source", F.lit("s")).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {
            (r.shard, r.win): (r.n_docs, r.fill_tokens, r.waste_tokens)
            for r in pack_next_fit_sql_documents(spark, d).collect()
        }
    expect = {}
    for shard in sorted({i // 25 for i in sizes}):
        wins = []
        for i in sorted(i for i in sizes if i // 25 == shard):
            n = sizes[i]
            if wins and wins[-1][1] + n <= _PACK_BUDGET:
                wins[-1] = (wins[-1][0] + 1, wins[-1][1] + n)
            else:
                wins.append((1, n))
        for w_idx, (nd, fill) in enumerate(wins):
            expect[(shard, w_idx)] = (nd, fill, max(_PACK_BUDGET - fill, 0))
    assert got == expect


def test_pack_next_fit_sql_restores_recursion_limit(spark, sf_dir):
    """ADVICE r08: building the recursive-CTE plan must not leak the
    raised spark.sql.cteRecursionLevelLimit to the rest of the session —
    and the restored default must still cover execution (depth is 25)."""
    from app_insights_generator_spark.queries.trainprep_queries import (
        pack_next_fit_sql_documents,
    )

    before = spark.conf.get("spark.sql.cteRecursionLevelLimit")
    df = pack_next_fit_sql_documents(spark, sf_dir)
    assert spark.conf.get("spark.sql.cteRecursionLevelLimit") == before
    assert df.count() > 0  # executes fine under the restored limit


def test_waterfill_allocation_properties(spark, sf_dir):
    """Water-filling invariants: allocations never exceed source tokens
    or the cap; uncapped sources are fully funded; total allocation fits
    the budget AND the cap is MAXIMAL (cap+1 would overflow it); capped
    sources all receive exactly the cap (max-min fairness)."""
    from app_insights_generator_spark.queries.trainprep_queries import (
        token_budget_waterfill_documents,
    )

    rows = token_budget_waterfill_documents(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    budget = total * 6 // 10
    cap = rows[0].cap_tokens
    assert all(r.cap_tokens == cap for r in rows)
    alloc = sum(r.alloc_tokens for r in rows)
    assert alloc <= budget
    # maximality: raising the water level by 1 must exceed the budget
    assert sum(min(r.n_tokens, cap + 1) for r in rows) > budget
    for r in rows:
        assert r.alloc_tokens == min(r.n_tokens, cap)
        assert r.capped == (r.n_tokens > cap)


def test_oov_ngram_rate_matches_python_recompute(spark, sf_dir):
    """OOV trigram rows must equal a pure-Python recomputation using the
    same sha-bucket split and space tokenization."""
    import hashlib
    from collections import Counter

    from app_insights_generator_spark.queries.trainprep_queries import (
        oov_ngram_rate_by_split_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    def split_of(doc_id):
        b = int(hashlib.sha256(str(doc_id).encode()).hexdigest()[:4], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    grams = {"train": [], "val": [], "test": []}
    for d in docs:
        t = d.text.strip().split(" ")
        grams[split_of(d.doc_id)].extend(
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        )
    vocab = set(grams["train"])
    got = {r.split: r for r in oov_ngram_rate_by_split_documents(spark, sf_dir).collect()}
    for split in ("val", "test"):
        gs = grams[split]
        if not gs:
            assert split not in got
            continue
        oov = [g for g in gs if g not in vocab]
        r = got[split]
        assert r.n_ngrams == len(gs)
        assert r.n_oov == len(oov)
        assert r.oov_bp == len(oov) * 10000 // len(gs)
        assert r.n_types == len(set(gs))
        assert r.n_oov_types == len(set(oov))

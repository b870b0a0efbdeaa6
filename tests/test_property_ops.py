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

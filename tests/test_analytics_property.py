"""Property-based checks for the event-analytics operators: on arbitrary
generated event streams, sessionization and the SCD2 builder must equal an
independent pure-Python reimplementation exactly (same split points, same
validity intervals), including the corner cases fixtures miss — equal
timestamps, single-event users, gaps exactly at the 30-minute boundary.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from app_insights_generator_spark.queries import QUERIES

GAP_US = 1_800_000_000  # 30 min, matching the registered queries

event = st.tuples(
    st.integers(min_value=1, max_value=4),  # user_id
    # offsets in whole seconds across ~3 hours; duplicates allowed on purpose
    st.integers(min_value=0, max_value=10_800),
    st.integers(min_value=0, max_value=9),  # integer-valued "value" (exact sums)
)


def _write_events(spark, rows, scratch):
    # Schema mirrors the driver's events table; event_id is the generation
    # index so (ts, event_id) ordering is deterministic under equal ts.
    df = spark.createDataFrame(
        [
            (i, u, off, float(v))
            for i, (u, off, v) in enumerate(rows)
        ],
        "event_id long, user_id long, off long, value double",
    ).selectExpr(
        "event_id",
        "timestamp_micros(CAST(1704067200000000 + off * 1000000 AS BIGINT)) AS ts",
        "user_id",
        "'click' AS event_type",
        "value",
        "CAST(NULL AS STRING) AS props",
    )
    df.write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))


def _expected_sessions(rows):
    """Pure-Python sessionizer: sort per user by (ts, event_id), split on
    >30-min gaps, number sessions from 1."""
    per_user: dict[int, list[tuple[int, int, int]]] = {}
    for eid, (u, off, v) in enumerate(rows):
        per_user.setdefault(u, []).append((off, eid, v))
    out = {}
    for u, evs in per_user.items():
        evs.sort()
        idx = 0
        prev = None
        for off, _eid, v in evs:
            if prev is None or (off - prev) * 1_000_000 > GAP_US:
                idx += 1
                out[(u, idx)] = [1704067200 + off, 0, 0.0]
            out[(u, idx)][1] += 1
            out[(u, idx)][2] += v
            prev = off
    return {
        k: (start, n, round(s, 2)) for k, (start, n, s) in out.items()
    }


def _expected_scd2(rows):
    """Pure-Python SCD2 over a constant attribute: every user's whole
    stream collapses into ONE version (event_type never changes), opening
    at the first event and never closing."""
    firsts: dict[int, int] = {}
    for u, off, _v in rows:
        if u not in firsts or off < firsts[u]:
            firsts[u] = off
    return {(u, "click", 1704067200 + off, None) for u, off in firsts.items()}


@given(rows=st.lists(event, min_size=1, max_size=40))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_matches_python_oracle(spark, rows):
    scratch = tempfile.mkdtemp(prefix="aig_prop_sess_")
    _write_events(spark, rows, scratch)
    got = {
        (r.user_id, r.session_idx): (r.session_start_epoch, r.n_events, r.sum_value)
        for r in QUERIES["sessionize_events_batch"](spark, scratch).collect()
    }
    assert got == _expected_sessions(rows)


@given(rows=st.lists(event, min_size=1, max_size=40))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_single_attribute_collapses(spark, rows):
    scratch = tempfile.mkdtemp(prefix="aig_prop_scd2_")
    _write_events(spark, rows, scratch)
    got = {
        (r.user_id, r.event_type, r.valid_from_epoch, r.valid_to_epoch)
        for r in QUERIES["scd2_user_event_history"](spark, scratch).collect()
    }
    assert got == _expected_scd2(rows)


typed_event = st.tuples(
    st.integers(min_value=1, max_value=4),             # user_id
    st.integers(min_value=0, max_value=600),           # offset seconds
    st.sampled_from(["signup", "click", "purchase", "view"]),
)


def _write_typed_events(spark, rows, scratch):
    df = spark.createDataFrame(
        [(i, u, off, t) for i, (u, off, t) in enumerate(rows)],
        "event_id long, user_id long, off long, event_type string",
    ).selectExpr(
        "event_id",
        "timestamp_micros(CAST(1704067200000000 + off * 1000000 AS BIGINT)) AS ts",
        "user_id",
        "event_type",
        "CAST(1.0 AS DOUBLE) AS value",
        "CAST(NULL AS STRING) AS props",
    )
    df.write.mode("overwrite").parquet(os.path.join(scratch, "events.parquet"))


def _expected_funnel(rows):
    """Pure-Python strictly-ordered funnel: min signup, then min click
    strictly after it, then min purchase strictly after that."""
    per_user: dict[int, list[tuple[int, str]]] = {}
    for u, off, t in rows:
        per_user.setdefault(u, []).append((off, t))
    s1 = s2 = s3 = 0
    for evs in per_user.values():
        sign = [o for o, t in evs if t == "signup"]
        if not sign:
            continue
        s1 += 1
        t1 = min(sign)
        clicks = [o for o, t in evs if t == "click" and o > t1]
        if not clicks:
            continue
        s2 += 1
        t2 = min(clicks)
        purch = [o for o, t in evs if t == "purchase" and o > t2]
        if purch:
            s3 += 1
    return {"signup": s1, "click_after_signup": s2, "purchase_after_click": s3}


@given(rows=st.lists(typed_event, min_size=1, max_size=50))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_funnel_matches_python_oracle(spark, rows):
    scratch = tempfile.mkdtemp(prefix="aig_prop_funnel_")
    _write_typed_events(spark, rows, scratch)
    got = {
        r.stage: r.n_users
        for r in QUERIES["funnel_conversion_events"](spark, scratch).collect()
    }
    assert got == _expected_funnel(rows)


@given(rows=st.lists(event, min_size=1, max_size=40))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_retention_matches_python_oracle(spark, rows):
    scratch = tempfile.mkdtemp(prefix="aig_prop_ret_")
    _write_events(spark, rows, scratch)
    # Pure-Python retention: cohort = first-event epoch-day // 7 per user;
    # offset = (event day - cohort day) // 7; count distinct users.
    firsts: dict[int, int] = {}
    for u, off, _v in rows:
        day = (1704067200 + off) // 86400
        if u not in firsts or day < firsts[u]:
            firsts[u] = day
    expect: dict[tuple[int, int], set] = {}
    for u, off, _v in rows:
        day = (1704067200 + off) // 86400
        key = (firsts[u] // 7, (day - firsts[u]) // 7)
        expect.setdefault(key, set()).add(u)
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in QUERIES["retention_cohorts_events"](spark, scratch).collect()
    }
    assert got == {k: len(v) for k, v in expect.items()}


def test_cusum_matches_naive(spark, sf_dir):
    """The scaled CUSUM path must equal n*cumsum - i*total recomputed
    driver-side from the same daily series, and the emitted top-10 must
    be the true top-10 by |S| with the date tie-break."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.queries.analytic_queries import (
        cusum_changepoint_orders,
    )
    from app_insights_generator_spark.queries import _exact as _x
    from app_insights_generator_spark.sources import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"
            ).alias("day_idx")
        )
        .agg(
            F.expr(
                f"CAST(SUM({_x.sql_cents('o_totalprice')}) AS BIGINT) DIV 10000"
            ).alias("x")
        )
        .orderBy("day_idx")
        .collect()
    )
    n = len(daily)
    total = sum(r.x for r in daily)
    cum = 0
    s = []
    for i, r in enumerate(daily, start=1):
        cum += r.x
        s.append((r.day_idx, n * cum - i * total))
    expect = sorted(s, key=lambda t: (-abs(t[1]), t[0]))[:10]
    got = [
        (r.day_idx, r.cusum_scaled)
        for r in cusum_changepoint_orders(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == expect


def test_discrete_hazard_life_table_invariants(spark, sf_dir):
    """Life-table identities: risk sets telescope (n_risk(d) =
    n_risk(next) + d_d + c_d reading days ascending), the largest day's
    risk set equals its own counts, total users = sum of events +
    censored, and hazards stay in [0, 10000]."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.queries.events_queries import (
        discrete_hazard_events,
    )
    from app_insights_generator_spark.sources import load_table

    rows = sorted(
        discrete_hazard_events(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows, "hazard table empty"
    n_signup = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_events + r.n_censored for r in rows) == n_signup
    assert rows[0].n_risk == n_signup
    for a, b in zip(rows, rows[1:]):
        assert a.n_risk == b.n_risk + a.n_events + a.n_censored
    last = rows[-1]
    assert last.n_risk == last.n_events + last.n_censored
    for r in rows:
        assert 0 <= r.hazard_bp <= 10000
        assert r.hazard_bp == r.n_events * 10000 // r.n_risk


def test_rfm_grid_partitions_customers(spark, sf_dir):
    """Every active customer lands in exactly one RFM cell; quintile
    sizes follow NTILE's even-with-remainder rule on each axis."""
    from pyspark.sql import functions as F

    from app_insights_generator_spark.queries.analytic_queries import (
        rfm_segments_customers,
    )
    from app_insights_generator_spark.sources import load_table

    rows = rfm_segments_customers(spark, sf_dir).collect()
    n_active = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_active
    for axis in ("r", "f", "m"):
        per = {}
        for row in rows:
            per[getattr(row, axis)] = per.get(getattr(row, axis), 0) + row.n_customers
        assert set(per) <= {1, 2, 3, 4, 5}
        q, rem = divmod(n_active, 5)
        assert sorted(per.values(), reverse=True) == sorted(
            [q + 1] * rem + [q] * (5 - rem), reverse=True
        )


def test_abc_classes_partition_and_shares(spark, sf_dir):
    from app_insights_generator_spark.queries.analytic_queries import (
        abc_classification_parts,
    )

    rows = {r.cls: r for r in abc_classification_parts(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r.rev_cents for r in rows.values())
    # A holds the largest revenue share; floor shares sum to <= 10000
    assert rows["A"].rev_cents > rows["B"].rev_cents > rows["C"].rev_cents
    assert 9997 <= sum(r.share_bp for r in rows.values()) <= 10000
    assert rows["A"].share_bp <= 8000  # cum*100 <= 80*total is a floor rule
    for r in rows.values():
        assert r.share_bp == r.rev_cents * 10000 // total


def test_zipf_head_is_sorted_and_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from app_insights_generator_spark.operators import text as T
    from app_insights_generator_spark.queries.analytic_queries import (
        zipf_rank_frequency_documents,
    )
    from app_insights_generator_spark.sources import load_table

    rows = sorted(
        zipf_rank_frequency_documents(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.n >= b.n for a, b in zip(rows, rows[1:]))
    true_counts = dict(
        load_table(spark, sf_dir, "documents")
        .select(F.explode(T.tokens(T.normalized_text(F.col("text")))).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    for r in rows:
        assert true_counts[r.term] == r.n
        assert r.rank_times_n == r.rank * r.n


def test_weighted_median_matches_python_recompute(spark, sf_dir):
    """Lower weighted median must equal the brute-force definition:
    smallest value whose cumulative weight reaches half the total."""
    from collections import defaultdict

    from app_insights_generator_spark.queries.analytic_queries import (
        weighted_median_lineitem,
    )
    from app_insights_generator_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").collect()
    groups = defaultdict(lambda: defaultdict(int))
    for r in li:
        cents = round(r.l_extendedprice * 100)
        groups[r.l_returnflag][cents] += round(r.l_quantity)
    got = {r.flag: r for r in weighted_median_lineitem(spark, sf_dir).collect()}
    for flag, wmap in groups.items():
        tw = sum(wmap.values())
        cw = 0
        for cents in sorted(wmap):
            cw += wmap[cents]
            if 2 * cw >= tw:
                break
        assert got[flag].wmedian_cents == cents
        assert got[flag].total_weight == tw

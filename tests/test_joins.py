"""asof_join operator semantics (operators/joins.py): backward match,
exact-timestamp match, no-match NULL, tolerance cutoff."""

import datetime as dt

from pyspark.sql import functions as F

from app_insights_generator_spark.operators.joins import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, _ts(5), "t1"), (1, _ts(20), "t2"), (2, _ts(10), "t3"), (3, _ts(1), "t4")],
        ["key", "ts", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(20), 150.0), (2, _ts(11), 300.0)],
        ["key", "ts", "quote"],
    )
    return trades, quotes


def test_backward_match_and_exact_and_missing(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on=["key"], left_ts="ts", right_ts="ts", value_cols=["quote"])
    got = {r.trade_id: r.quote_asof for r in out.collect()}
    assert got == {
        "t1": 100.0,  # backward: quote at 10:00 <= 10:05
        "t2": 150.0,  # exact timestamp match allowed
        "t3": None,   # only later quote exists for key 2
        "t4": None,   # no quotes at all for key 3
    }


def test_tolerance_cutoff(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, on=["key"], left_ts="ts", right_ts="ts",
        value_cols=["quote"], tolerance="2 MINUTE",
    )
    got = {r.trade_id: r.quote_asof for r in out.collect()}
    # t1's only candidate (10:00) is 5 min old -> outside 2-min tolerance
    assert got == {"t1": None, "t2": 150.0, "t3": None, "t4": None}


def test_left_rows_preserved(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on=["key"], left_ts="ts", right_ts="ts", value_cols=["quote"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"key", "ts", "trade_id", "quote_asof"}


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from app_insights_generator_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) / max(r.exact, 1) < 0.05


def test_interval_overlap_join_semantics(spark):
    """Constructed intervals: closed-end overlap, bucket-spanning
    intervals deduped to one pair, key isolation, non-overlap excluded."""
    from app_insights_generator_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 10, 100, 200),   # overlaps b10 (end-touch), b11; not b12
         (1, 11, 5000, 9000), # spans many buckets with b13 -> must dedup
         (2, 20, 100, 200)],  # same span, other key: only matches b20
        ["k", "aid", "s", "e"],
    )
    b = spark.createDataFrame(
        [(1, 10, 200, 300),    # touches a10 at 200 (closed ends)
         (1, 11, 150, 160),    # inside a10
         (1, 12, 201, 300),    # just past a10
         (1, 13, 4000, 10000), # spans buckets with a11
         (2, 20, 0, 100)],
        ["k", "bid", "s", "e"],
    )
    out = {
        (r.aid, r.bid)
        for r in interval_overlap_join(
            a, b, "s", "e", "b_s", "b_e", keys=["k"], bucket_width=1000
        ).collect()
    }
    assert out == {(10, 10), (10, 11), (11, 13), (20, 20)}
    # dedup check: the multi-bucket pair (11, 13) appears exactly once
    rows = interval_overlap_join(
        a, b, "s", "e", "b_s", "b_e", keys=["k"], bucket_width=1000
    ).collect()
    assert len(rows) == len(out)


def test_interval_overlap_join_preserves_duplicate_rows(spark):
    """True theta-join cardinality: two IDENTICAL rows in `a` overlapping
    one `b` row must yield two output rows (pair-identity dedupe, not
    whole-row distinct), and map-typed payload columns must survive."""
    from app_insights_generator_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 100, 200, {"m": 1}), (1, 100, 200, {"m": 1}), (1, 500, 600, {"m": 2})],
        "k int, s int, e int, payload map<string,int>",
    )
    b = spark.createDataFrame(
        [(1, 150, 160), (1, 150, 2000)], "k int, s int, e int"
    )
    rows = interval_overlap_join(
        a, b, "s", "e", "b_s", "b_e", keys=["k"], bucket_width=100
    ).collect()
    # dup a-row overlaps both b rows (2x2=4) + the distinct a-row overlaps
    # only the long b interval (1) = 5 pairs total.
    assert len(rows) == 5
    assert sum(1 for r in rows if r.s == 100) == 4
    assert all(isinstance(r.payload, dict) for r in rows)


def test_interval_overlap_join_matches_bruteforce_property(spark):
    """Property check: on a randomized interval corpus the bucketed join
    emits EXACTLY the brute-force overlap set, for bucket widths far
    smaller and far larger than the interval lengths."""
    import random

    rng = random.Random(11)
    a_rows = [
        (k, i, s, s + rng.randrange(0, 5000))
        for i in range(120)
        for k, s in [(rng.randrange(3), rng.randrange(100_000))]
    ]
    b_rows = [
        (k, i, s, s + rng.randrange(0, 5000))
        for i in range(120)
        for k, s in [(rng.randrange(3), rng.randrange(100_000))]
    ]
    truth = {
        (ak, ai, bi)
        for ak, ai, as_, ae in a_rows
        for bk, bi, bs, be in b_rows
        if ak == bk and as_ <= be and bs <= ae
    }
    from app_insights_generator_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(a_rows, ["k", "aid", "s", "e"])
    b = spark.createDataFrame(b_rows, ["k", "bid", "s", "e"])
    for width in (100, 1000, 50_000):
        got = {
            (r.k, r.aid, r.bid)
            for r in interval_overlap_join(
                a, b, "s", "e", "b_s", "b_e", keys=["k"], bucket_width=width
            ).collect()
        }
        assert got == truth, f"width={width}: {len(got)} vs {len(truth)}"


def test_grid_colocation_counts_match_naive_theta_join(spark, sf_dir):
    """The aggregate-then-join co-location counts must equal the naive
    per-pair theta join (|dx|<=1 AND |dy|<=1) — the scalable form may
    never drop or double-count a neighbor pair. Run at sf0.001 where the
    quadratic naive form is free."""
    from app_insights_generator_spark.queries.relational_queries import (
        _GRID_X,
        grid_colocation_customer_supplier,
    )
    from app_insights_generator_spark.sources import load_table

    from pyspark.sql import functions as F

    got = {
        (r.x_grid, r.y_grid): r.n_nearby_pairs
        for r in grid_colocation_customer_supplier(spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer").select(
        F.expr(_GRID_X.format(bal="c_acctbal", div="DIV")).alias("cx"),
        F.col("c_nationkey").cast("long").alias("cy"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.expr(_GRID_X.format(bal="s_acctbal", div="DIV")).alias("sx"),
        F.col("s_nationkey").cast("long").alias("sy"),
    )
    naive = (
        cust.crossJoin(supp)
        .filter(
            (F.abs(F.col("cx") - F.col("sx")) <= 1)
            & (F.abs(F.col("cy") - F.col("sy")) <= 1)
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    truth = {(r.cx, r.cy): r.n for r in naive.collect()}
    for cell, n in truth.items():
        assert got.get(cell) == n, (cell, got.get(cell), n)
    for cell, n in got.items():
        if n:
            assert truth.get(cell) == n, (cell, n)


def test_morton_cell_is_bit_interleave(spark):
    """Morton id must equal the reference bit-interleave for every cell in
    the 6-bit range."""
    from app_insights_generator_spark.queries.relational_queries import _morton_sql

    from pyspark.sql import functions as F

    def py_morton(x: int, y: int) -> int:
        m = 0
        for i in range(6):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m

    df = (
        spark.range(64)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(64).select(F.col("id").alias("y")))
        .select("x", "y", F.expr(_morton_sql("x", "y", 6, "DIV")).alias("m"))
    )
    for r in df.collect():
        assert r.m == py_morton(r.x, r.y), (r.x, r.y, r.m)

"""Custom Python DataSource (sources/pysource.py): split planning, batch
read correctness, and the streaming reader's batch-twin equality."""

from app_insights_generator_spark.sources.pysource import (
    register_synthetic_events,
)


def _batch(spark, **opts):
    register_synthetic_events(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_split_planning(spark):
    df = _batch(spark, n_rows=1000, n_partitions=5)
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 1000
    byid = {r.event_id: r for r in rows}
    assert byid[7].user_id == 7 and byid[7].event_type == "purchase"
    assert byid[300].amount_cents == (300 * 37) % 10_000


def test_streaming_read_equals_batch_twin(spark, tmp_path):
    register_synthetic_events(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 500)
        .option("batch_rows", 128)  # -> 4 microbatches, last one short
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysource_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        tuple(r) for r in spark.table("pysource_stream").collect()
    }
    want = {tuple(r) for r in _batch(spark, n_rows=500).collect()}
    assert got == want and len(got) == 500


def test_jsonl_writer_two_phase_commit(spark, tmp_path):
    """Python DataSource WRITER: per-task temp files + driver-side
    commit-rename + _SUCCESS manifest. Round-trip through spark.read.json
    must preserve every row, and the manifest row count must match."""
    import json
    import os

    from app_insights_generator_spark.sources.pysource import register_jsonl_dir

    register_jsonl_dir(spark)
    out = str(tmp_path / "sink")
    df = spark.range(1000).selectExpr(
        "id AS k", "id % 7 AS grp", "CAST(id * 3 AS DOUBLE) AS v"
    ).repartition(4)
    df.write.format("jsonl_dir").mode("overwrite").save(out)

    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    parts = [f for f in files if f.startswith("part-") and f.endswith(".jsonl")]
    assert len(parts) == 4 and not [f for f in files if f.startswith("_tmp-")]
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert json.load(f)["n_rows"] == 1000

    back = spark.read.json(out)
    assert back.count() == 1000
    got = {(r.k, r.grp, r.v) for r in back.collect()}
    want = {(r.k, r.grp, r.v) for r in df.collect()}
    assert got == want


def test_jsonl_writer_append_preserves_prior_job(spark, tmp_path):
    """mode('append') must ADD to the directory: part names are unique per
    job (no rename-clobber of the previous job's part-00000…) and the
    _SUCCESS manifest merges to the directory total (r05 ADVICE: both
    were silently wrong before — append overwrote files and undercounted
    the manifest)."""
    import json
    import os

    from app_insights_generator_spark.sources.pysource import register_jsonl_dir

    register_jsonl_dir(spark)
    out = str(tmp_path / "sink")
    spark.range(0, 100).selectExpr("id AS k").repartition(2).write.format(
        "jsonl_dir"
    ).mode("overwrite").save(out)
    spark.range(100, 250).selectExpr("id AS k").repartition(2).write.format(
        "jsonl_dir"
    ).mode("append").save(out)

    parts = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(parts) == 4, parts
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert json.load(f)["n_rows"] == 250
    back = spark.read.json(out)
    assert back.count() == 250
    assert {r.k for r in back.collect()} == set(range(250))


def test_batch_read_edge_options(spark):
    import pytest

    assert _batch(spark, n_rows=0).count() == 0
    with pytest.raises(Exception, match="n_rows"):
        _batch(spark, n_rows=-5).collect()


def test_push_filters_narrow_bounds_and_residual():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
        LessThanOrEqual,
        StringStartsWith,
    )

    from app_insights_generator_spark.sources.pysource import PushdownEventsReader

    r = PushdownEventsReader({"n_rows": "1000000", "n_partitions": "8"})
    keep_type = StringStartsWith(("event_type",), "v")  # not pushable
    not_null = IsNotNull(("event_id",))  # right column, unsupported op
    rest = r.pushFilters(
        [
            GreaterThanOrEqual(("event_id",), 100),
            GreaterThan(("event_id",), 100),  # tighter: lo = 101
            LessThan(("event_id",), 500),
            LessThanOrEqual(("event_id",), 600),  # looser: hi stays 500
            keep_type,
            not_null,
        ]
    )
    assert (r.lo, r.hi) == (101, 500)
    # residuals returned by reference, pushed ones absent
    assert list(rest) == [keep_type, not_null]
    # split planning covers exactly the narrowed range
    splits = r.partitions()
    assert splits[0].start == 101 and splits[-1].end == 500
    assert sum(s.end - s.start for s in splits) == 399

    # EqualTo pins a single row; contradictory bounds plan one empty split
    r2 = PushdownEventsReader({"n_rows": "100"})
    r2.pushFilters([EqualTo(("event_id",), 7)])
    assert (r2.lo, r2.hi) == (7, 8)
    r3 = PushdownEventsReader({"n_rows": "100"})
    r3.pushFilters([GreaterThan(("event_id",), 50), LessThan(("event_id",), 10)])
    assert [(s.start, s.end) for s in r3.partitions()] == [(50 + 1, 50 + 1)]


def test_pushdown_e2e_matches_unpushed(spark):
    key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(key, None)
    pred = "event_id >= 999990 AND event_id < 999998 AND user_id % 2 = 0"
    try:
        spark.conf.set(key, "true")
        pushed = _batch(spark, n_rows=1_000_000, pushdown="true").filter(pred).collect()
        # residual plan must not contain the consumed range predicate
        plan = (
            _batch(spark, n_rows=1_000_000, pushdown="true")
            .filter(pred)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "999990" not in plan and "999998" not in plan
        spark.conf.set(key, "false")
        unpushed = _batch(spark, n_rows=1_000_000).filter(pred).collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert sorted(map(tuple, pushed)) == sorted(map(tuple, unpushed))
    assert len(pushed) == 4

"""Z-order clustered sink and foreachBatch streaming sink."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from app_insights_generator_spark.sources.readers import load_table
from app_insights_generator_spark.sources.writers import write_zorder, zorder_value
from app_insights_generator_spark.streaming.sinks import (
    read_foreach_batch_output,
    run_foreach_batch_to_parquet,
)


def test_zorder_value_locality(spark, sf_dir):
    """Morton index must interleave both dimensions: sorting by _zvalue
    clusters rows so that both columns' per-chunk ranges are narrow, and
    the z-value is a pure column expression (no UDF in the plan)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    z = zorder_value(li, ["l_partkey", "l_extendedprice"], bits=8)
    assert "_zvalue" in z.columns
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    rows = z.orderBy("_zvalue").select("l_partkey", "l_extendedprice").collect()
    n = len(rows)
    chunk = max(1, n // 16)
    # Mean per-chunk span must beat the global span on BOTH dimensions —
    # the property a single-column sort cannot give the second column.
    for idx, (lo_all, hi_all) in (
        (0, (min(r[0] for r in rows), max(r[0] for r in rows))),
        (1, (min(r[1] for r in rows), max(r[1] for r in rows))),
    ):
        spans = []
        for s in range(0, n, chunk):
            part = [r[idx] for r in rows[s : s + chunk]]
            spans.append(max(part) - min(part))
        mean_span = sum(spans) / len(spans)
        assert mean_span < 0.7 * (hi_all - lo_all), (
            f"dim {idx}: mean chunk span {mean_span} vs global {hi_all - lo_all}"
        )


def test_write_zorder_roundtrip(spark, sf_dir):
    """The clustered layout is a pure reordering: reading the z-ordered
    files back yields exactly the source multiset."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_returnflag"
    )
    out = os.path.join(tempfile.mkdtemp(prefix="aig_zorder_t_"), "li_z")
    write_zorder(li, out, ["l_partkey", "l_extendedprice"], num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    src_hash = li.select(F.sum(F.crc32(F.concat_ws("|", *sorted(li.columns))))).first()[0]
    dst_hash = back.select(
        F.sum(F.crc32(F.concat_ws("|", *sorted(li.columns))))
    ).first()[0]
    assert src_hash == dst_hash


def test_foreach_batch_sink_idempotent(spark, sf_dir):
    """Multi-batch drain through the foreachBatch sink reproduces the
    source exactly, and a re-run over the same checkpoint writes nothing
    new (the committed offsets make the replay a no-op)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    scratch = tempfile.mkdtemp(prefix="aig_febatch_t_")
    src = os.path.join(scratch, "src")
    sink = os.path.join(scratch, "sink")
    ckpt = os.path.join(scratch, "ckpt")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    def stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    run_foreach_batch_to_parquet(stream(), sink, ckpt)
    batches = sorted(d for d in os.listdir(sink) if d.startswith("ingest_batch="))
    assert len(batches) >= 2, batches

    back = read_foreach_batch_output(spark, sink, schema=ev.schema)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(
        F.sum("event_id")
    ).first()[0]

    # Replay with the same checkpoint: all files already committed -> no
    # new batch directories, row count unchanged.
    run_foreach_batch_to_parquet(stream(), sink, ckpt)
    batches2 = sorted(d for d in os.listdir(sink) if d.startswith("ingest_batch="))
    assert batches2 == batches
    assert read_foreach_batch_output(spark, sink, schema=ev.schema).count() == ev.count()


def test_dropmalformed_on_isolated_fixture(spark):
    """DROPMALFORMED must silently drop exactly the malformed lines.
    Parser column pruning is disabled for the read: with pruning on, a
    bare count parses no columns and detects nothing (the classic CSV
    silent-count gotcha) — which is why the oracle gate pins PERMISSIVE
    accounting and this behavior lives here on an isolated fixture."""
    import os
    import tempfile

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    d = tempfile.mkdtemp(prefix="aig_dropmal_")
    good = ["1,alpha,10", "2,beta,20", "3,gamma,30"]
    bad = [
        "not_an_int,BROKEN,xx",
        "1,TOO,MANY,FIELDS,HERE",
        "999999999999999999999999999,overflow,1",
        '"unterminated,quote,2',
    ]
    with open(os.path.join(d, "data.csv"), "w") as f:
        f.write("\n".join(good + bad) + "\n")
    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", StringType()),
            StructField("c", IntegerType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    key = "spark.sql.csv.parser.columnPruning.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        kept = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(d).collect()
    finally:
        spark.conf.set(key, prev)
    assert sorted(r.a for r in kept) == [1, 2, 3], kept


def test_compact_refuses_partitioned_layout(spark, sf_dir):
    """Compacting a Hive-partitioned directory would flatten the partition
    column into the data files and silently destroy partition pruning —
    the operator must refuse and direct callers to the partition leaves."""
    import pytest as _pytest

    from app_insights_generator_spark.sources.writers import compact_parquet_dir

    d = tempfile.mkdtemp(prefix="aig_compact_part_")
    load_table(spark, sf_dir, "nation").write.partitionBy("n_regionkey").mode(
        "overwrite"
    ).parquet(d)
    with _pytest.raises(ValueError, match="partition"):
        compact_parquet_dir(spark, d)

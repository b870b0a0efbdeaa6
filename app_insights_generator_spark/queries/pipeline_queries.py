"""Source/sink and end-to-end pipeline queries (SURVEY.md §2 O1/O2/O17/O20).

These exercise the CSV reader/writer and the full extract_data pipeline
under the driver's oracle gate: each query materializes real files under a
scratch directory, reads them back, and returns the re-read DataFrame, so
the round-trip itself is what gets hash-compared.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from app_insights_generator_spark.pipeline import extract_data
from app_insights_generator_spark.queries import register
from app_insights_generator_spark.queries.insights_queries import (
    ORDERS_CFG,
    _SWEEP_ORACLE,
)
from app_insights_generator_spark.sources import load_table
from app_insights_generator_spark.sources.readers import read_csv, read_json
from app_insights_generator_spark.sources.writers import write_csv, write_json


def _scratch(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"aig_{tag}_")


@register(
    "csv_roundtrip_nation",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round-trip (reference write_to_csv main.py:241-256
    and read_csv_file main.py:221-238): write `nation` as headered CSV,
    read it back with the original schema (explicit schema, not
    inferSchema — schema inference is a second full scan at 100 TB)."""
    nation = load_table(spark, sf_dir, "nation")
    out = os.path.join(_scratch("csv_nation"), "nation_csv")
    write_csv(nation, out, header=True, mode="overwrite")
    return read_csv(spark, out, header=True, schema=nation.schema)


@register(
    "json_roundtrip_part",
    "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part",
)
def json_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round-trip: write `part` as JSON, read it
    back with the original schema (explicit schema — JSON schema inference
    is a full extra scan at 100 TB, same stance as the CSV path)."""
    part = load_table(spark, sf_dir, "part")
    out = os.path.join(_scratch("json_part"), "part_json")
    write_json(part, out, mode="overwrite")
    return read_json(spark, out, schema=part.schema)


@register("binaryfile_source_media")  # rows-only: file-system source, no SQL twin
def binaryfile_source_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source (SURVEY.md §2.2 "sources beyond CSV"): the
    multimodal ingestion path — opaque media files land as (path, length,
    content) rows. Writes the first 50 documents as .bin files, reads them
    back via the binaryFile reader, and verifies content integrity by
    sha. At 100 TB this source partitions by file, so metadata predicates
    (pathGlobFilter, modifiedAfter) prune without reading payloads."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).collect()
    scratch = _scratch("binfiles")
    for r in docs:
        with open(os.path.join(scratch, f"doc_{r.doc_id:05d}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    expected = {
        f"doc_{r.doc_id:05d}.bin": hashlib.sha256(r.text.encode("utf-8")).hexdigest()
        for r in docs
    }
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(scratch)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length"),
            F.sha2("content", 256).alias("content_sha"),
        )
    )
    rows = {r.file_name: r.content_sha for r in bf.collect()}
    assert rows == expected, "binaryFile round-trip mismatch"
    return bf.orderBy("file_name")


@register("pipeline_extract_orders", _SWEEP_ORACLE)
def pipeline_extract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extract_data pipeline (reference main.py:363-404): orders
    exported to CSV, then CSV scan -> bucket -> native grouping-sets sweep
    -> CSV write -> re-read. Oracled by the same sweep SQL as the in-memory
    sweep queries, proving file-boundary fidelity end to end."""
    scratch = _scratch("pipeline")
    csv_in = os.path.join(scratch, "orders_csv")
    csv_out = os.path.join(scratch, "insights_csv")
    base = (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_orderyear", F.year("o_orderdate"))
        .select("o_orderstatus", "o_orderpriority", "o_totalprice", "o_orderyear")
    )
    write_csv(base, csv_in, header=True, mode="overwrite")
    return extract_data(spark, csv_in, csv_out, ORDERS_CFG, mode="native")


@register("pipeline_extract_orders_loop", _SWEEP_ORACLE)
def pipeline_extract_orders_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful-loop pipeline variant: batched append writes into
    `<out>_partitioned` plus the reference's two-phase compaction merge
    (main.py:391-393), oracled by the same sweep SQL."""
    scratch = _scratch("pipeline_loop")
    csv_in = os.path.join(scratch, "orders_csv")
    csv_out = os.path.join(scratch, "insights_csv")
    base = (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_orderyear", F.year("o_orderdate"))
        .select("o_orderstatus", "o_orderpriority", "o_totalprice", "o_orderyear")
    )
    write_csv(base, csv_in, header=True, mode="overwrite")
    return extract_data(spark, csv_in, csv_out, ORDERS_CFG, mode="loop", batch_size=8)

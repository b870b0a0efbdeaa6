"""Sources: parquet / CSV / JSON readers.

The reference supports only CSV with driver-side options (main.py:221-238;
its ``numPartitions`` option is a no-op for CSV — dropped here). The rebuild
reads columnar parquet first (vectorized scan + predicate pushdown + column
pruning are free), with CSV/JSON kept for parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"

# events.ts is written as parquet TIMESTAMP(NANOS) which Spark's reader
# rejects; with nanosAsLong it arrives as a raw ns-epoch long. Integer DIV
# (not float division — ns epochs exceed double's 53-bit mantissa) converts
# to microseconds, matching DuckDB's own ns->us truncation exactly.
_NS_TIMESTAMP_COLS = {"events": ("ts",)}


def normalize_ns_long_to_timestamp(df: DataFrame, col: str) -> DataFrame:
    """Convert a raw ns-epoch long (a TIMESTAMP(NANOS) column arrived under
    ``nanosAsLong``) to a microsecond timestamp; a no-op when the column
    already arrived as a timestamp (e.g. plain timestamp[us] files). The
    dtype guard is load-bearing: applying ``DIV 1000`` to an already-µs
    value would shrink every instant 1000×. Shared by the batch and
    streaming readers so both paths stay unit-correct for either encoding."""
    if col in df.columns and dict(df.dtypes)[col] == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated table from ``{sf_dir}/{name}.parquet``."""
    spark.conf.set(_NANOS_AS_LONG, "true")
    # Pin UTC so date_format/year()/unix_timestamp render stored instants
    # identically to DuckDB's naive-timestamp functions, whatever the host tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NS_TIMESTAMP_COLS.get(name, ()):
        df = normalize_ns_long_to_timestamp(df, col)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TPCH_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = False,
    infer_schema: bool = False,
    schema: StructType | None = None,
) -> DataFrame:
    """CSV source (reference read_csv_file, main.py:221-238).

    Prefer an explicit ``schema``: ``inferSchema`` costs a full extra pass
    over the data — at 100 TB that's a second 100 TB scan before the job
    even starts.
    """
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)

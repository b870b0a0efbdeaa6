"""Schema & profile drift report between two versions of a dataset.

The ingest-pipeline guardrail: before a new dump replaces the old one,
diff the schemas (added / removed / type-changed columns) and the
per-column profiles (null rate, distinct count) so silent upstream
changes fail loudly instead of corrupting downstream features. All
metrics are integers (basis points via floor division, exact distinct
counts), so the report is engine-deterministic.

Scale: ONE aggregate pass per side computes every per-column metric
(null counts and distinct counts in the same job); only the two 1-row
aggregate results ever reach the driver (bounded by column count, the
same scalar-only discipline as the sketch/convergence collects). At
100 TB swap ``exact_ndv=False`` to ride approx_count_distinct's
mergeable HLL sketches instead of exact COUNT(DISTINCT) expansion —
the report shape is identical.

Reference parity: the reference (main.py) has no profiling surface;
§2.4 engine-extension alongside dq_report / cbo_stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

REPORT_SCHEMA = StructType(
    [
        StructField("col", StringType(), False),
        StructField("status", StringType(), False),
        StructField("null_bp_old", LongType(), True),
        StructField("null_bp_new", LongType(), True),
        StructField("ndv_old", LongType(), True),
        StructField("ndv_new", LongType(), True),
    ]
)


def _profile(df: DataFrame, exact_ndv: bool) -> dict[str, tuple[int, int]]:
    """{column: (null_bp, ndv)} from one aggregate pass."""
    ndv_fn = F.countDistinct if exact_ndv else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(ndv_fn(F.col(c)).alias(f"_ndv_{c}"))
    row = df.agg(*aggs).first()
    n = row["_n"]
    out = {}
    for c in df.columns:
        nulls = row[f"_null_{c}"] or 0
        out[c] = (nulls * 10000 // n if n else 0, row[f"_ndv_{c}"])
    return out


def schema_drift(
    old: DataFrame, new: DataFrame, exact_ndv: bool = True
) -> DataFrame:
    """Per-column drift report -> [col, status, null_bp_old, null_bp_new,
    ndv_old, ndv_new]; status in {kept, added, removed, type_changed},
    metrics NULL on the side where the column does not exist."""
    old_types = dict(old.dtypes)
    new_types = dict(new.dtypes)
    p_old = _profile(old, exact_ndv)
    p_new = _profile(new, exact_ndv)
    rows = []
    for c in sorted(set(old_types) | set(new_types)):
        if c not in new_types:
            status = "removed"
        elif c not in old_types:
            status = "added"
        elif old_types[c] != new_types[c]:
            status = "type_changed"
        else:
            status = "kept"
        bp_o, ndv_o = p_old.get(c, (None, None))
        bp_n, ndv_n = p_new.get(c, (None, None))
        rows.append((c, status, bp_o, bp_n, ndv_o, ndv_n))
    spark = SparkSession.getActiveSession() or old.sparkSession
    return spark.createDataFrame(rows, REPORT_SCHEMA)

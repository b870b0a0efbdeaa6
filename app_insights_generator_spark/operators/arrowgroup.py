"""Arrow-native grouped map: ``groupBy().applyInArrow`` (SPARK-46253).

The zero-pandas sibling of applyInPandas: each key group crosses the
Python boundary as a ``pyarrow.Table`` and the function returns one —
no pandas materialization, no numpy copy, so per-group logic that is
already columnar (histograms, value_counts, min/max scans) runs on the
Arrow buffers Spark transferred. Same execution shape as applyInPandas
(one shuffle on the key, group-at-a-time workers, state bounded by the
largest group), one serialization layer cheaper.

Used for the per-group ADAPTIVE histogram: bin width derives from each
group's own min/max, so the binning is two-pass-per-group — expressible
in SQL only via an extra window/join pass over the fact table, but a
single columnar scan here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

HIST_SCHEMA = "source string, bin long, bin_lo long, n_docs long"

_N_BINS = 10


def _group_histogram(table: pa.Table) -> pa.Table:
    """10-bin equal-width histogram of n_chars with per-group integer bin
    width ((max-min) DIV 10 + 1 — always >= 1, so constant groups land
    in bin 0). All arithmetic int64; matches the SQL oracle bit-for-bit."""
    n = table.column("n_chars")
    mm = pc.min_max(n).as_py()
    lo, hi = mm["min"], mm["max"]
    width = (hi - lo) // _N_BINS + 1
    bins = pc.divide(pc.subtract(n, pa.scalar(lo, pa.int64())), pa.scalar(width, pa.int64()))
    counts = bins.combine_chunks().value_counts()
    bin_vals = counts.field("values")
    source = table.column("source")[0].as_py()
    return pa.table(
        {
            "source": pa.array([source] * len(counts), pa.string()),
            "bin": bin_vals.cast(pa.int64()),
            "bin_lo": pc.add(
                pa.scalar(lo, pa.int64()),
                pc.multiply(bin_vals.cast(pa.int64()), pa.scalar(width, pa.int64())),
            ),
            "n_docs": counts.field("counts").cast(pa.int64()),
        }
    )


def adaptive_histogram_by_source(docs: DataFrame) -> DataFrame:
    """Per-source adaptive histogram of document lengths; ``docs`` needs
    (source, n_chars)."""
    return docs.groupBy("source").applyInArrow(_group_histogram, schema=HIST_SCHEMA)

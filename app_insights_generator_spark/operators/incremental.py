"""Incremental aggregate maintenance via mergeable partial-aggregate states.

The 100 TB discipline this encodes: a nightly/continuous pipeline must
never re-scan the historical base to refresh an aggregate — it keeps a
compact per-group STATE table (count / sum / min / max are all mergeable:
merge(state(A), state(B)) == state(A ∪ B), the same algebra Spark's own
partial aggregation exploits map-side), aggregates only the new batch,
and merges the two state tables with a group-by over their concatenation.
Cost per refresh is O(|delta| + |groups|), independent of base size.

AVG and other ratios are NOT stored — they are derived at read time from
the exact sum and count (a stored average is not mergeable; this is the
classic incremental-view-maintenance mistake). Money sums ride the
integer-cents fast path (queries/_exact.py), so merged totals are exact
and engine-deterministic.

Reference parity: the reference (main.py) recomputes every run; this is
§2.4 engine-extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: measure kind -> (state aggregator, merge aggregator). count merges by
#: SUM; sum/min/max merge with themselves (semigroup ops).
_KINDS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, Column | None]],
) -> DataFrame:
    """Per-group mergeable state: ``measures`` maps output column name to
    (kind, column) with kind in {count, sum, min, max} (column ignored
    for count)."""
    aggs = []
    for name, (kind, col) in measures.items():
        if kind not in _KINDS:
            raise ValueError(f"agg_state: unmergeable kind {kind!r} for {name!r}")
        state_fn, _ = _KINDS[kind]
        aggs.append(state_fn(col).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    measures: dict[str, tuple[str, Column | None]],
) -> DataFrame:
    """Merge state tables produced by ``agg_state`` with the same spec:
    union + one group-by, never touching base rows. Associative and
    commutative, so states can be merged in any order or tree shape
    (e.g. hourly -> daily -> monthly rollup trees)."""
    if not states:
        raise ValueError("merge_states: need at least one state table")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    aggs = []
    for name, (kind, _) in measures.items():
        _, merge_fn = _KINDS[kind]
        aggs.append(merge_fn(F.col(name)).alias(name))
    return unioned.groupBy(*keys).agg(*aggs)

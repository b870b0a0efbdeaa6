"""Skew mitigation: salted two-phase aggregation and salted replicated joins.

Neither appears in the reference (its group-bys are over bucketed
low-cardinality columns, main.py:282-290, and it has no joins), but at
100 TB a single hot key — one dominant l_returnflag, one viral user_id —
turns a shuffle into a one-task straggler. Two standard cures, expressed
with built-in functions only:

- salted_groupby: split each hot group across ``salt_n`` sub-groups
  (phase 1: partial agg on (keys, salt)), then merge the sub-aggregates
  (phase 2: agg on keys). Every supported aggregate is decomposable
  (sum/count/min/max; avg = merged sum / merged count), so the result is
  IDENTICAL to a direct groupBy — the driver oracle checks that.
- salted_join: replicate the small side ``salt_n`` times and scatter the
  big side across replicas, so one hot join key fans out over salt_n
  tasks instead of one. AQE's skew-join handles sort-merge cases
  automatically; explicit salting remains the cure when AQE can't split
  (e.g., a hot key inside a single huge row-group, or deterministic
  partitioning requirements downstream).

Salt must be deterministic (driver reruns plans; persisted lineage must
reproduce), so it is derived from xxhash64 of the whole row, never rand().
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate name -> (phase-1 partial fn, phase-2 merge fn)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt_col(df: DataFrame, salt_n: int):
    return F.pmod(F.xxhash64(*df.columns), F.lit(salt_n)).cast("int")


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (agg name, input column); agg name in
    {sum, count, min, max, avg}. Result equals
    ``df.groupBy(keys).agg(...)`` exactly; the salt only reshapes the
    first shuffle so no reducer sees a whole hot group.
    """
    salted = df.withColumn("_salt", _salt_col(df, salt_n))

    partials, finals = [], []
    need_counts: set[str] = set()
    for out, (name, col) in aggs.items():
        if name == "avg":
            partials.append(F.sum(col).alias(f"_p_sum_{out}"))
            partials.append(F.count(col).alias(f"_p_cnt_{out}"))
            need_counts.add(out)
            continue
        if name not in _MERGEABLE:
            raise ValueError(f"non-decomposable aggregate: {name}")
        part_fn, merge_fn = _MERGEABLE[name]
        partials.append(part_fn(col).alias(f"_p_{out}"))
        finals.append(merge_fn(f"_p_{out}").alias(out))
    for out in need_counts:
        # Cast the merged sum to double BEFORE dividing: if the caller fed a
        # decimal column the sum is exact and one IEEE division is
        # deterministic; decimal/decimal division would instead pick up
        # engine-specific scale/rounding rules.
        finals.append(
            (F.sum(f"_p_sum_{out}").cast("double") / F.sum(f"_p_cnt_{out}")).alias(out)
        )

    phase1 = salted.groupBy(*keys, "_salt").agg(*partials)
    merged = phase1.groupBy(*keys).agg(*finals)
    # Preserve caller's output column order.
    return merged.select(*keys, *aggs.keys())


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicated-broadcast skew join: ``small`` is exploded ``salt_n``
    times (one replica per salt value), ``big`` rows scatter across
    replicas by row hash. Each big row matches exactly one replica, so the
    result is row-identical to ``big.join(small, on, how)`` while a hot
    key's probe work spreads over salt_n tasks.

    ``on`` is a Column join condition or list of key names. The replica
    factor multiplies the broadcast size — keep small × salt_n within the
    broadcast threshold. Only inner/left-ish joins are sound: an unmatched
    SMALL row exists once per replica, so right/full outer would emit it
    salt_n times.
    """
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}:
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    replicas = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    big_salted = big.withColumn("_salt", _salt_col(big, salt_n))
    if isinstance(on, (list, tuple)):
        cond = [*on, "_salt"]
    else:
        cond = on & (big_salted["_salt"] == replicas["_salt"])
    joined = big_salted.join(F.broadcast(replicas), cond, how)
    return joined.drop("_salt")

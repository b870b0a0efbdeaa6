"""Streaming per-user z-score anomaly detection (applyInPandasWithState).

The streaming twin of the batch ``anomaly_zscore_events`` gate query: each
user's state is the ring buffer of their last ``window_n`` event values;
every incoming event is scored against the buffer BEFORE being appended
(the batch query's ROWS 20 PRECEDING AND 1 PRECEDING frame), and events
with |z| > threshold are emitted. State is bounded at window_n values per
user — evictable, checkpointable, partitioned across executors by user.

Exactness contract (mirrors queries/_exact.py): event values are exact
2-decimal doubles, so the buffer is kept as INTEGER CENTS; mean/variance
are derived from the exact cent sums with the identical double algebra the
batch query uses (s = cents/100 is the decimal->double cast, ss =
cents^2-sum/1e4 the DECIMAL(…,4) cast), so a streaming z-score equals the
batch z-score bit for bit, regardless of how micro-batches accumulated
the state.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)

STATE_SCHEMA = StructType([StructField("cents", ArrayType(LongType()))])


def _make_update(window_n: int, min_n: int, z_thresh: float):
    def _update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        buf: list[int] = list(state.get[0]) if state.exists else []
        out_ids, out_vals, out_z = [], [], []
        rows = pd.concat(list(pdfs))
        # event-time order inside the batch; across batches the source's
        # arrival order is the stream's event order by contract
        rows = rows.sort_values(["ts", "event_id"])
        for eid, val in zip(rows["event_id"], rows["value"]):
            v = float(val)
            n = len(buf)
            if n >= min_n:
                s = sum(buf) / 100.0
                ss = sum(c * c for c in buf) / 10_000.0
                var = (ss - s * s / n) / (n - 1)
                if var > 0:
                    z = (v - s / n) / math.sqrt(var)
                    if abs(z) > z_thresh:
                        out_ids.append(int(eid))
                        out_vals.append(v)
                        out_z.append(z)
            buf.append(int(round(v * 100)))
            if len(buf) > window_n:
                buf = buf[-window_n:]
        state.update((buf,))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [int(user_id)] * len(out_ids),
                "value": out_vals,
                "zscore": out_z,
            }
        )

    return _update


def user_zscore_anomalies(
    events: DataFrame,
    window_n: int = 20,
    min_n: int = 10,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Flag events whose value deviates more than ``z_thresh`` standard
    deviations from the user's trailing ``window_n`` events (scored before
    insertion; needs ``min_n`` prior events). Emits
    [event_id, user_id, value, zscore]."""
    return events.select(
        "event_id", "ts", "user_id", "value"
    ).groupBy("user_id").applyInPandasWithState(
        _make_update(window_n, min_n, z_thresh),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

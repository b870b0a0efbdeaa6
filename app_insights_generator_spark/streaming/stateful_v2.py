"""Arbitrary stateful streaming via transformWithStateInPandas — the
Spark 4 replacement for applyInPandasWithState (SPARK-42931): typed state
variables (value/list/map), per-key timers, TTL, and state evolution,
instead of one opaque state tuple.

``user_type_stats`` tracks, per user, the set of DISTINCT event types
seen (MapState — insertion is O(1) per new type, no re-serialization of
the whole set the way a tuple-encoded applyInPandasWithState accumulator
requires) plus running (count, sum) totals (ValueState). This is the
shape Spark's built-in windowed aggregations cannot express: streaming
COUNT(DISTINCT) needs keyed mutable state.

Scale: state is keyed by user and partitioned across executors exactly
like applyInPandasWithState; MapState keys are event types (bounded,
small), so per-user state stays O(distinct types), not O(events).

Environment gate: transformWithStateInPandas serializes state through
protobuf on the Python workers, and this sandbox has no ``protobuf``
package — ``PROTOBUF_AVAILABLE`` is False here, the pytest coverage
skips, and callers should treat the operator as present-but-unrunnable
until the dependency exists (it is a standard pyspark[connect] extra on
a real cluster). The semantics stay covered by the SQL-oracled batch
twin ``stateful_type_stats_batch_twin_events`` and by
``user_running_totals`` (applyInPandasWithState), which needs no
protobuf and exercises the same keyed-state-store machinery.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_DDL = "user_id bigint, n_types int, n_events bigint, total_value double"

try:  # the workers need google.protobuf for state (de)serialization
    from google.protobuf import descriptor as _descriptor  # noqa: F401

    PROTOBUF_AVAILABLE = True
except ImportError:
    PROTOBUF_AVAILABLE = False


class UserTypeStats(StatefulProcessor):
    """Per-user distinct-event-type count + running totals."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState("seen_types", "event_type string", "seen boolean")
        self._totals = handle.getValueState("totals", "n bigint, total double")

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for t in pdf["event_type"]:
                if not self._seen.containsKey((t,)):
                    self._seen.updateValue((t,), (True,))
        self._totals.update((n, total))
        n_types = sum(1 for _ in self._seen.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_types": [n_types],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def user_type_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user profile: distinct event types + running totals,
    one updated row per user per micro-batch in which the user appears.
    Batch twin: ``stateful_type_stats_batch_twin_events``."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTypeStats(),
        outputStructType=OUTPUT_DDL,
        outputMode="Update",
        timeMode="None",
    )

"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): the
connector extension point users need when a system has no built-in
reader — REST feeds, proprietary binary logs, queue snapshots.

The reference hardcodes one CSV-on-S3 read (main.py:236); a complete
engine exposes the custom-source surface itself. This module registers a
deterministic synthetic-events source that demonstrates every piece a
real connector needs:

- ``schema()``      — source-declared schema (no inference pass);
- ``partitions()``  — SPLIT PLANNING: the source decides its input
  splits, so Spark schedules one task per split and a 100 TB feed reads
  with full cluster parallelism (a reader without ``partitions()`` is a
  single-task bottleneck — the classic custom-source mistake);
- ``read(split)``   — per-partition generator executed ON THE EXECUTORS,
  yielding plain tuples (Arrow-batched by the runtime).

The row content is a closed-form function of the row id, so a SQL oracle
can replay the exact feed with ``range()`` — the same trick the media
synthesizers use: the plumbing is fully real, the payload is predictable.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase", "refund", "error")


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = max(1, int(options.get("n_partitions", 8)))
        if self.n_rows < 0:
            raise ValueError(f"n_rows must be >= 0, got {self.n_rows}")
        # Generation bounds on event_id (== row index). The base reader
        # never narrows them; PushdownEventsReader's pushFilters does.
        self.lo = 0
        self.hi = self.n_rows

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi == lo:
            return [_Slice(lo, lo)]  # a valid empty split, never zero splits
        step = -(-(hi - lo) // self.n_partitions)  # ceil
        return [_Slice(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (i, i % 97, EVENT_TYPES[i % 5], (i * 37) % 10_000)


class PushdownEventsReader(SyntheticEventsReader):
    """Opt-in reader with source-side filter pushdown (Spark 4.1,
    SPARK-50849). A SEPARATE class because Spark hard-errors on ANY
    reader that merely defines pushFilters while
    spark.sql.python.filterPushdown.enabled is false — pushdown must be
    opted into per read (.option("pushdown", "true")) so the base source
    keeps working on conf-off sessions."""

    def pushFilters(self, filters):
        """Range and equality predicates on event_id tighten the [lo, hi)
        generation bounds BEFORE partitions() plans splits, so filtered
        rows are NEVER GENERATED — the Python-source equivalent of
        parquet row-group pruning, and the difference between scanning
        10^6 rows and 16 when a query wants a slice. Everything else is
        handed back to Spark (the contract: returned filters are
        evaluated post-scan and must be input objects by reference)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        rest = []
        for f in filters:
            v = getattr(f, "value", None)
            if getattr(f, "attribute", None) == ("event_id",) and isinstance(v, int):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                else:
                    rest.append(f)
                continue
            rest.append(f)
        return rest


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("n_rows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id BIGINT, user_id BIGINT, event_type STRING, "
            "amount_cents BIGINT"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return PushdownEventsReader(self.options)
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_events(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)


# --- streaming side of the same source ----------------------------------------
#
# The Python DataSource API's streaming half: offset bookkeeping +
# per-microbatch reads. The bounded synthetic feed reports `batch_rows`
# new rows per microbatch until `n_rows`, then holds its offset steady —
# so `processAllAvailable()` drains it deterministically and a batch read
# of the same options is the exact twin (pinned by tests/test_pysource.py).

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.batch_rows = max(1, int(options.get("batch_rows", 1_000)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.batch_rows, self.n_rows)
        # iter(list), not a bare generator or list: the simple-reader
        # protocol requires an ITERATOR (it probes empty batches with
        # next()) that is also PICKLABLE (prefetched rows are cached and
        # shipped) — a list_iterator is both, a generator is not.
        rows = [
            (i, i % 97, EVENT_TYPES[i % 5], (i * 37) % 10_000)
            for i in range(pos, end)
        ]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay support (failure recovery): offsets fully determine rows
        return iter(
            [
                (i, i % 97, EVENT_TYPES[i % 5], (i * 37) % 10_000)
                for i in range(int(start["pos"]), int(end["pos"]))
            ]
        )



# --- writer half: a two-phase-commit JSONL directory sink --------------------
#
# DataSourceWriter is the API's real prize: write() runs per task and
# returns a COMMIT MESSAGE; commit() runs once on the driver only after
# every task succeeded — the two-phase publish the engine's parquet
# pipeline implements by hand (pipeline.py two-phase write + swap), here
# expressed through the connector protocol itself. Tasks write to
# temp-named files; commit() renames them into place and writes a
# _SUCCESS manifest with the total row count; abort() removes the temps,
# so a failed job leaves no partial output visible.

import json as _json
import os as _os
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _JsonlCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires a path (.save(path))")
        _os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in _os.listdir(self.path):
                if f.endswith(".jsonl") or f == "_SUCCESS":
                    _os.remove(_os.path.join(self.path, f))
        # Per-job prefix: committed part files must be unique ACROSS jobs,
        # or mode('append') would rename onto the previous job's
        # part-00000… and silently clobber it (r05 ADVICE).
        self.job_id = _uuid.uuid4().hex[:12]

    def write(self, iterator) -> _JsonlCommit:
        tmp = _os.path.join(self.path, f"_tmp-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True, default=str))
                f.write("\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        total = 0
        for i, m in enumerate(m for m in messages if m is not None):
            final = _os.path.join(self.path, f"part-{self.job_id}-{i:05d}.jsonl")
            _os.replace(m.tmp_path, final)
            total += m.n_rows
        # Append mode merges the prior manifest count (overwrite deleted it
        # in __init__), so _SUCCESS always states the directory's total.
        success = _os.path.join(self.path, "_SUCCESS")
        if _os.path.exists(success):
            with open(success) as f:
                total += _json.load(f).get("n_rows", 0)
        with open(success, "w") as f:
            _json.dump({"n_rows": total}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.tmp_path):
                _os.remove(m.tmp_path)


class JsonLinesDataSource(DataSource):
    """df.write.format("jsonl_dir").mode("overwrite").save(path)"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options, overwrite)


def register_jsonl_dir(spark) -> None:
    spark.dataSource.register(JsonLinesDataSource)

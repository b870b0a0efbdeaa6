"""Shared lineage-pinning helper for the iterative / fan-out operators.

Every driver-loop fixpoint in this package (connected components, the
graph algorithms, k-means) truncates lineage once per round so the plan
stays flat, and every fan-out operator pins shared intermediates so
Catalyst doesn't recompute the subtree per consuming branch (the measured
trap in [[catalyst-traps]] / operators/dedup.py's module docstring).

``pin`` is the one place that decides HOW: ``checkpoint_dir=None`` uses
``localCheckpoint(eager=True)`` — fastest, but the pinned blocks live in
EXECUTOR storage with lineage truncated, so on a real cluster an executor
loss (including dynamic-allocation decommission) makes them unrecoverable
and fails the job. Passing a reliable-storage path (HDFS/S3/DBFS)
switches to ``setCheckpointDir`` + ``.checkpoint(eager=True)``, which
survives executor loss. Output is identical either way (pinned in
tests/test_dedup.py and tests/test_graph.py).

The session checkpoint dir is set ONCE (ADVICE r08): a repeat call with
the same root is a no-op, a conflicting path warns and keeps the
session's existing dir — silently redirecting would re-home every other
operator's reliable checkpoints mid-session. Per-round checkpoint files
accumulate under the dir; enable
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (or sweep the
dir between jobs) on long-lived clusters — documented rather than forced
because cleanup-on-GC also deletes checkpoints a caller may want to
re-attach to after driver restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage; see module docstring
    for the executor-loss trade-off the ``checkpoint_dir`` switch governs."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    current = sc._jsc.sc().getCheckpointDir()
    if not current.isDefined():
        sc.setCheckpointDir(checkpoint_dir)
    elif checkpoint_dir.rstrip("/") not in current.get():
        # setCheckpointDir stores <dir>/<app-uuid>; a different root means
        # a genuine conflict — keep the session's dir, warn the caller.
        import warnings

        warnings.warn(
            f"session checkpoint dir already {current.get()!r}; keeping it "
            f"(requested {checkpoint_dir!r})",
            stacklevel=3,
        )
    return df.checkpoint(eager=True)

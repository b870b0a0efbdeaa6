"""Shared versioned-state plumbing for the foreachBatch streams
(rollup.py, dedup_stream.py, ivf_stream.py).

Two invariants every stream in this package relies on:

1. **Pointer-flip-last commit.** State writes land under versioned /
   staged paths; the tiny ``_LATEST`` pointer file is renamed into place
   only after the batch's writes complete, so a replayed batch (id <=
   pointer) is a no-op — exactly-once state from at-least-once
   invocation. On a real cluster the rename is the object store's atomic
   putIfAbsent/rename.

2. **Checkpoint lineage pinning** (ADVICE r10 item 2). The replay guard
   keys on Spark's PER-CHECKPOINT batch_id: reusing an existing state
   dir with a *fresh* checkpoint dir restarts batch ids at 0, and every
   new batch would be silently skipped as "already applied". The first
   batch therefore records the checkpoint identity in a ``_RUN`` file;
   later runs fail loudly if the checkpoint lineage does not match,
   instead of silently dropping data.
"""

from __future__ import annotations

import os

_LATEST = "_LATEST"
_RUN = "_RUN"


def latest_version(state_dir: str) -> int:
    """Highest committed batch id, or -1 before the first commit."""
    p = os.path.join(state_dir, _LATEST)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def flip_latest(state_dir: str, batch_id: int) -> None:
    """Commit ``batch_id``: write-then-atomic-rename the pointer file.
    This MUST be the last step of a batch apply."""
    tmp = os.path.join(state_dir, f"{_LATEST}.tmp.{batch_id}")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(state_dir, _LATEST))


_BASE = "_BASE"


def read_base_pointer(state_dir: str, default_dir: str) -> tuple[str, int]:
    """(base_subdir, upto) for a compactable layout: ``base_subdir`` is
    the current consolidated table and ``upto`` the highest staged
    batch id folded into it (-1 before any compaction). Missing pointer
    -> the layout's default base."""
    p = os.path.join(state_dir, _BASE)
    if not os.path.exists(p):
        return default_dir, -1
    with open(p) as f:
        d, upto = f.read().strip().split("\n")
    return d, int(upto)


def flip_base_pointer(state_dir: str, base_subdir: str, upto: int) -> None:
    """Commit a compaction: write-then-atomic-rename the base pointer.
    MUST be the last step — a crash before the flip leaves the new base
    dir as inert scratch that the retry overwrites."""
    tmp = os.path.join(state_dir, f"{_BASE}.tmp.{upto}")
    with open(tmp, "w") as f:
        f.write(f"{base_subdir}\n{upto}")
    os.replace(tmp, os.path.join(state_dir, _BASE))


def _run_id(checkpoint_dir: str) -> str:
    return os.path.realpath(checkpoint_dir)


def ensure_lineage(state_dir: str, checkpoint_dir: str) -> None:
    """Pin the state dir to one checkpoint lineage.

    First use records ``realpath(checkpoint_dir)`` in ``_RUN``; any later
    run against the same state dir with a different checkpoint raises,
    because its batch ids restart at 0 and the replay guard would
    silently skip every new batch (ADVICE r10 item 2).
    """
    os.makedirs(state_dir, exist_ok=True)
    run_path = os.path.join(state_dir, _RUN)
    rid = _run_id(checkpoint_dir)
    if os.path.exists(run_path):
        with open(run_path) as f:
            recorded = f.read().strip()
        if recorded != rid:
            raise RuntimeError(
                f"state dir {state_dir!r} was built under checkpoint "
                f"{recorded!r} but this run uses {rid!r}; batch ids would "
                "restart at 0 and the replay guard would silently skip "
                "every new batch. Use the original checkpoint dir, or a "
                "fresh state dir."
            )
        return
    tmp = f"{run_path}.tmp"
    with open(tmp, "w") as f:
        f.write(rid)
    os.replace(tmp, run_path)

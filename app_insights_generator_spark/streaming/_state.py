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


def _checkpoint_query_id(checkpoint_dir: str) -> str | None:
    """The streaming query id Spark records in the checkpoint's
    ``metadata`` file at query start — stable for the life of one
    checkpoint lineage, fresh when the dir is recreated. ``None`` before
    the first ``start()`` (the file does not exist yet)."""
    p = os.path.join(checkpoint_dir, "metadata")
    if not os.path.exists(p):
        return None
    import json

    try:
        with open(p) as f:
            return json.load(f).get("id")
    except (ValueError, OSError):
        return None


def _write_run(run_path: str, path_id: str, query_id: str) -> None:
    tmp = f"{run_path}.tmp"
    with open(tmp, "w") as f:
        f.write(f"{path_id}\n{query_id}")
    os.replace(tmp, run_path)


def ensure_lineage(state_dir: str, checkpoint_dir: str) -> None:
    """Pin the state dir to one checkpoint lineage.

    Two identities are recorded in ``_RUN`` (ADVICE r10 item 2 + r11
    item 2): ``realpath(checkpoint_dir)``, and — as soon as the query
    has started once — the streaming query id from the checkpoint's
    ``metadata`` file. The path alone is spoofable by deleting and
    recreating the checkpoint dir AT THE SAME PATH: batch ids restart at
    0 while the realpath still matches, reproducing exactly the
    silent skip-every-batch failure this guard exists to prevent. The
    query id changes whenever the dir is recreated, so streams re-call
    this inside foreachBatch (where the metadata file is guaranteed to
    exist) and a recreated checkpoint fails loudly on its first batch.
    """
    os.makedirs(state_dir, exist_ok=True)
    run_path = os.path.join(state_dir, _RUN)
    path_id = _run_id(checkpoint_dir)
    query_id = _checkpoint_query_id(checkpoint_dir)
    if os.path.exists(run_path):
        with open(run_path) as f:
            lines = f.read().strip().split("\n")
        rec_path, rec_qid = lines[0], (lines[1] if len(lines) > 1 else "")
        if rec_path != path_id:
            raise RuntimeError(
                f"state dir {state_dir!r} was built under checkpoint "
                f"{rec_path!r} but this run uses {path_id!r}; batch ids "
                "would restart at 0 and the replay guard would silently "
                "skip every new batch. Use the original checkpoint dir, "
                "or a fresh state dir."
            )
        if rec_qid and query_id and rec_qid != query_id:
            raise RuntimeError(
                f"state dir {state_dir!r} was built under checkpoint "
                f"query id {rec_qid!r} but {checkpoint_dir!r} now carries "
                f"{query_id!r} — the checkpoint dir was deleted and "
                "recreated at the same path, so batch ids restart at 0 "
                "and the replay guard would silently skip every new "
                "batch. Restore the original checkpoint, or start a "
                "fresh state dir."
            )
        if not rec_qid and query_id:
            _write_run(run_path, path_id, query_id)  # upgrade: pin the id
        return
    _write_run(run_path, path_id, query_id or "")

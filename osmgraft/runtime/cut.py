"""Materialization-cut strategy knob (round-4 verdict, What's wrong #3).

The engine cuts lineage on relations that are reused by several
consumers (iterative CC frontiers, tfidf posting lists, the dup-span
gram stream, cell spines). In this sandbox ``localCheckpoint`` is the
right call — RAM-speed, no DFS required — but localCheckpoint blocks
are NON-RECOMPUTABLE: on a real cluster an executor loss mid-query
fails the job instead of recomputing lineage. For multi-hour 100 TB
runs the cut must be switchable to a reliable checkpoint (written to
the DFS checkpoint dir, survives executor loss) or a spillable persist
(keeps lineage, recomputable, no write barrier).

One session-level knob, read per call so tests can flip it:

    OSMGRAFT_CUT_MODE = local     (default) df.localCheckpoint()
                        reliable  df.checkpoint() to OSMGRAFT_CHECKPOINT_DIR
                        persist   df.persist(MEMORY_AND_DISK) — lineage kept
                        none      no cut (pure lineage; debugging/plan audits)

The hottest cut sites route through :func:`cut`; call sites that
predate the knob still say ``.localCheckpoint()`` and behave exactly
like mode=local (the default), so the knob is strictly additive.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

_VALID = ("local", "reliable", "persist", "none")

# persist-mode cuts registered here so long-lived sessions (sweeps,
# notebooks) can release them between queries — persist keeps lineage,
# so unpersisting is always safe, just a cache drop
_PERSISTED: list[DataFrame] = []

_WARNED_LOCAL_CKPT = False


def release_cuts() -> int:
    """Unpersist every persist-mode cut taken so far; returns the count.
    No-op in the other modes: localCheckpoint blocks are released by the
    context cleaner with their RDDs, and reliable checkpoint FILES are
    only auto-deleted when the session sets
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (the
    engine's ``get_spark`` does — a session built elsewhere must set it
    or clean OSMGRAFT_CHECKPOINT_DIR itself after multi-query reliable
    runs)."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n


def cut_mode() -> str:
    mode = os.environ.get("OSMGRAFT_CUT_MODE", "local").strip().lower()
    return mode if mode in _VALID else "local"


def cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once for reuse, per the session-level cut mode.

    mode=local keeps the historical behavior byte-for-byte
    (``localCheckpoint(eager)``); mode=reliable writes a recomputable-
    after-executor-loss checkpoint to the configured DFS dir;
    mode=persist trades the write barrier for a spillable cache that
    keeps lineage; mode=none disables the cut (consumers recompute —
    correct, possibly slow, and the form plan audits want to inspect).
    """
    mode = cut_mode()
    if mode == "none":
        return df
    if mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED.append(out)
        return out
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            ckdir = os.environ.get("OSMGRAFT_CHECKPOINT_DIR")
            if ckdir is None:
                # node-local fallback for single-node sandboxes ONLY —
                # on a real cluster this dir is NOT shared, so the
                # checkpoint would not survive an executor loss (the
                # whole point of the mode). Warn once, loudly.
                ckdir = os.path.join(tempfile.gettempdir(), "osmgraft_ckpt")
                global _WARNED_LOCAL_CKPT
                if not _WARNED_LOCAL_CKPT:
                    _WARNED_LOCAL_CKPT = True
                    import warnings

                    warnings.warn(
                        "OSMGRAFT_CUT_MODE=reliable without "
                        "OSMGRAFT_CHECKPOINT_DIR: checkpointing to the "
                        f"node-local {ckdir}, which is NOT fault-tolerant "
                        "on a multi-executor cluster — set "
                        "OSMGRAFT_CHECKPOINT_DIR to a DFS path there.",
                        stacklevel=3,
                    )
            sc.setCheckpointDir(ckdir)
        # a checkpoint dir already set on the session wins over the env
        # var (the job owner configured it deliberately)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

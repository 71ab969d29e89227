"""Checkpoint-mode switch for the pipeline's shared-subtree materializations.

Eager checkpoints of multi-consumed frames are load-bearing on a single host
(they stop AQE's concurrent stage submission from re-executing a lazily
checkpointed subtree once per consumer), but `localCheckpoint` blocks live in
executor storage only: on a multi-executor cluster an executor loss truncates
lineage mid-job and the run cannot recover. This module threads ONE knob
through every call site:

* ``local``    (default) — `df.localCheckpoint`: fastest, executor-local
  blocks, right for single-host / sandbox runs and for clusters where a lost
  executor may simply rerun the whole job.
* ``reliable`` — `df.checkpoint`: blocks written to the fault-tolerant
  checkpoint dir (`spark.sparkContext.setCheckpointDir`, HDFS/object store on
  a real cluster). Survives executor loss; costs a write+read round trip.
  This is the recommended mode for 100 TB multi-executor deployments.
* ``persist``  — `persist(MEMORY_AND_DISK)` + eager count: keeps full lineage
  (recomputable after executor loss) without a checkpoint dir; recomputation
  of a lost block re-runs the upstream stages, so it trades recovery time for
  zero storage setup.

Mode resolution: explicit `set_checkpoint_mode()` > `REDEN_CHECKPOINT_MODE`
env var > "local".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

MODES = ("local", "reliable", "persist")

_mode: str | None = None


def set_checkpoint_mode(mode: str | None) -> None:
    """Set the process-global checkpoint mode (None → re-read the env var)."""
    global _mode
    if mode is not None and mode not in MODES:
        raise ValueError(f"checkpoint mode {mode!r} not in {MODES}")
    _mode = mode


def checkpoint_mode() -> str:
    if _mode is not None:
        return _mode
    env = os.environ.get("REDEN_CHECKPOINT_MODE", "local")
    if env not in MODES:
        raise ValueError(f"REDEN_CHECKPOINT_MODE={env!r} not in {MODES}")
    return env


def shared(df: DataFrame, arrays: bool = False) -> DataFrame:
    """Materialization point for a subtree consumed by several branches of ONE
    downstream query (the links stage's members/colored/edges/survivors, the
    dedup signature/shingle frames). ``arrays``: the frame carries array-typed
    columns (columnar cache encoding is expensive for those — see 'hybrid').

    Default ('eager'): the eager checkpoint barrier of :func:`checkpoint` —
    measured best on this host (interleaved A/B, BENCH.md round 4: cold
    kg_links 17.5 s eager vs 20.6 s lazy median at equal load).

    ``REDEN_SHARED_SUBTREE=lazy`` switches to a lazy
    ``persist(MEMORY_AND_DISK)``: no barrier job is submitted; the subtree
    materializes inside the one consuming query, and concurrent AQE stage
    materializations dedupe at the block manager's per-partition locks (each
    cached partition computed exactly once — unlike a lazy
    ``localCheckpoint``, which re-executes the whole upstream once per
    concurrent consumer, the round-2 trap). The A/B showed the columnar
    cache build of the array-typed members frame costs more than the ~5
    barrier jobs it saves at this scale; kept as the measurement knob because
    the trade reverses when per-job latency dominates (very small inputs) or
    on a cluster whose driver round-trips are slower than its executors.

    ``REDEN_SHARED_SUBTREE=hybrid`` splits by the caller's ``arrays`` hint:
    narrow string/numeric frames (colored/edges/survivors — cheap to encode
    columnar) go lazy persist, while array-typed frames (members, dedup
    signature/shingle frames — whose columnar cache build is what made full
    lazy lose the A/B) keep the eager checkpoint.

    Never a lazy localCheckpoint. Under a non-local ``checkpoint_mode``
    (reliable/persist) `shared` always defers to :func:`checkpoint`."""
    if not shared_is_lazy(arrays):
        return checkpoint(df)
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def shared_is_lazy(arrays: bool = False) -> bool:
    """True when :func:`shared` would materialize a frame with this ``arrays``
    hint via lazy persist (no barrier job). Callers that overlap
    eager-checkpoint jobs with driver threads use this to skip the (pointless
    under lazy) thread pool."""
    if checkpoint_mode() != "local":
        return False
    mode = os.environ.get("REDEN_SHARED_SUBTREE", "eager")
    return mode == "lazy" or (mode == "hybrid" and not arrays)


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a multi-consumed frame under the configured mode.

    `eager=False` is honored only by the local/reliable modes (persist has no
    lazy variant worth having: an unpersisted-unconsumed frame is a no-op).
    """
    mode = checkpoint_mode()
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().checkpointDir().isEmpty():
            raise RuntimeError(
                "checkpoint mode 'reliable' needs spark.sparkContext.setCheckpointDir "
                "(point it at fault-tolerant storage: HDFS/S3 on a cluster)"
            )
        return df.checkpoint(eager=eager)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
    return out

"""Deterministic lifecycle for eager ``localCheckpoint`` pins.

``DataFrame.localCheckpoint(eager=True)`` materializes a hash-sized
relation into block storage and truncates its lineage — the right tool
when one expensive pass feeds several consumers inside one operator
call (guide §2.4). But the DataFrame API offers no handle to RELEASE
that storage: ``df.unpersist()`` only consults the SQL cache manager,
which never heard of the checkpoint, so every pin lives until session
teardown. One-shot queries can afford that; iterative loops cannot
(connected-components rounds, foreachBatch micro-batches, curation
rounds each add pins for the life of the session — VERDICT r12 item 1).

This module closes the gap. A localCheckpoint result's analyzed plan
is a ``LogicalRDD`` holding exactly the checkpointed (persisted) RDD,
so the pin can be unpersisted precisely — no session-global RDD-id
diffing, no ContextCleaner races:

- :func:`pin` — ``localCheckpoint(eager=True)``, named for intent.
- :func:`unpin` — release the pin backing a frame ``pin`` returned.
- :func:`release_pins` — walk a DERIVED frame's plan and release every
  LogicalRDD leaf it reads (the caller-facing "I have materialized
  this result and will not read it again" verb).

SAFETY RULE (lineage is truncated): only unpin a frame once nothing
will read it again — its consumers have fully materialized (an eager
downstream pin, a completed write, a collect). A released pin cannot
be recomputed; a later read fails with missing-block errors. The
trade, stated once for SCALE.md as well: a checkpointed relation also
cannot be recomputed after an EXECUTOR loss mid-query — acceptable for
the hash-sized relations these operators pin, where the alternative
was re-running a corpus-sized pass per consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint ``df`` (compute once, truncate lineage).

    The result is releasable via :func:`unpin` / :func:`release_pins`.
    """
    return df.localCheckpoint(eager=True)


def _logical_rdd(df: DataFrame):
    """The LogicalRDD plan node of a frame ``pin`` returned (None when
    the frame is not a checkpoint result)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return plan
    except Exception:
        pass
    return None


def pin_backed(df: DataFrame) -> bool:
    """True when every leaf of ``df``'s analyzed plan is a PERSISTED
    LogicalRDD — i.e. the frame reads only checkpoint pins and
    re-evaluating it repeats no expensive lineage. Operators that pin
    internally (``hamming_near_dups``) consult this to skip a redundant
    second pin when the caller already pinned the shared upstream pass.

    The storage-level check is load-bearing: ``createDataFrame`` over a
    parallelized local collection ALSO analyzes to a LogicalRDD leaf,
    but its RDD is not persisted and everything derived from it (e.g. a
    mapInPandas decode stage) re-runs per consumer — exactly the case
    the internal pin exists for (caught by the r13 plan audit:
    media_near_dup's decode briefly ran on both self-join sides)."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    except Exception:
        return False
    if leaves.size() == 0:
        return False
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getSimpleName() != "LogicalRDD":
            return False
        try:
            lvl = leaf.rdd().getStorageLevel()
            if not (lvl.useMemory() or lvl.useDisk()):
                return False
        except Exception:
            return False
    return True


def unpin(df: DataFrame, blocking: bool = False) -> bool:
    """Release the persisted RDD behind a :func:`pin` result.

    Returns True when a pin was found and unpersisted. Safe to call
    twice (unpersist is idempotent). See the module safety rule.
    """
    node = _logical_rdd(df)
    if node is None:
        return False
    node.rdd().unpersist(blocking)
    return True


def release_pins(df: DataFrame, blocking: bool = False) -> int:
    """Release every localCheckpoint pin a derived frame reads.

    Walks the analyzed plan's leaves and unpersists each LogicalRDD's
    RDD. Call AFTER the frame (and anything else sharing its pins) has
    fully materialized — the caller-facing lifecycle verb for operators
    that return lazy frames backed by internal pins (connected
    components' final labels, MinHash verify relations, ...).
    Returns the number of pins released.
    """
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    except Exception:
        return 0
    n = 0
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getSimpleName() == "LogicalRDD":
            try:
                leaf.rdd().unpersist(blocking)
                n += 1
            except Exception:
                pass
    return n

"""Index-materialization policy for self-joined operators.

The banded dedup / ANN operators all share one physical-plan hazard,
found in round 7: a self-join's two branches do NOT reuse their common
input subtree once AQE replaces the sort-merge join with a one-side
broadcast (the ReusedExchange rewrite keys on Exchange nodes that the
broadcast plan no longer contains), so every branch silently re-runs
the full index-build pipeline.  Materializing the index once —
"build the index once, probe many", the shape every LSH/IVF system
uses — removed 6-7x of redundant work at 10x data.

HOW to materialize is a trade the operator cannot make for every
caller, so it is a parameter (``materialize_mode=`` on the public
operators) resolved here:

``"eager"`` (default)
    ``localCheckpoint(eager=True)`` — the fastest path and the one all
    benchmarks/oracles run.  Costs: a Spark job fires at
    plan-CONSTRUCTION time (callers that never execute the plan still
    pay), and lineage is truncated with the blocks held in
    non-replicated executor storage — on a real cluster an executor
    loss FAILS the query instead of recomputing.  Right for
    interactive/benchmark work and short-lived jobs.

``"persist"``
    ``persist(StorageLevel.MEMORY_AND_DISK)`` + an eager ``count()``.
    Lineage is retained, so an executor loss recomputes the lost
    blocks instead of failing — the fault-tolerant choice for long
    multi-hour jobs on preemptible hardware.  Still pays the
    construction-time job; the caller owns ``unpersist()`` if the
    session lives on.

``"lazy"``
    No materialization.  Construction is free; the caller either
    accepts branch recomputation or persists/checkpoints the result
    frame itself (e.g. to chain several operators over one shared
    index).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

EAGER = "eager"
PERSIST = "persist"
LAZY = "lazy"

MODES = (EAGER, PERSIST, LAZY)


def materialize(df: DataFrame, mode: str = EAGER) -> DataFrame:
    """Materialize an operator-internal index per the policy above."""
    if mode == EAGER:
        return df.localCheckpoint()
    if mode == PERSIST:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        return df
    if mode == LAZY:
        return df
    raise ValueError(
        f"unknown materialize mode {mode!r}: expected one of {MODES}"
    )

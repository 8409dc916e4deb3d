"""Adaptive pre-expansion parallelism.

Row-expanding operators (word shingling is a ~50x explode, per-token
hashing, per-pair scoring) do their heavy expression work in the stage
that CONTAINS the expansion — for a compact input that is the scan
stage itself.  A small parquet table arrives as ONE file split, so the
whole expansion serializes on one core while 31 sit idle: measured on
the sf0.1 documents table (5k docs -> 250k shingles), MinHash banding
spent ~2 s in a single-task stage.

:func:`fan_out` is the guard the expansion operators place in front of
their explode: repartition round-robin to the session's shuffle
parallelism ONLY when the current plan has fewer partitions.  On a
large input (100 TB = tens of thousands of file splits) the condition
is false and the call is a literal no-op — no extra Exchange ever
appears in the at-scale plan, preserving the scan-stage pushdowns.

Round-robin is safe for these callers because every downstream result
is partition-layout-invariant (keyed aggregations / equi-joins over the
exploded rows), and Spark's indeterminate-stage rollback re-runs the
full stage set on fetch-failure retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(
    df: DataFrame,
    min_partitions: int | None = None,
    by: str | None = None,
) -> DataFrame:
    """Repartition ``df`` up to the session's shuffle parallelism (or
    ``min_partitions``) — a no-op whenever the plan already has at
    least that many partitions, so it never adds an Exchange at scale.
    Call it on the PROJECTED input (id + payload columns only) so the
    balancing shuffle ships the minimum bytes.

    When the expansion feeds a ``groupBy(key)`` (explode-aggregate
    operators), pass ``by=key``: hash partitioning on the key both
    balances the work AND pre-clusters the groups, so the partial
    aggregation dedups fully and Catalyst elides the post-explode
    exchange (hashpartitioning(key) already satisfies the aggregate's
    required distribution).  Round-robin (the default) would scatter
    each group over every partition — for a wide aggregate that
    multiplies partial-agg shuffle rows by the partition count.
    ``by`` must be well-distributed (a unique-ish id, never a hot
    key)."""
    target = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    if by is not None:
        return df.repartition(target, by)
    return df.repartition(target)

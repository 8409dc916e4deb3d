"""Snapshot reconciliation (table diff) — the CDC-audit primitive.

Given two snapshots of the same keyed table (yesterday's publish and
today's, a source system and its replicated copy, a pre- and
post-migration extract), classify every key as ``added`` /
``removed`` / ``changed`` / ``unchanged`` and name WHICH columns
changed — the operator behind "did the backfill touch anything it
shouldn't have?".

Scale shape: exactly ONE full-outer sort-merge join on the key
(both sides shuffle once on the key; AQE handles skewed keys), and
every column comparison is a null-safe ``<=>`` Column expression
evaluated inside that join's project — no second pass, no per-column
jobs, no Python row path.  The summary aggregate that usually
follows (see ``diff_summary``) is a map-side-combinable count over
the tiny status/flag columns.

Null-safety: ``<=>`` (null-safe equality) is used for change
detection so a NULL -> value transition counts as a change and
NULL == NULL does not — the semantics a reconciliation audit needs
(plain ``=`` would classify NULL -> NULL as "changed" via
three-valued logic falling out of the equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff: one row per key present in either snapshot,
    with ``status`` in {added, removed, changed, unchanged} and one
    boolean ``chg_<col>`` flag per compared column (null for
    added/removed rows — there is nothing to compare against)."""
    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, on=key_cols, how="full_outer")
    # keys-only diff (no compare columns): nothing can be "changed"
    any_chg = F.lit(False)
    for c in compare_cols:
        any_chg = any_chg | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_chg, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    both = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    return j.select(
        *key_cols,
        status.alias("status"),
        *[
            F.when(both, ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).alias(
                f"chg_{c}"
            )
            for c in compare_cols
        ],
    )


def diff_summary(diff: DataFrame, compare_cols: list[str]) -> DataFrame:
    """Collapse a ``snapshot_diff`` frame to audit metrics: one row
    per status count plus one row per column's changed-row count —
    a single map-side-combinable aggregate, output is O(columns)."""
    aggs = [
        F.sum(F.when(F.col("status") == s, 1).otherwise(0)).alias(f"_s_{s}")
        for s in ("added", "removed", "changed", "unchanged")
    ] + [
        F.sum(F.when(F.col(f"chg_{c}"), 1).otherwise(0)).alias(f"_c_{c}")
        for c in compare_cols
    ]
    one = diff.agg(*aggs)
    rows = [
        F.struct(
            F.lit(s).alias("metric"),
            F.col(f"_s_{s}").cast("long").alias("n"),
        )
        for s in ("added", "removed", "changed", "unchanged")
    ] + [
        F.struct(
            F.lit(f"changed:{c}").alias("metric"),
            F.col(f"_c_{c}").cast("long").alias("n"),
        )
        for c in compare_cols
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select(
        F.col("r.metric").alias("metric"), F.col("r.n").alias("n")
    )

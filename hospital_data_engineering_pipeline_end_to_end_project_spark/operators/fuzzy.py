"""Blocked fuzzy matching (entity resolution by edit distance).

Two-level candidate reduction before the expensive metric runs:

1. **block** on an equality key (brand, zip, first-token, ...) so the
   self-join shuffles on the block key and pair fan-out is per-block;
2. **value dedup**: edit distance is a function of the *strings*, not
   the rows, so distances are computed once per distinct (block,
   value) pair and joined back to the rows.  With a repetitive value
   domain this turns |rows|^2-per-block metric evaluations into
   |vocab|^2-per-block — the difference between 32 M and 0.5 M
   levenshtein calls on the sf0.1 part table, and the property that
   keeps the operator viable when blocks are large but vocabularies
   saturate.

A length-band prune (|len(x)-len(y)| > d implies dist > d) drops
candidates before the metric.  Output pairs are (id_a < id_b) unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    text_col: str,
    max_dist: int,
) -> DataFrame:
    """(id_a, id_b, block, dist) for same-block rows whose values are
    within ``max_dist`` edits (0 < dist <= max_dist; exact-equal
    values are exact duplicates — a hash-groupBy's job, not a fuzzy
    matcher's)."""
    vals = df.select(
        F.col(block_col).alias("block"), F.col(text_col).alias("val")
    ).distinct()
    a, b = vals.alias("a"), vals.alias("b")
    vpairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.val") < F.col("b.val"))
            & (
                F.abs(F.length("a.val") - F.length("b.val")) <= max_dist
            ),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.val").alias("val_a"),
            F.col("b.val").alias("val_b"),
            F.levenshtein("a.val", "b.val").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
    rows = df.select(
        F.col(id_col).alias("rid"),
        F.col(block_col).alias("block"),
        F.col(text_col).alias("val"),
    )
    matched = (
        vpairs.join(
            rows.withColumnRenamed("rid", "rid_x").withColumnRenamed(
                "val", "val_a"
            ),
            ["block", "val_a"],
        )
        .join(
            rows.withColumnRenamed("rid", "rid_y").withColumnRenamed(
                "val", "val_b"
            ),
            ["block", "val_b"],
        )
    )
    return matched.select(
        F.least("rid_x", "rid_y").alias("id_a"),
        F.greatest("rid_x", "rid_y").alias("id_b"),
        "block",
        "dist",
    )

"""Skew mitigation utilities.

AQE's skew-join rule (enabled in the session factory) handles most
runtime skew by splitting oversized partitions.  These helpers cover
the cases AQE can't: aggregations over heavy-hitter keys and joins
where one side must be salted explicitly (e.g. a hot key joined
against a non-broadcastable table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, salt_buckets: int) -> F.Column:
    """Deterministic per-row salt in [0, salt_buckets): md5 over the
    full row content (the repo-wide md5-bucket idiom, vs ``F.rand``
    whose draw depends on partition layout).  Rows of one hot KEY
    still spread — the hash covers every column, not just the key —
    while the physical plan becomes reproducible run-to-run.
    Byte-identical duplicate rows co-bucket; for counting that only
    means their partials merge a stage early."""
    payload = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in df.columns]
    )
    return F.pmod(
        F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long"),
        F.lit(salt_buckets),
    ).cast("int")


def salted_groupby_count(
    df: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-stage count for heavy-hitter keys: stage 1 aggregates
    (key, salt) partial counts — spreading a hot key over
    ``salt_buckets`` reducers — stage 2 sums the partials.  The
    classic partial-aggregation shape, written explicitly for
    aggregates where Catalyst's map-side combine is insufficient
    (e.g. after an explode that re-skews)."""
    salted = df.withColumn("__salt", _row_salt(df, salt_buckets))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("count"))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant inner equi-join: the skewed side gets a random
    salt in [0, buckets); the other side is replicated once per salt
    value; the join key becomes (key, salt), spreading each hot key
    over ``salt_buckets`` tasks.

    Cost: |other| x buckets replication — use only when ``other`` is
    too big to broadcast but small enough to replicate, and AQE's
    skew split isn't applicable (e.g. the skew is introduced
    mid-plan).  Output columns = skewed's + other's (key deduped).
    """
    salted = skewed.withColumn("__salt", _row_salt(skewed, salt_buckets))
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted.join(replicated, [key, "__salt"]).drop("__salt")
    return out

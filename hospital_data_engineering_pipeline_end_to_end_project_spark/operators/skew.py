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


def _row_salt(
    df: DataFrame, salt_buckets: int, ordinal_col: str | None = None
) -> F.Column:
    """Per-row salt in [0, salt_buckets): md5 over the full row
    content PLUS a per-row ordinal.

    Content alone is not enough: the canonical skew scenario is a hot
    key whose rows are mass-duplicated byte-for-byte, and a pure
    content hash sends every copy to the same bucket — the hot
    partition quietly returns.  Mixing in a per-row ordinal spreads
    identical rows uniformly.

    ``ordinal_col`` — a stable unique row key — makes the salt FULLY
    deterministic: prefer it whenever the input has one.  Without it
    the fallback ordinal is ``monotonically_increasing_id``, which
    depends on the physical partition layout, and that carries a
    CLUSTER-RETRY HAZARD: if the input is shuffle-derived, a
    recomputed map task can fetch rows in a different order and
    re-salt them differently than the attempt earlier reducers
    already consumed, double-counting or dropping partials.  Spark's
    indeterminate-stage rollback and local mode mask this, but it is
    real on a cluster — so the fallback is only safe for SCAN-ROOTED
    inputs (file-source partitions are recomputed identically).
    Callers feeding shuffle-derived frames MUST pass ``ordinal_col``.
    md5 over (ordinal, content) is used rather than plain ``F.rand``
    so a run is replayable from a fixed input layout."""
    ordinal = (
        F.col(ordinal_col).cast("string")
        if ordinal_col is not None
        else F.monotonically_increasing_id().cast("string")
    )
    payload = F.concat_ws(
        "\x1f",
        ordinal,
        *[F.col(c).cast("string") for c in df.columns],
    )
    return F.pmod(
        F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long"),
        F.lit(salt_buckets),
    ).cast("int")


def salted_groupby_count(
    df: DataFrame,
    key: str,
    salt_buckets: int = 16,
    ordinal_col: str | None = None,
) -> DataFrame:
    """Two-stage count for heavy-hitter keys: stage 1 aggregates
    (key, salt) partial counts — spreading a hot key over
    ``salt_buckets`` reducers — stage 2 sums the partials.  The
    classic partial-aggregation shape, written explicitly for
    aggregates where Catalyst's map-side combine is insufficient
    (e.g. after an explode that re-skews).

    Pass ``ordinal_col`` (a stable unique key) for a fully
    deterministic salt; see the retry caveat on :func:`_row_salt`."""
    salted = df.withColumn("__salt", _row_salt(df, salt_buckets, ordinal_col))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("count"))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
    ordinal_col: str | None = None,
) -> DataFrame:
    """Skew-resistant inner equi-join: the skewed side gets a random
    salt in [0, buckets); the other side is replicated once per salt
    value; the join key becomes (key, salt), spreading each hot key
    over ``salt_buckets`` tasks.

    Cost: |other| x buckets replication — use only when ``other`` is
    too big to broadcast but small enough to replicate, and AQE's
    skew split isn't applicable (e.g. the skew is introduced
    mid-plan).  Output columns = skewed's + other's (key deduped).

    Pass ``ordinal_col`` (a stable unique key on the skewed side) for
    a fully deterministic salt; see the retry caveat on
    :func:`_row_salt`."""
    salted = skewed.withColumn(
        "__salt", _row_salt(skewed, salt_buckets, ordinal_col)
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted.join(replicated, [key, "__salt"]).drop("__salt")
    return out


def salted_grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int = 5,
    salt_buckets: int = 64,
    descending: bool = True,
) -> DataFrame:
    """Per-group top-k WITHOUT a per-group total sort — the hot-group
    defense for rank windows.

    ``row_number() OVER (PARTITION BY group ORDER BY ...)`` colocates
    and sorts a group's ENTIRE row set in one task; AQE cannot split
    a window partition, so one hot group is one straggler (the same
    trap the two-level KMV/quantile sketches and the q124 quota cut
    exist for).  This is the two-level form: top-k per (group,
    md5-salt-bucket) — every window partition bounded to ~1/salt of
    the group — then a re-rank over the <= salt_buckets * k
    survivors per group.

    The output is IDENTICAL to the one-level window by the subset
    identity: under a TOTAL order (``order_col`` with ``id_col`` as
    the deterministic tiebreak), a group's global top-k is contained
    in the union of its buckets' top-ks.  The oracle therefore
    replays the plain one-level SQL window — the prove-by-identity
    pattern.

    The salt is md5 of the row ID — content-independent and
    replay-stable (the :func:`_row_salt` ordinal discussion applies:
    a unique id makes retries deterministic).

    Returns ``group_cols + [id_col, order_col, rank]``, rank in
    [1, k].
    """
    from pyspark.sql.window import Window

    direction = F.desc if descending else F.asc
    salt = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(salt_buckets),
    ).cast("int")
    d = df.select(*group_cols, id_col, order_col).withColumn("__salt", salt)
    w_part = Window.partitionBy(*group_cols, "__salt").orderBy(
        direction(order_col), F.asc(id_col)
    )
    survivors = (
        d.withColumn("__rn", F.row_number().over(w_part))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w_merge = Window.partitionBy(*group_cols).orderBy(
        direction(order_col), F.asc(id_col)
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_merge))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int = 5,
    salt_buckets: int = 64,
    descending: bool = True,
) -> DataFrame:
    """Per-group top-k with an explicit plan dispatch — the
    ``salt_buckets=1`` ESCAPE HATCH the r09 review asked for.

    :func:`salted_grouped_topk` is the safe default (no window
    partition can be hot), but its second exchange is a pure constant
    cost when the caller KNOWS every group is small (e.g. a frame
    already bounded by an upstream cap).  ``salt_buckets=1``
    short-circuits to the ONE-LEVEL window — one exchange, one sort —
    which is identical output by the same subset identity the
    two-level form is proven by (both rank on the total
    ``(order_col, id_col)`` order; equality is test-pinned both ways
    in ``tests/test_properties.py`` / ``test_skew_temporal.py``).

    Measured at sf0.1 (min-of-2, the BASELINE.md escape-hatch note):
    the one-level plan recovers the small-scale constant the r09
    two-level rewrites paid (q20/q28-shaped inputs), at the cost of
    reintroducing the hot-group straggler if a group is NOT small —
    the default stays 64 on purpose.

    Returns ``group_cols + [id_col, order_col, rank]`` like the
    two-level form.
    """
    if salt_buckets > 1:
        return salted_grouped_topk(
            df, group_cols, order_col, id_col,
            k=k, salt_buckets=salt_buckets, descending=descending,
        )
    from pyspark.sql.window import Window

    direction = F.desc if descending else F.asc
    w = Window.partitionBy(*group_cols).orderBy(
        direction(order_col), F.asc(id_col)
    )
    return (
        df.select(*group_cols, id_col, order_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )

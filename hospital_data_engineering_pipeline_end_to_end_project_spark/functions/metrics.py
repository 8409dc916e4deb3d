"""Observation metrics.

The reference audits row counts by re-running the full lineage
(``df.count()`` after each merge, ``Silver Layer.py:125`` — a second
complete recomputation).  ``df.observe`` attaches named aggregates to
the existing plan: metrics are collected as a side effect of the ONE
write action, at zero extra passes — the difference between 1x and 2x
scan cost on a 100 TB merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: md5 hash fractions use the first 13 hex chars = 52 bits, so the
#: integer is exactly representable in a double and the division by
#: 2^52 is exact — the fraction is bit-identical on any IEEE engine
_HASH_BITS = 52
_HASH_DENOM = float(1 << _HASH_BITS)


#: Salt fan-out for the two-level KMV construction: the per-(group,
#: salt) partial bottom-k bounds every window partition to ~|distinct|
#: / buckets rows, and the merge re-rank then sees at most
#: buckets x k rows per group.  Derived from md5 hex chars 14-15 —
#: disjoint from the 13 chars that form the hash fraction, so salt
#: and rank order are independent.
_KMV_SALT_BUCKETS = 64


def _hash_fraction_from_md5(md5_col) -> "F.Column":
    """The canonical 52-bit dyadic fraction from an md5 hex column —
    shared so every KMV construction derives bit-identical ``h``."""
    hex13 = F.substring(md5_col, 1, _HASH_BITS // 4)
    return F.conv(hex13, 16, 10).cast("long") / F.lit(_HASH_DENOM)


def hash_fraction(col) -> "F.Column":
    """Uniform [0,1) fraction from md5 of a column's string form.

    Deterministic and engine-replayable (DuckDB:
    ``CAST('0x' || substr(md5(x), 1, 13) AS BIGINT) / 2^52``) — the
    building block for KMV sketches and hash-based sampling, where
    ``rand()`` would be non-reproducible and engine-specific.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _hash_fraction_from_md5(F.md5(c.cast("string")))


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    k: int = 256,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate per group.

    The estimator is the classic bottom-k sketch: hash every distinct
    value to a uniform fraction, keep the k smallest, and estimate
    ``DV ~= (k-1) / h_(k)`` (k-th smallest fraction); groups with
    fewer than k distinct values report the exact count (the sketch
    IS the full value set there).  Relative std error ~= 1/sqrt(k-2).

    Unlike HLL, every step is deterministic integer/dyadic arithmetic,
    so the estimate is bit-identical across engines and SQL-replayable
    — an *oracle-checkable* approximate distinct count.

    Plan shape: distinct (one shuffle, map-side partial), then the
    TWO-LEVEL bottom-k of :func:`kmv_bottom_k` (per-(group, salt)
    partial sketches merged by a bounded re-rank) and the
    :func:`kmv_estimate` estimator over the merged sketch.  No window
    partition ever holds a group's full distinct value set — the r08
    formulation ranked ``row_number() OVER (PARTITION BY group)``
    over the raw distinct stream, which put the ENTIRE vocabulary of
    a hot (or global) group in one task's sort at 100 TB.  Output is
    bit-identical by the mergeability identity (the k smallest
    hashes of a union are a subset of the union of each part's k
    smallest — the same identity q103's gate hash proves), so the
    SQL oracles replay the one-level construction unchanged.

    Returns ``group_cols + [approx_distinct]``.
    """
    return kmv_estimate(
        kmv_bottom_k(df, group_cols, val_col, k), group_cols, k
    )


def observed_write(
    df: DataFrame,
    writer_fn,
    count_col_nonnull: str | None = None,
) -> dict[str, int]:
    """Write ``df`` via ``writer_fn(observed_df)`` and return metrics
    gathered during that same action: row count and (optionally) the
    non-null count of one column.

    Example::

        metrics = observed_write(state, lambda d: d.write.parquet(p))
    """
    obs = Observation("write_metrics")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if count_col_nonnull:
        aggs.append(F.count(count_col_nonnull).alias("n_nonnull"))
    observed = df.observe(obs, *aggs)
    writer_fn(observed)
    got = obs.get
    return {k: int(v) for k, v in got.items()}


def kmv_bottom_k(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group bottom-k hash rows ``group_cols + [h]`` — the KMV
    sketch in its MERGEABLE form: because the k smallest hashes of a
    union are a subset of the union of each part's k smallest,
    re-ranking unioned sketch frames reproduces EXACTLY the sketch of
    the combined data (:func:`kmv_estimate` does the re-rank).  That
    identity is what lets 1000 executors sketch independently and a
    coordinator merge ``parts x k`` rows instead of re-scanning —
    demonstrated and oracle-checked by q103.

    Construction is TWO-LEVEL so no window partition ever sorts a
    group's full distinct value set (the global sketch
    ``group_cols=[]`` would otherwise be one task sorting the whole
    vocabulary): bottom-k per (group, md5-salt-bucket) — every
    partition bounded to ~1/:data:`_KMV_SALT_BUCKETS` of the group —
    then the partials merge through a re-rank that sees at most
    ``salt_buckets x k`` rows per group.  By the subset identity
    above the merged bottom-k is BIT-IDENTICAL to a direct one-level
    rank, so estimates (and the q49/q103 oracle hashes, which replay
    the one-level SQL) are unchanged."""
    c = F.col(val_col)
    dh = (
        df.select(*group_cols, val_col)
        .distinct()
        .withColumn("__md5", F.md5(c.cast("string")))
        .select(
            *group_cols,
            _hash_fraction_from_md5(F.col("__md5")).alias("h"),
            (
                F.conv(F.substring("__md5", 14, 2), 16, 10).cast("int")
                % _KMV_SALT_BUCKETS
            ).alias("__salt"),
        )
    )
    w_part = Window.partitionBy(*group_cols, "__salt").orderBy("h")
    partial = (
        dh.withColumn("rn", F.row_number().over(w_part))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h")
    )
    w_merge = Window.partitionBy(*group_cols).orderBy("h")
    return (
        partial.withColumn("rn", F.row_number().over(w_merge))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h")
    )


def kmv_pair_overlap(
    sketch: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap estimates between groups, computed from
    their bottom-k sketches ALONE — the cross-shard diagnostic a
    100 TB corpus runs without rescanning raw data: each shard ships
    ``k`` hash rows, and every pairwise distinct/union/intersection/
    Jaccard estimate derives from sketch algebra.

    For each group pair (a < b): union the two sketch row sets (a
    value present in both carries the same md5 hash, so plain
    ``distinct`` dedupes it), re-rank to bottom-k — by the
    mergeability identity this IS the union's sketch — and estimate
    ``|A ∪ B|``; then ``|A ∩ B| = |A| + |B| - |A ∪ B|`` by
    inclusion-exclusion (clamped at 0 — estimator noise can push the
    difference negative) and ``J = |A ∩ B| / |A ∪ B|``.  Every
    quantity is integer until the single final division, so the
    DuckDB oracle replays bit-for-bit; when both groups hold fewer
    than k distinct values the sketches ARE the full sets and every
    number is exact.

    Scale shape: per-group estimates reuse :func:`kmv_estimate`; the
    pair frame is |groups|² rows (groups = shards/sources — small by
    definition) joined against the sketch frame (≤ groups x k rows),
    and each pair's re-rank window holds at most 2k rows.  Returns
    ``(group_a, group_b, est_a, est_b, est_union, est_inter,
    jaccard_est)``.
    """
    ga, gb = "group_a", "group_b"
    est = kmv_estimate(sketch, [group_col], k)
    gs = sketch.select(F.col(group_col).alias("__g")).distinct()
    pairs = (
        gs.select(F.col("__g").alias(ga))
        .join(gs.select(F.col("__g").alias(gb)), F.col(ga) < F.col(gb))
    )
    both = (
        pairs.join(
            sketch.select(F.col(group_col).alias(ga), "h"), ga
        )
        .select(ga, gb, "h")
        .unionByName(
            pairs.join(
                sketch.select(F.col(group_col).alias(gb), "h"), gb
            ).select(ga, gb, "h")
        )
        .distinct()
    )
    w = Window.partitionBy(ga, gb).orderBy("h")
    ranked = both.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    union_est = ranked.groupBy(ga, gb).agg(
        F.count(F.lit(1)).alias("nd"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    ).select(
        ga,
        gb,
        F.when(F.col("nd") < k, F.col("nd"))
        .otherwise(F.floor((k - 1) / F.col("hk")))
        .cast("long")
        .alias("est_union"),
    )
    ea = est.select(
        F.col(group_col).alias(ga), F.col("approx_distinct").alias("est_a")
    )
    eb = est.select(
        F.col(group_col).alias(gb), F.col("approx_distinct").alias("est_b")
    )
    inter = F.greatest(
        F.lit(0).cast("long"),
        F.col("est_a") + F.col("est_b") - F.col("est_union"),
    )
    return (
        union_est.join(F.broadcast(ea), ga)
        .join(F.broadcast(eb), gb)
        .select(
            ga,
            gb,
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_inter"),
            F.round(
                inter.cast("double") / F.col("est_union"), 6
            ).alias("jaccard_est"),
        )
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Distinct-count estimate from (possibly merged) bottom-k sketch
    rows: dedupe hashes (the same value sketched in two parts carries
    the same hash — KMV is over distinct values), re-rank, estimate
    ``(k-1)/h_(k)`` (exact count below k).  With ``group_cols=[]``
    the re-rank window is a single partition — bounded by
    construction (≤ parts x k sketch rows ever reach it), which is
    the whole point of merging sketches instead of raw data."""
    dh = sketch.select(*group_cols, "h").distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = dh.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    est = F.when(F.col("nd") < k, F.col("nd")).otherwise(
        F.floor((k - 1) / F.col("hk"))
    )
    agg = [
        F.count(F.lit(1)).alias("nd"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    ]
    grouped = (
        ranked.groupBy(*group_cols).agg(*agg)
        if group_cols
        else ranked.agg(*agg)
    )
    return grouped.select(
        *group_cols, est.cast("long").alias("approx_distinct")
    )


def hash_sample_bottom_k(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    val_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group deterministic uniform ROW sample in mergeable
    bottom-k form — the quantile-sketch counterpart of
    :func:`kmv_bottom_k` (which samples the distinct VALUE set; this
    samples rows, which is what order statistics need).

    Every row hashes its unique ``id_col`` to the canonical 52-bit
    md5 fraction and the k smallest hashes win: a uniform sample
    that, unlike ``rand()``, is reproducible from the ids alone and
    — by the same order-by-key subset identity as KMV — MERGEABLE:
    the k smallest of a union are a subset of the union of each
    part's k smallest, so disjoint shards can sketch independently
    and a coordinator re-rank reproduces the direct sketch
    bit-for-bit (q112 proves this through the gate hash).

    Construction is the same two-level shape as :func:`kmv_bottom_k`
    (bottom-k per (group, md5-salt-bucket), then a merge re-rank over
    at most ``salt_buckets x k`` rows per group) so no window
    partition ever sorts a group's full row set.  Ties on ``h``
    (md5 collisions) break on the value, keeping every rank total
    and engine-replayable.  Returns ``group_cols + [h, val_col]``."""
    md5c = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        *group_cols,
        F.col(val_col),
        _hash_fraction_from_md5(md5c).alias("h"),
        (
            F.conv(F.substring(md5c, 14, 2), 16, 10).cast("int")
            % _KMV_SALT_BUCKETS
        ).alias("__salt"),
    )
    w_part = Window.partitionBy(*group_cols, "__salt").orderBy("h", val_col)
    partial = (
        base.withColumn("rn", F.row_number().over(w_part))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h", val_col)
    )
    w_merge = Window.partitionBy(*group_cols).orderBy("h", val_col)
    return (
        partial.withColumn("rn", F.row_number().over(w_merge))
        .filter(F.col("rn") <= k)
        .select(*group_cols, "h", val_col)
    )


def sample_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    val_col: str,
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    k: int = 256,
) -> DataFrame:
    """Quantile estimates from (possibly merged) bottom-k row-sample
    sketches: re-rank the unioned sketch rows by ``(h, value)`` and
    keep k (the merge — bit-identical to a direct sketch of the
    combined rows by the subset identity), then per group take the
    LOWER discrete order statistic ``value[(floor(p * (n-1)))]``
    (0-based) of the sample sorted by value.

    Discrete selection — never interpolation — means the estimate is
    an actual data value and the whole computation is rank
    arithmetic: exact cross-engine, and exact-exact (not just
    sketch-exact) whenever the group has <= k rows, where the sample
    IS the group.  Every window is bounded by construction (<=
    parts x k rows reach the merge; <= k the selection).  Returns
    ``group_cols + [p, q_value]``, one row per (group, p)."""
    dh = sketch.select(*group_cols, "h", val_col).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h", val_col)
    samp = (
        dh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    wv = Window.partitionBy(*group_cols).orderBy(F.col(val_col), F.col("h"))
    wn = Window.partitionBy(*group_cols)
    ranked = samp.withColumn("rv", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    pf = ranked.select(
        *group_cols,
        F.col(val_col),
        "rv",
        "n",
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
    )
    return pf.filter(
        F.col("rv") == F.floor(F.col("p") * (F.col("n") - 1)) + 1
    ).select(*group_cols, "p", F.col(val_col).alias("q_value"))


def robust_outlier_stats(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    val_col: str,
    k: int = 256,
    n_sigmas: float = 3.0,
    round_scale: int = 6,
) -> DataFrame:
    """Per-group robust (median/MAD) outlier statistics — the
    monitoring diagnostic that survives the heavy tails a mean/stddev
    z-score drowns in.

    EXACT medians need a per-group total sort — a hot-key window at
    100 TB — so the center and spread come from the deterministic
    :func:`hash_sample_bottom_k` sketch instead (discrete order
    statistics via :func:`sample_quantiles`'s selection rule, exact
    whenever the group holds <= k rows), and only the cheap part
    touches the full data: ONE scan flagging
    ``|x - med| > n_sigmas * 1.4826 * mad`` against the broadcast
    |groups|-row stats frame.  Every number is either a data value
    (med/mad), an integer count, or one fixed float chain, so the
    whole diagnostic replays bit-for-bit in SQL.

    Plan shape: sketch construction (bounded two-level windows), a
    <= k-row deviation re-rank per group, one broadcast equi-join
    scan with a map-side-combinable count.  Returns ``group_cols +
    (n, med_est, mad_est, n_outliers, outlier_ratio)``."""
    sk = hash_sample_bottom_k(df, group_cols, id_col, val_col, k=k)
    med = sample_quantiles(sk, group_cols, val_col, ps=(0.5,), k=k).select(
        *group_cols, F.col("q_value").alias("__med")
    )
    # deviation median over the SAME sketch rows (<= k per group)
    dev = sk.join(F.broadcast(med), group_cols).select(
        *group_cols,
        "h",
        F.abs(F.col(val_col) - F.col("__med")).alias("__dev"),
    )
    wv = Window.partitionBy(*group_cols).orderBy(F.col("__dev"), F.col("h"))
    wn = Window.partitionBy(*group_cols)
    mad = (
        dev.withColumn("rv", F.row_number().over(wv))
        .withColumn("ns", F.count(F.lit(1)).over(wn))
        .filter(
            F.col("rv")
            == F.floor(F.lit(0.5) * (F.col("ns") - 1)) + 1
        )
        .select(*group_cols, F.col("__dev").alias("__mad"))
    )
    stats = med.join(mad, group_cols)
    cut = F.lit(float(n_sigmas)) * F.lit(1.4826) * F.col("__mad")
    flagged = df.join(F.broadcast(stats), group_cols).select(
        *group_cols,
        F.col("__med"),
        F.col("__mad"),
        (F.abs(F.col(val_col) - F.col("__med")) > cut).alias("__out"),
    )
    return (
        flagged.groupBy(*group_cols, "__med", "__mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__out").cast("long")).alias("n_outliers"),
        )
        .select(
            *group_cols,
            "n",
            F.col("__med").alias("med_est"),
            F.col("__mad").alias("mad_est"),
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double") / F.col("n").cast("double"),
                round_scale,
            ).alias("outlier_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# count-min sketch — the frequency counterpart of the KMV distinct
# sketch: bounded mergeable state (depth x width int64 counters) that
# upper-bounds every item's frequency
# ---------------------------------------------------------------------------


def countmin_counts(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """The count-min counter frame of an item stream: one row per
    (hash row ``r``, bucket), ``cnt`` = number of stream items whose
    ``r``-th hash lands in that bucket.

    Bucket ``r`` of item ``t`` is ``md5("cm{r}:" || t)``'s first 8
    hex digits mod ``width`` — a deterministic, engine-replayable
    hash family (the repo-wide md5 idiom; DuckDB replays it as
    ``CAST('0x' || substring(md5(..), 1, 8) AS BIGINT) % width``).

    Scale properties (why a 100 TB pipeline keeps this instead of a
    full ``groupBy(item)``): the output is AT MOST ``depth x width``
    rows REGARDLESS of input size or cardinality — map-side partial
    aggregation absorbs everything (each task emits <= depth*width
    partial rows), no hot-key hazard exists because the state is the
    whole point, and two frames built over different shards MERGE by
    summing counts per (r, bucket) — counters are linear.  The
    estimate ``min_r cnt[r][bucket_r(t)]`` never under-counts
    (one-sided error), over-counts by collision mass ~N*depth/width.
    """
    structs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"cm{r}:"),
                                    F.col(item_col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(structs).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    counts: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each candidate item: the estimate
    is ``min`` over the ``depth`` hash rows of the candidate's bucket
    count (``0`` when a bucket was never touched — left join +
    coalesce, so unseen items probe to 0 rather than vanishing).

    The counter frame is bounded (depth x width rows) and broadcasts;
    the candidate side can be arbitrarily large and never shuffles
    more than one small aggregate.  ``depth`` and ``width`` must
    match the build call — the hash family is derived from them.
    """
    structs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"cm{r}:"),
                                    F.col(item_col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    probes = candidates.select(
        F.col(item_col), F.explode(structs).alias("rb")
    ).select(item_col, F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counts), ["r", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )

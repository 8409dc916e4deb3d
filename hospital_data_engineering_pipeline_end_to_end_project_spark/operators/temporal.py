"""Temporal join operators Spark lacks as primitives: as-of join,
binned range join, and gap-based sessionization.

Each is a composition of existing DataFrame ops (SURVEY build rule:
prefer compositions over UDFs), shaped so the shuffle keys keep work
distributed:

- as-of join: union-tag + window (the merge-sort idiom) — one shuffle
  on the join key, no per-row subquery, no row explosion.
- range join: equi-join on time *bins* + residual predicate — turns
  an O(n x m) interval cross into co-located bin buckets (the
  standard bin/bucket optimization for interval joins).
- sessionize: lag + cumulative-sum-of-gap-flags window — the classic
  two-window formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` (direction='backward'; 'forward' takes
    the earliest right row at-or-after).

    Merge-sort idiom: union both sides tagged, one window partitioned
    by the key and ordered by time carries the most recent right-side
    values forward (``last(..., ignorenulls=True)``), then keep left
    rows.  Exactly one shuffle on ``on``; scales with
    |left|+|right| per key — never builds per-row candidate sets.
    """
    lt = left.select(
        F.col(on),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in right_values],
    )
    rt = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_values],
    )
    unioned = lt.unionByName(rt)

    if direction == "backward":
        # right rows sort before left rows at equal timestamps so a
        # tie (right_time == left_time) is matched
        w = Window.partitionBy(on).orderBy(
            F.col("__t").asc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
    elif direction == "forward":
        w = Window.partitionBy(on).orderBy(
            F.col("__t").desc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
    else:
        raise ValueError(f"unknown direction {direction!r}")

    filled = unioned.select(
        "*",
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"__filled_{c}")
            for c in right_values
        ],
    )
    out = filled.filter(F.col("__is_left") == 1).select(
        F.col("__lrow.*"),
        *[F.col(f"__filled_{c}").alias(c) for c in right_values],
    )
    return out


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str | None,
    left_start: Column,
    left_end: Column,
    right_time: Column,
    bin_width_sec: int,
) -> DataFrame:
    """Join right rows whose time falls in [left_start, left_end).

    Each left interval is exploded to the bins it overlaps; the join
    is an equi-join on (key, bin) plus the residual range predicate —
    candidate pairs are only those sharing a bin, so cost tracks
    interval density, not |left| x |right|.  ``bin_width_sec`` should
    be on the order of the typical interval length.
    """
    # exact floor division on longs: double division + cast truncates
    # toward zero (negative epochs land in the wrong bin — a DROPPED
    # match, since the residual predicate only removes false positives)
    # and loses precision past 2^53.  Subtracting the non-negative
    # pmod remainder first makes plain integral DIV an exact floor.
    w = int(bin_width_sec)

    def _floor_bin(col: str) -> Column:
        return F.expr(f"({col} - pmod({col}, {w})) DIV {w}")

    lbins = (
        left.withColumn("__ls", left_start.cast("long"))
        .withColumn("__le", left_end.cast("long"))
        .withColumn("__le1", F.col("__le") - F.lit(1))
        .withColumn(
            "__bin",
            F.explode(F.sequence(_floor_bin("__ls"), _floor_bin("__le1"))),
        )
        .drop("__le1")
    )
    rbins = right.withColumn("__rt", right_time.cast("long")).withColumn(
        "__bin", _floor_bin("__rt")
    )
    cond = (F.col("l.__bin") == F.col("r.__bin")) & (
        F.col("r.__rt") >= F.col("l.__ls")
    ) & (F.col("r.__rt") < F.col("l.__le"))
    if on:
        cond = cond & (F.col(f"l.{on}") == F.col(f"r.{on}"))
    return (
        lbins.alias("l")
        .join(rbins.alias("r"), cond)
        .drop("__bin", "__ls", "__le", "__rt")
    )


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds ``gap`` (same unit as
    ``time_col``).  ``order_cols`` break timestamp ties so the lag
    sequence — and therefore session numbering — is deterministic.
    Adds ``session_id`` (1-based per key) via lag + running sum."""
    t = F.col(time_col).cast("long")
    w = Window.partitionBy(key).orderBy(time_col, *(order_cols or []))
    new_session = F.when(
        (t - F.lag(t).over(w)) > gap, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) + 1,
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    group_col: str,
    round_scale: int = 6,
) -> DataFrame:
    """Time-weighted average (TWAP) of ``value_col`` per
    ``group_col``: each observation holds until the key's NEXT
    observation, so its weight is the integer duration to that next
    timestamp — the step-function integral divided by total time,
    the standard aggregate for irregularly-sampled series (sensor
    states, prices, queue depths) where a plain AVG over-weights
    bursts.

    Segments come from one ``lead`` window per key (ordered by
    ``(ts, id)`` — the id tiebreak keeps equal-timestamp orders
    total, so the fold is deterministic); a key's LAST observation
    has no duration and is dropped, and each segment is attributed
    to its STARTING row's group.  The weighted sum is exact decimal
    arithmetic — ``DECIMAL(18,6) value x DECIMAL(18,0) integer
    duration`` products summed as decimals (order-independent, the
    `plans/relational.py` dsum discipline) — with ONE final double
    division, so the result replays bit-for-bit in SQL.

    Plan shape: one shuffle on ``key_col`` for the lead window, then
    a map-side-combinable groupBy on ``group_col`` — both scale-safe
    (keys are users/devices: many and unskewed; a hot key would be
    one device's full history, the irreducible unit of this
    computation).  ``ts_col`` must be an integer timestamp (exact
    epoch micros here); returns ``(group_col, n_segments,
    total_dur, twap)``."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    seg = (
        df.select(group_col, key_col, ts_col, id_col, value_col)
        .withColumn("__dur", F.lead(ts_col).over(w) - F.col(ts_col))
        .filter(F.col("__dur").isNotNull())
    )
    # DECIMAL(20,0) duration: wide enough that the product runs in
    # 128-bit on both engines (DuckDB overflows the int64 fast path
    # at DECIMAL(18,0) for month-scale micro durations)
    wv = F.col(value_col).cast("decimal(18,6)") * F.col("__dur").cast(
        "decimal(20,0)"
    )
    return seg.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("__dur").alias("total_dur"),
        F.round(
            F.sum(wv).cast("double")
            / F.nullif(F.sum("__dur").cast("double"), F.lit(0.0)),
            round_scale,
        ).alias("twap"),
    )


def cusum_drift(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    k_scaled: int,
    scale: int = 1000,
) -> DataFrame:
    """Per-group CUSUM upward-drift detection — the classic sequential
    change-point statistic ``S_i = max(0, S_{i-1} + (v_i - k))``
    (Page's test: an alarm when a metric's cumulative excess over the
    allowance ``k`` builds up), made DATA-PARALLEL by the prefix-min
    identity:

        T_i = Σ_{j<=i} (v_j - k)            (one prefix-sum window)
        S_i = T_i - min(0, min_{j<=i} T_j)  (one running-min window)

    — by induction S_i equals the sequential recurrence exactly, so a
    scan-order algorithm becomes two shuffle-free-after-one-exchange
    windows per group instead of a driver-side loop.  Values are
    quantized to integers first (``floor(v * scale + 0.5)``, exact in
    IEEE for the magnitudes involved), so every sum/min/max is INTEGER
    — no accumulation-order concern, and the oracle replays the same
    two windows bit-for-bit.

    ``order_col`` defines the sequence and must be unique per group
    (duplicate keys would make even the sequential definition
    tie-order-dependent).  Scale shape: window partitions are
    per-group histories (the q113/q115 contract — groups multiply
    with data, sizes stay bounded); the peak aggregate is map-side
    combinable.

    Returns ``(group_col, n_events, peak_cusum)`` — the max drift
    statistic per group, alarm threshold left to the caller.
    """
    v = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.sum(v - F.lit(k_scaled)).over(w)
    d = df.select(group_col, order_col, value_col).withColumn("__t", t)
    s = F.col("__t") - F.least(F.min("__t").over(w), F.lit(0).cast("long"))
    return (
        d.withColumn("__s", s)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("__s").cast("long").alias("peak_cusum"),
        )
    )


def cusum_segment_summary(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    k_scaled: int,
    scale: int = 1000,
) -> DataFrame:
    """Per-group ASSOCIATIVE segment summary for CUSUM — the streaming
    counterpart of :func:`cusum_drift`.  A micro-batch is a contiguous
    segment of each group's sequence (ingest order); this computes the
    four integers that let segments fold without revisiting raw rows:

    - ``s`` — the segment's total excess ``sum(v_i - k)``
    - ``m`` — min over the segment's (non-empty) prefix sums
    - ``x`` — max over the segment's prefix sums
    - ``q`` — the segment's RELATIVE peak ``max_i (t_i - min_{j<=i}
      t_j)`` (no zero floor — the floor belongs to the left context)

    Fold (:func:`cusum_fold_summaries`): with carried state ``(T =
    total so far, Mg = min(0, min global prefix), P = peak so far)``,
    a segment's contribution to ``S_i = T_i - min(0, min_j T_j)``
    splits by whether the running min lands left or inside the
    segment: ``S_i = max(T - Mg + t_i, t_i - m_i)``, so the segment's
    peak is ``max(T - Mg + x, q)`` and the state advances ``Mg' =
    min(Mg, T + m)``, ``T' = T + s`` — INTEGER arithmetic end-to-end,
    so the fold is bit-identical to :func:`cusum_drift` over the
    concatenated stream (test-pinned).  Same two windows as the batch
    operator; partitions are per-group WITHIN-BATCH histories.

    Returns ``(group_col, n, s, m, x, q)`` — one row per group that
    appears in the segment.
    """
    dv = (
        F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
        - F.lit(int(k_scaled))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = (
        df.select(group_col, order_col, value_col)
        .withColumn("__t", F.sum(dv).over(w))
        .withColumn("__m", F.min("__t").over(w))
    )
    return d.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("__t").cast("long").alias("x"),
        F.min("__m").cast("long").alias("m"),
        F.max(F.col("__t") - F.col("__m")).cast("long").alias("q"),
        # segment total = last prefix sum = plain sum of dv
        # (order-free on integers)
        F.sum(dv).cast("long").alias("s"),
    )


def cusum_fold_summaries(
    summaries: DataFrame,
    group_col: str,
    batch_col: str,
) -> DataFrame:
    """Fold per-batch CUSUM segment summaries (oldest batch first)
    into the whole-stream statistic — returns ``(group_col, n_events,
    peak_cusum)`` exactly as :func:`cusum_drift` would over the
    concatenated stream.

    The fold is the 3-integer-state recurrence documented on
    :func:`cusum_segment_summary`; it is sequential per group but
    runs over SUMMARY rows (one per batch the group appeared in —
    thousands at most over a pipeline lifetime, never raw events), so
    an Arrow-batched ``applyInPandas`` per group is bounded by batch
    count, not data size.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    gf = summaries.schema[group_col]
    out_schema = StructType(
        [
            StructField(group_col, gf.dataType, gf.nullable),
            StructField("n_events", LongType(), False),
            StructField("peak_cusum", LongType(), False),
        ]
    )

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(batch_col)
        big_t = 0
        mg = 0
        peak = 0
        n = 0
        for s, m, x, q, cnt in zip(
            pdf["s"], pdf["m"], pdf["x"], pdf["q"], pdf["n"]
        ):
            peak = max(peak, big_t - mg + int(x), int(q))
            mg = min(mg, big_t + int(m))
            big_t += int(s)
            n += int(cnt)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "n_events": [n], "peak_cusum": [peak]}
        )

    return summaries.groupBy(group_col).applyInPandas(fold, schema=out_schema)


def cusum_compose_summaries(
    summaries: DataFrame,
    group_col: str,
    batch_col: str,
) -> DataFrame:
    """Compose each group's per-batch CUSUM segment summaries (oldest
    batch first) into ONE summary row per group — the segment monoid's
    associative product, which is what makes the CUSUM monitor's shard
    store COMPACTIBLE: folding batches ``<= N`` into a single
    ``(n, s, m, x, q)`` row stamped ``batch_col = N`` is value-neutral
    through :func:`cusum_fold_summaries` (pinned by
    ``tests/test_stream_monitor.py``), because a composed prefix folds
    to exactly the same ``(T, Mg, P)`` carried state.

    Segment product (A then B) — m/x/q are offset by A's total before
    combining, since B's prefix sums sit ``s_A`` higher and the global
    running min can land either left of or inside B:

        s' = s_A + s_B
        m' = min(m_A, s_A + m_B)
        x' = max(x_A, s_A + x_B)
        q' = max(q_A, q_B, s_A + x_B - m_A)

    INTEGER arithmetic end-to-end, so composition introduces no
    rounding.  Output schema matches :func:`cusum_segment_summary`
    plus ``batch_col`` (= the group's max batch id, which sorts the
    composed row before any later batch by sequential-commit order).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    gf = summaries.schema[group_col]
    out_schema = StructType(
        [
            StructField(group_col, gf.dataType, gf.nullable),
            StructField("n", LongType(), False),
            StructField("x", LongType(), False),
            StructField("m", LongType(), False),
            StructField("q", LongType(), False),
            StructField("s", LongType(), False),
            StructField(batch_col, LongType(), False),
        ]
    )

    def compose(pdf):
        import pandas as pd

        pdf = pdf.sort_values(batch_col)
        first = True
        n = s = m = x = q = 0
        for nb, sb, mb, xb, qb in zip(
            pdf["n"], pdf["s"], pdf["m"], pdf["x"], pdf["q"]
        ):
            nb, sb, mb, xb, qb = int(nb), int(sb), int(mb), int(xb), int(qb)
            if first:
                n, s, m, x, q = nb, sb, mb, xb, qb
                first = False
                continue
            q = max(q, qb, s + xb - m)
            m = min(m, s + mb)
            x = max(x, s + xb)
            s = s + sb
            n = n + nb
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "x": [x],
                "m": [m],
                "q": [q],
                "s": [s],
                batch_col: [int(pdf[batch_col].max())],
            }
        )

    return summaries.groupBy(group_col).applyInPandas(compose, schema=out_schema)

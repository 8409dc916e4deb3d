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

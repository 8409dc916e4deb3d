"""SCD Type-2 merge engine.

The reference's centerpiece is a per-entity Delta ``MERGE`` repeated
six times (``Silver Layer.py:79-120,221-263,318-365,431-475,532-559,
626-653``) with known semantic defects (SURVEY.md 2.6): it expires a
changed row but never inserts the new version ("half-SCD2"), uses
null-unsafe ``!=`` change predicates, and can throw on duplicate
business keys in a batch.

This engine implements *full* SCD2 on vanilla Spark DataFrames:

- expire AND insert the new current version in one pass;
- null-safe change detection (``NOT (a <=> b)``);
- composite business keys (billing's ``billing_id + service``,
  ``Silver Layer.py:230-234``);
- deterministic pre-merge batch dedupe (latest-wins window) so
  duplicate keys in a batch cannot fan out;
- injected ``processing_date`` (the reference stamps wall-clock
  ``current_date()``, ``Silver Layer.py:74`` — untestable);
- idempotent re-runs: replaying an identical batch is a no-op.

Physical shape (designed for 100 TB state):
one shuffle on the business key (the full-outer join), then each
joined row emits 0-2 output rows via an ``explode(array(struct...))``
— the classic staged-union MERGE idiom collapsed into a single join
execution instead of 3 re-reads of the join output.  History rows
(``is_current = false``) never enter the join: they are
filter-partition-pruned and unioned back untouched, so merge cost
scales with |current| + |batch|, not |history|.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EFFECTIVE = "effective_date"
END = "end_date"
CURRENT = "is_current"
META_COLS = (EFFECTIVE, END, CURRENT)


@dataclass
class Scd2Spec:
    """Declarative merge spec for one entity."""

    keys: list[str]
    #: attributes whose change triggers a new version; default = every
    #: non-key, non-metadata column
    tracked: list[str] | None = None
    #: deterministic within-batch ordering; highest wins the dedupe
    order_by: list[str] = field(default_factory=list)


def stamp(batch: DataFrame, processing_date: str) -> DataFrame:
    """Add SCD2 metadata columns (parity: ``Silver Layer.py:74-76``,
    with an injected date instead of ``current_date()``)."""
    return (
        batch.withColumn(EFFECTIVE, F.lit(processing_date).cast("date"))
        .withColumn(END, F.lit(None).cast("date"))
        .withColumn(CURRENT, F.lit(True))
    )


def dedupe_batch(batch: DataFrame, spec: Scd2Spec) -> DataFrame:
    """Latest-wins dedupe by business key before merging.

    The reference merges raw batches and can hit Delta's
    multiple-match error (SURVEY 7.3).  Ordering is deterministic:
    ``order_by`` desc first, then every remaining column desc as a
    total tiebreak.
    """
    non_key = [c for c in batch.columns if c not in spec.keys]
    order_cols = [F.col(c).desc_nulls_last() for c in spec.order_by] + [
        F.col(c).desc_nulls_last() for c in non_key if c not in spec.order_by
    ]
    if not order_cols:
        return batch.dropDuplicates(spec.keys)
    w = Window.partitionBy(*spec.keys).orderBy(*order_cols)
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _changed_predicate(tracked: list[str]) -> Column:
    """Null-safe any-attribute-changed across old/new aliases."""
    pred = F.lit(False)
    for c in tracked:
        pred = pred | ~F.col(f"old.{c}").eqNullSafe(F.col(f"new.{c}"))
    return pred


def initial_load(batch: DataFrame, spec: Scd2Spec, processing_date: str) -> DataFrame:
    """First load: dedupe + stamp (parity: create path,
    ``Silver Layer.py:119-120``)."""
    return stamp(dedupe_batch(batch, spec), processing_date)


def merge(
    state: DataFrame,
    batch: DataFrame,
    spec: Scd2Spec,
    processing_date: str,
    partition_filter: Column | str | None = None,
) -> DataFrame:
    """Full SCD2 merge of a new batch into versioned state.

    Returns the complete new state (history + current).  ``state``
    must carry the metadata columns; ``batch`` must not.

    ``partition_filter`` — optional predicate (Column or SQL string)
    bounding which CURRENT rows the batch can possibly match; rows
    outside it bypass the join untouched, exactly like history rows.
    When ``state`` is read from a partitioned source and the predicate
    references partition columns, it reaches the scan as a
    PartitionFilter (asserted by ``tests/test_plan_contracts.py``) —
    so a batch touching a few partitions reads a few partitions, not
    the full current set (the SURVEY §7.3 scale risk; the Gold side's
    ``refresh_fact_partitions`` is the same idea for facts).
    CORRECTNESS CONTRACT, caller-owed: every current row whose
    business key appears in the batch must satisfy the predicate —
    a matching row outside it is invisible to change detection, so
    the merge would insert a duplicate current version.  Predicates
    evaluating NULL count as out-of-scope (the row bypasses, nothing
    is lost).
    """
    entity_cols = [c for c in batch.columns]
    tracked = spec.tracked or [c for c in entity_cols if c not in spec.keys]
    out_cols = entity_cols + list(META_COLS)

    batch = dedupe_batch(batch, spec)
    in_scope = F.col(CURRENT)
    bypass = ~F.col(CURRENT)
    if partition_filter is not None:
        pf = (
            F.expr(partition_filter)
            if isinstance(partition_filter, str)
            else partition_filter
        )
        # NULL-evaluating predicates must land in exactly one branch:
        # coalesce to false -> the row bypasses instead of vanishing
        pf = F.coalesce(pf, F.lit(False))
        in_scope = F.col(CURRENT) & pf
        bypass = ~F.col(CURRENT) | ~pf
    # presence flags, not key-null checks: business keys containing
    # NULL would otherwise be misclassified as unmatched on both sides
    current = (
        state.filter(in_scope).withColumn("__present", F.lit(1)).alias("old")
    )
    history = state.filter(bypass)
    new = (
        stamp(batch, processing_date).withColumn("__present", F.lit(1)).alias("new")
    )

    join_cond = F.lit(True)
    for k in spec.keys:
        join_cond = join_cond & F.col(f"old.{k}").eqNullSafe(F.col(f"new.{k}"))
    joined = current.join(new, join_cond, "full_outer")

    matched = F.col("old.__present").isNotNull() & F.col(
        "new.__present"
    ).isNotNull()
    batch_only = F.col("old.__present").isNull()
    has_change = _changed_predicate(tracked)

    def row_from(side: str, **overrides: Column) -> Column:
        fields = []
        for c in out_cols:
            col = overrides.get(c, F.col(f"{side}.{c}"))
            fields.append(col.alias(c))
        return F.struct(*fields)

    old_row = row_from("old")
    expired_old = row_from(
        "old",
        **{
            END: F.lit(processing_date).cast("date"),
            CURRENT: F.lit(False),
        },
    )
    new_row = row_from("new")

    emitted = (
        F.when(batch_only, F.array(new_row))
        .when(~matched, F.array(old_row))  # state-only key
        .when(matched & has_change, F.array(expired_old, new_row))
        .otherwise(F.array(old_row))  # matched, unchanged — idempotent
    )

    merged = joined.select(F.explode(emitted).alias("r")).select("r.*")
    return merged.unionByName(history.select(*out_cols))


def pit_join(
    facts: DataFrame,
    state: DataFrame,
    keys: list[str],
    as_of_col: str,
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    valid at its ``as_of_col`` date — the consumption pattern SCD2
    history exists for (the reference materializes only current-row
    dims, so historical facts silently join to today's attributes).

    Validity is ``effective_date <= as_of < end_date`` with an open
    end for current rows; on a version boundary day the NEW version
    wins (expiry is exclusive), matching the merge's same-day
    transition semantics.

    Physical shape: equi-join on the business key (one shuffle), the
    validity window as a residual predicate.  Per-key version counts
    are bounded by change frequency, so the pre-filter fan-out is
    |facts| x avg_versions — small — and AQE handles a hot key.
    """
    f = facts.alias("f")
    s = state.alias("s")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"f.{k}") == F.col(f"s.{k}"))
    as_of = F.col(f"f.{as_of_col}")
    cond = (
        cond
        & (F.col(f"s.{EFFECTIVE}") <= as_of)
        & (F.col(f"s.{END}").isNull() | (as_of < F.col(f"s.{END}")))
    )
    state_cols = [
        F.col(f"s.{c}") for c in state.columns if c not in keys
    ]
    return f.join(s, cond).select("f.*", *state_cols)


def cdc_feed(state: DataFrame, keys: list[str], date: str) -> DataFrame:
    """Change-data-capture view of one merge day: what changed on
    ``date``, as (key, op, before_*, after_*) rows — the feed a
    downstream consumer (search index, cache, reverse ETL) subscribes
    to instead of diffing full snapshots.

    Derived purely from the SCD2 metadata: versions *effective* on
    ``date`` are the after-image, versions *expired* on ``date`` the
    before-image; a key with both is an ``update``, after-only is an
    ``insert``, before-only a ``delete`` (not produced by this
    engine's merge, but the feed supports consuming states that do).

    One shuffle (the key join) over only the rows stamped with that
    date — at 100 TB the effective/end date predicates prune to the
    day's delta, never the full history.
    """
    entity_cols = [c for c in state.columns if c not in keys and c not in META_COLS]
    after = state.filter(F.col(EFFECTIVE) == F.lit(date).cast("date")).alias("a")
    before = state.filter(F.col(END) == F.lit(date).cast("date")).alias("b")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
    joined = after.join(before, cond, "full_outer")
    has_after = F.col(f"a.{EFFECTIVE}").isNotNull()
    has_before = F.col(f"b.{END}").isNotNull()
    op = (
        F.when(has_after & has_before, F.lit("update"))
        .when(has_after, F.lit("insert"))
        .otherwise(F.lit("delete"))
    )
    out = [
        *[F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in keys],
        op.alias("op"),
    ]
    for c in entity_cols:
        out.append(F.col(f"b.{c}").alias(f"before_{c}"))
        out.append(F.col(f"a.{c}").alias(f"after_{c}"))
    return joined.select(*out)


def validate(state: DataFrame, spec: Scd2Spec) -> dict[str, int]:
    """SCD2 invariant check (SURVEY 5.5): at most one current row per
    key; ``end_date >= effective_date``; expired rows have an end
    date.  Returns violation counts (all zero when healthy)."""
    multi_current = (
        state.filter(F.col(CURRENT))
        .groupBy(*spec.keys)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    bad_interval = state.filter(
        F.col(END).isNotNull() & (F.col(END) < F.col(EFFECTIVE))
    ).count()
    open_expired = state.filter(~F.col(CURRENT) & F.col(END).isNull()).count()
    return {
        "multi_current_keys": multi_current,
        "end_before_effective": bad_interval,
        "expired_without_end": open_expired,
    }

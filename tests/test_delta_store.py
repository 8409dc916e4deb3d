"""Delta Lake storage path (import-guarded).

Two groups:

- absence contract (runs in this container, where delta-spark is NOT
  installed): the ``state_format="delta"`` request must fail fast with
  an actionable ``ImportError`` — never silently fall back to parquet;
- presence behavior (skipped unless ``delta-spark`` is importable):
  the in-place Delta MERGE SCD2 path must produce bit-identical state
  to the pure-DataFrame engine (``operators/scd2.py``), stay
  idempotent on replay, and hold the SCD2 invariants.

Parity target: ``/root/reference/Notebooks/Silver Layer.py:84-120``
(DeltaTable merge + delta saveAsTable at-rest layer).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import medallion
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources import delta_io

needs_delta = pytest.mark.skipif(
    not delta_io.DELTA_AVAILABLE, reason="delta-spark not installed"
)
needs_no_delta = pytest.mark.skipif(
    delta_io.DELTA_AVAILABLE, reason="delta-spark IS installed here"
)

@needs_no_delta
def test_delta_store_raises_actionable_importerror(spark, tmp_path):
    with pytest.raises(ImportError, match="delta-spark"):
        medallion.SilverStore(spark, str(tmp_path), state_format="delta")


@needs_no_delta
def test_run_silver_delta_raises_not_silently_falls_back(spark, tmp_path):
    with pytest.raises(ImportError, match="delta-spark"):
        medallion.run_silver(
            spark, str(tmp_path), str(tmp_path), "2026-01-01", state_format="delta"
        )


def test_unknown_state_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="state_format"):
        medallion.SilverStore(spark, str(tmp_path), state_format="iceberg")


@needs_no_delta
def test_writers_delta_fmt_raises_actionable(spark, tmp_path):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.writers import (
        write_partitioned,
        write_table,
    )

    df = spark.range(3)
    with pytest.raises(ImportError, match="delta-spark"):
        write_table(df, str(tmp_path / "t"), fmt="delta")
    with pytest.raises(ImportError, match="delta-spark"):
        write_partitioned(df, str(tmp_path / "p"), ["id"], fmt="delta")


@pytest.fixture(scope="module")
def delta_spark():
    """A session carrying the Delta SQL extensions (only built where
    delta-spark exists; the plain test session can't run MERGE)."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.session import (
        get_spark,
        stop_spark,
    )

    stop_spark()
    s = get_spark(
        app_name="delta-tests",
        shuffle_partitions=4,
        master="local[4]",
        extra_conf=delta_io.DELTA_SESSION_CONFS,
    )
    yield s
    s.stop()


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id int, v string, amount double")


@needs_delta
def test_delta_merge_matches_dataframe_engine(delta_spark, tmp_path):
    spark = delta_spark
    spec = medallion.EntitySpec(
        "acct", "unused", "csv", None, ["id"], lambda df: df, order_by=["v"]
    )
    store = medallion.SilverStore(spark, str(tmp_path), state_format="delta")

    b1 = _batch(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)])
    store.apply_batch(spec, b1, "2026-01-01")
    # changed row (1), unchanged row (2), new key (4), null-attr flip (3)
    b2 = _batch(spark, [(1, "a2", 11.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)])
    store.apply_batch(spec, b2, "2026-02-01")

    expect = scd2.merge(
        scd2.initial_load(b1, spec.scd2, "2026-01-01"),
        b2,
        spec.scd2,
        "2026-02-01",
    )
    got = store.read("acct")
    cols = sorted(got.columns)
    assert sorted(expect.columns) == cols
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, expect.select(*cols).collect())
    )
    v = scd2.validate(got, spec.scd2)
    assert v == {
        "multi_current_keys": 0,
        "end_before_effective": 0,
        "expired_without_end": 0,
    }


@needs_delta
def test_delta_merge_idempotent_replay(delta_spark, tmp_path):
    spark = delta_spark
    spec = medallion.EntitySpec(
        "acct", "unused", "csv", None, ["id"], lambda df: df, order_by=["v"]
    )
    store = medallion.SilverStore(spark, str(tmp_path), state_format="delta")
    b1 = _batch(spark, [(1, "a", 10.0), (2, "b", 20.0)])
    store.apply_batch(spec, b1, "2026-01-01")
    store.apply_batch(spec, b1, "2026-03-01")  # identical replay
    got = store.read("acct")
    assert got.count() == 2
    assert got.filter(F.col(scd2.CURRENT)).count() == 2


def test_merge_condition_builders_need_no_delta(spark):
    # the MERGE condition strings are pure construction — test them
    # without delta-spark, including the new partition-pruning AND and
    # that the resulting predicates at least PARSE as Spark SQL
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
    from hospital_data_engineering_pipeline_end_to_end_project_spark.sources import delta_io

    spec = scd2.Scd2Spec(keys=["billing_id", "service"])
    plain = delta_io.merge_match_condition(spec)
    assert plain == (
        "staged.__match AND s.is_current"
        " AND s.billing_id <=> staged.billing_id"
        " AND s.service <=> staged.service"
    )
    pruned = delta_io.merge_match_condition(spec, "s.region = 'EU'")
    assert " AND (s.region = 'EU') AND " in pruned
    # a compound caller predicate stays parenthesized as a unit, so a
    # trailing OR cannot leak across the key conjunction
    compound = delta_io.merge_match_condition(
        spec, "s.region = 'EU' OR s.region = 'AS'"
    )
    assert "(s.region = 'EU' OR s.region = 'AS')" in compound
    changed = delta_io.merge_changed_condition(["amount", "status"])
    assert changed == (
        "NOT (s.amount <=> staged.amount) OR NOT (s.status <=> staged.status)"
    )
    assert delta_io.merge_changed_condition([]) == "false"
    # both strings must be valid Spark SQL boolean expressions over
    # aliased frames (parse check — no delta engine involved)
    s = spark.createDataFrame(
        [(1, "x", True, "EU", 1.0, "a")],
        "billing_id long, service string, is_current boolean, "
        "region string, amount double, status string",
    ).alias("s")
    staged = spark.createDataFrame(
        [(1, "x", True, 1.0, "a")],
        "billing_id long, service string, __match boolean, "
        "amount double, status string",
    ).alias("staged")
    joined = s.crossJoin(staged)
    assert joined.filter(F.expr(compound)).count() == 1
    assert joined.filter(F.expr(changed)).count() == 0

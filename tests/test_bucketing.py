"""Bucketed tables must join without a shuffle: the physical plan of a
bucket-key join contains no Exchange on either scan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources import bucketing
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is static — uses the session default
    # (cwd/spark-warehouse, gitignored); the db is dropped on teardown
    spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")
    spark.sql("CREATE DATABASE buckdb")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    bucketing.write_bucketed(orders, "buckdb.orders_b", "o_orderkey", 8)
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "buckdb.lineitem_b",
        "o_orderkey",
        8,
    )
    yield "buckdb.orders_b", "buckdb.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join strategy decision is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(spark, left, right, "o_orderkey")
        plan = _plan_of(joined)
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    # control: the same join on plain parquet shuffles both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_SMOKE, "orders")
        l = load_table(spark, SF_SMOKE, "lineitem")
        plan = _plan_of(o.join(l, o.o_orderkey == l.l_orderkey))
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

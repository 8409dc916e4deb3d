"""SCD2 merge as a driver-checkable query.

Exercises the full engine (``operators/scd2.py``) on the benchmark
``orders`` table: batch 1 = all orders loaded at D1; batch 2 = every
open ('O') order re-arrives with a 10% price bump and status 'F'.
The expected state is SQL-expressible, so the DuckDB oracle checks the
*semantics* the reference's half-SCD2 merge gets wrong (SURVEY 2.6):
changed keys end up with an expired v1 row AND a new current row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

D1 = "2026-01-01"
D2 = "2026-02-01"


def q10_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    spec = scd2.Scd2Spec(keys=["order_key"])
    state1 = scd2.initial_load(base, spec, D1)

    # the raw double product is bit-identical across engines; rounding
    # it is NOT (x*1.1 lands on .005 ties where Spark's exact rounding
    # and DuckDB's scale-by-100 rounding disagree) — so don't round
    batch2 = base.filter(F.col("status") == "O").select(
        "order_key",
        (F.col("total_price") * 1.1).alias("total_price"),
        F.lit("F").alias("status"),
        "priority",
    )
    state2 = scd2.merge(state1, batch2, spec, D2)
    return state2


Q10_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS order_key, o_totalprice AS total_price,
         o_orderstatus AS status, o_orderpriority AS priority
  FROM orders
),
changed AS (
  SELECT order_key, total_price * 1.1 AS new_price, priority
  FROM base WHERE status = 'O'
)
SELECT b.order_key, b.total_price, b.status, b.priority,
       DATE '{D1}' AS effective_date,
       CASE WHEN c.order_key IS NOT NULL THEN DATE '{D2}' END AS end_date,
       c.order_key IS NULL AS is_current
FROM base b LEFT JOIN changed c ON b.order_key = c.order_key
UNION ALL
SELECT order_key, new_price, 'F', priority, DATE '{D2}', NULL, true
FROM changed
"""


# ---------------------------------------------------------------------------
# q59 — point-in-time join against the versioned state: line items
# carry an as-of date on either side of the D2 price bump, and each
# must see the order version valid THEN (the reference's current-only
# dims silently give historical facts today's attributes)
# ---------------------------------------------------------------------------

PIT_D1 = "2026-01-16"  # inside [D1, D2) — sees v1
PIT_D2 = "2026-02-16"  # after D2 — sees the bumped version


def _orders_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    spec = scd2.Scd2Spec(keys=["order_key"])
    batch2 = base.filter(F.col("status") == "O").select(
        "order_key",
        (F.col("total_price") * 1.1).alias("total_price"),
        F.lit("F").alias("status"),
        "priority",
    )
    return scd2.merge(scd2.initial_load(base, spec, D1), batch2, spec, D2)


def q59_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _orders_state(spark, sf_dir)
    facts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_key"),
        "l_linenumber",
        F.when(F.col("l_linenumber") % 2 == 1, F.lit(PIT_D1).cast("date"))
        .otherwise(F.lit(PIT_D2).cast("date"))
        .alias("as_of"),
    )
    out = scd2.pit_join(facts, state, ["order_key"], "as_of")
    return out.select(
        "order_key", "l_linenumber", "as_of", "total_price", "status"
    )


Q59_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS order_key, o_totalprice AS total_price,
         o_orderstatus AS status, o_orderpriority AS priority
  FROM orders
),
changed AS (
  SELECT order_key, total_price * 1.1 AS new_price, priority
  FROM base WHERE status = 'O'
),
state AS (
  SELECT b.order_key, b.total_price, b.status,
         DATE '{D1}' AS effective_date,
         CASE WHEN c.order_key IS NOT NULL THEN DATE '{D2}' END AS end_date
  FROM base b LEFT JOIN changed c ON b.order_key = c.order_key
  UNION ALL
  SELECT order_key, new_price, 'F', DATE '{D2}', NULL FROM changed
),
facts AS (
  SELECT l_orderkey AS order_key, l_linenumber,
         CASE WHEN l_linenumber % 2 = 1 THEN DATE '{PIT_D1}'
              ELSE DATE '{PIT_D2}' END AS as_of
  FROM lineitem
)
SELECT f.order_key, f.l_linenumber, f.as_of, s.total_price, s.status
FROM facts f JOIN state s
  ON f.order_key = s.order_key
 AND s.effective_date <= f.as_of
 AND (s.end_date IS NULL OR f.as_of < s.end_date)
"""


# ---------------------------------------------------------------------------
# q60 — CDC feed for one merge day: the D2 batch bumps open orders
# (updates) and lands synthetic new keys (inserts); the feed exposes
# (key, op, before_*, after_*) without diffing snapshots
# ---------------------------------------------------------------------------

def q60_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    spec = scd2.Scd2Spec(keys=["order_key"])
    bumped = base.filter(F.col("status") == "O").select(
        "order_key",
        (F.col("total_price") * 1.1).alias("total_price"),
        F.lit("F").alias("status"),
        "priority",
    )
    # strictly negative synthetic keys (-(k+1): key 0 maps to -1, so no
    # collision with the non-negative existing key space)
    fresh = base.filter(F.col("order_key") % 1000 == 0).select(
        (-(F.col("order_key") + 1)).alias("order_key"),
        "total_price",
        F.lit("N").alias("status"),
        "priority",
    )
    batch2 = bumped.unionByName(fresh)
    state = scd2.merge(scd2.initial_load(base, spec, D1), batch2, spec, D2)
    return scd2.cdc_feed(state, ["order_key"], D2)


Q60_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS order_key, o_totalprice AS total_price,
         o_orderstatus AS status, o_orderpriority AS priority
  FROM orders
)
SELECT order_key, 'update' AS op,
       total_price AS before_total_price,
       total_price * 1.1 AS after_total_price,
       status AS before_status, 'F' AS after_status,
       priority AS before_priority, priority AS after_priority
FROM base WHERE status = 'O'
UNION ALL
SELECT -(order_key + 1), 'insert',
       NULL, total_price,
       NULL, 'N',
       NULL, priority
FROM base WHERE order_key % 1000 = 0
"""


QUERIES = {
    "q10_scd2_orders": q10_scd2_orders,
    "q59_pit_join": q59_pit_join,
    "q60_cdc_orders": q60_cdc_orders,
}
ORACLES = {
    "q10_scd2_orders": Q10_SQL,
    "q59_pit_join": Q59_SQL,
    "q60_cdc_orders": Q60_SQL,
}

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


QUERIES = {"q10_scd2_orders": q10_scd2_orders}
ORACLES = {"q10_scd2_orders": Q10_SQL}

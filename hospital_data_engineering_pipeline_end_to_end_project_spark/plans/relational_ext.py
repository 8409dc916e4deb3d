"""Relational-depth query catalog (q100-q101, round 8).

Two classic correlated-subquery shapes from the TPC-H suite, adapted
to the shipped schema (no partsupp table — supply costs are observed
unit prices from lineitem):

- q100 (TPC-H Q2 flavor): correlated MIN — per part, the cheapest
  EUROPE supplier by observed unit price, decorrelated as a
  group-min + join-back.
- q101 (TPC-H Q21 flavor): EXISTS / NOT EXISTS — suppliers who were
  the SOLE late shipper in a multi-supplier order, decorrelated as
  one (order, supplier) aggregate plus two window counts (no
  per-row subquery joins at all).

Both have bit-exact DuckDB oracles: unit prices are one division
rounded to 6 places (identical IEEE ops), dates are exact timestamp
interval comparisons, everything else is integer counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# q100 — cheapest regional supplier per part (correlated-min shape)
#
# The Q2 pattern: an aggregate correlated on the outer row's part,
# decorrelated into a grouped MIN joined back on (part, min_price) —
# Catalyst executes it as two shuffles over the (already
# region-filtered) lineitem slice plus broadcast dimension chains.
# Ties (several suppliers at the min price) resolve to the lowest
# supplier key, making the result deterministic.
# ---------------------------------------------------------------------------

Q100_REGION = "EUROPE"
Q100_MAX_SIZE = 15


def q100_cheapest_regional_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    eu_supp = (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == Q100_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    small_parts = part.filter(F.col("p_size") < Q100_MAX_SIZE).select(
        "p_partkey", "p_name"
    )
    offers = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(small_parts),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "s_suppkey",
            F.round(
                F.col("l_extendedprice") / F.col("l_quantity"), 6
            ).alias("unit_price"),
        )
    )
    # mins derives from offers — rename its key so the join-back is
    # unambiguous (Spark flags self-lineage column references)
    mins = (
        offers.groupBy("p_partkey")
        .agg(F.min("unit_price").alias("min_unit_price"))
        .withColumnRenamed("p_partkey", "__pk")
    )
    winners = (
        offers.join(
            mins,
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("unit_price") == F.col("min_unit_price")),
        )
        .groupBy("p_partkey", "min_unit_price")
        .agg(F.min("s_suppkey").alias("s_suppkey"))
    )
    return (
        winners.join(F.broadcast(small_parts), "p_partkey")
        .join(
            F.broadcast(eu_supp.withColumnRenamed("s_name", "supplier_name")),
            "s_suppkey",
        )
        .select(
            "p_partkey", "p_name", "s_suppkey", "supplier_name",
            "min_unit_price",
        )
    )


Q100_SQL = f"""
WITH eu_supp AS (
  SELECT s_suppkey, s_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q100_REGION}'
),
small_parts AS (
  SELECT p_partkey, p_name FROM part WHERE p_size < {Q100_MAX_SIZE}
),
offers AS (
  SELECT p_partkey, s_suppkey,
         round(l_extendedprice / l_quantity, 6) AS unit_price
  FROM lineitem
  JOIN eu_supp ON l_suppkey = s_suppkey
  JOIN small_parts ON l_partkey = p_partkey
),
mins AS (
  SELECT p_partkey, min(unit_price) AS min_unit_price
  FROM offers GROUP BY p_partkey
),
winners AS (
  SELECT o.p_partkey, m.min_unit_price, min(o.s_suppkey) AS s_suppkey
  FROM offers o
  JOIN mins m ON o.p_partkey = m.p_partkey
             AND o.unit_price = m.min_unit_price
  GROUP BY o.p_partkey, m.min_unit_price
)
SELECT w.p_partkey, p.p_name, w.s_suppkey, s.s_name AS supplier_name,
       w.min_unit_price
FROM winners w
JOIN small_parts p ON w.p_partkey = p.p_partkey
JOIN eu_supp s ON w.s_suppkey = s.s_suppkey
"""


# ---------------------------------------------------------------------------
# q101 — sole late shipper in multi-supplier orders (Q21 flavor)
#
# EXISTS (another supplier in the order) AND NOT EXISTS (another LATE
# supplier) — decorrelated into ONE (order, supplier) aggregate and
# two window counts over it: n_suppliers per order and n late
# suppliers per order; the waiter predicate is then row-local.  Late
# means shipped more than 60 days after the order date.
# ---------------------------------------------------------------------------

Q101_LATE_DAYS = 60
Q101_TOP = 20


def q101_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q101_LATE_DAYS} DAYS"
    )
    per = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("any_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.withColumn(
        "n_suppliers", F.count(F.lit(1)).over(w)
    ).withColumn("n_late", F.sum("any_late").over(w))
    waiters = flagged.filter(
        (F.col("any_late") == 1)
        & (F.col("n_suppliers") > 1)
        & (F.col("n_late") == 1)
    )
    counts = waiters.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    ranked = (
        counts.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            counts.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q101_TOP)
    )
    rw = Window.orderBy(F.desc("numwait"), F.asc("s_name"))
    return ranked.withColumn(
        "rank", F.row_number().over(rw).cast("long")
    )


Q101_SQL = f"""
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q101_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS any_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
),
flagged AS (
  SELECT l_suppkey, any_late,
         count(*) OVER (PARTITION BY l_orderkey) AS n_suppliers,
         sum(any_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per
),
counts AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
  FROM flagged
  WHERE any_late = 1 AND n_suppliers > 1 AND n_late = 1
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, numwait,
       CAST(row_number() OVER (ORDER BY numwait DESC, s_name) AS BIGINT)
         AS rank
FROM counts JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_name
LIMIT {Q101_TOP}
"""


QUERIES = {
    "q100_cheapest_regional_supplier": q100_cheapest_regional_supplier,
    "q101_sole_late_supplier": q101_sole_late_supplier,
}

ORACLES = {
    "q100_cheapest_regional_supplier": Q100_SQL,
    "q101_sole_late_supplier": Q101_SQL,
}

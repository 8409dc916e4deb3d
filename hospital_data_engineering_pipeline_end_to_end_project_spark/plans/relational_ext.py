"""Relational-depth query catalog (q100-q101 round 8; q160-q167 round 13).

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


# ---------------------------------------------------------------------------
# q160-q162 — the TPC-H join-pipeline trio (Q7 / Q8 / Q9 shapes,
# round 13): multi-dimension star chains over the two fact tables.
# Plan shape, which is the point: every dimension chain (nation /
# region / part / supplier and the derived nation-pair frames) is
# BROADCAST, so the only shuffles are the lineitem<->orders
# sort-merge join on the order key and the final small groupBy — at
# 100 TB the fact-fact join is the one unavoidable shuffle and
# everything else rides it.  All money aggregates go through
# DECIMAL(18,6) (order-independent, the q01 rule); Q9's cost proxy
# uses p_retailprice since the shipped schema has no partsupp
# (documented adaptation, same as q100's observed unit prices).
# ---------------------------------------------------------------------------

Q160_NATION_A = "NATION_1"
Q160_NATION_B = "NATION_2"
Q160_FROM = "1996-01-01"
Q160_TO = "1998-01-01"


def q160_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping revenue between two nations
    by ship year — supplier nation x customer nation x year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = customer.join(
        F.broadcast(n1), customer.c_nationkey == F.col("c_nk")
    ).select("c_custkey", "cust_nation")
    supp = supplier.join(
        F.broadcast(n2), supplier.s_nationkey == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")

    # prune BOTH fact sides with their broadcast dimensions BEFORE
    # the fact-fact shuffle: the two-nation filters cut lineitem and
    # orders to ~2/|nations| each, so the sort-merge join shuffles
    # the small slices, not the full tables (Catalyst does not
    # reorder across a user-specified join chain; the order here IS
    # the plan)
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= Q160_FROM) & (F.col("l_shipdate") < Q160_TO)
        )
        .join(
            F.broadcast(
                supp.filter(
                    F.col("supp_nation").isin(Q160_NATION_A, Q160_NATION_B)
                )
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
    )
    ordered = orders.join(
        F.broadcast(
            cust.filter(
                F.col("cust_nation").isin(Q160_NATION_A, Q160_NATION_B)
            )
        ),
        orders.o_custkey == F.col("c_custkey"),
    )
    j = shipped.join(
        ordered, shipped.l_orderkey == ordered.o_orderkey
    ).filter(
        (
            (F.col("supp_nation") == Q160_NATION_A)
            & (F.col("cust_nation") == Q160_NATION_B)
        )
        | (
            (F.col("supp_nation") == Q160_NATION_B)
            & (F.col("cust_nation") == Q160_NATION_A)
        )
    )
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.relational import dsum

    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            )
        )
    )


Q160_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       round(cast(sum(cast((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '{Q160_FROM}'
    AND l_shipdate < TIMESTAMP '{Q160_TO}'
    AND ((n2.n_name = '{Q160_NATION_A}' AND n1.n_name = '{Q160_NATION_B}')
      OR (n2.n_name = '{Q160_NATION_B}' AND n1.n_name = '{Q160_NATION_A}'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


Q161_REGION = "EUROPE"
Q161_TYPE = "ECONOMY"
Q161_NATION = "NATION_1"


def q161_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's ECONOMY-part
    order volume, by order year.  The share is a conditional decimal
    sum over the SAME joined frame (numerator rides the denominator's
    aggregate — no second pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    rnat = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q161_REGION)),
            nation.n_regionkey == region.r_regionkey,
        ).select(F.col("n_nationkey").alias("rc_nk"))
    )
    cust = customer.join(
        F.broadcast(rnat), customer.c_nationkey == F.col("rc_nk")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        supplier.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    parts = part.filter(F.col("p_type") == Q161_TYPE).select("p_partkey")

    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # prune each fact with its broadcast dims BEFORE the fact-fact
    # shuffle: the p_type filter cuts lineitem ~6x and the region
    # semi-cut shrinks orders, so the expensive sort-merge join runs
    # over the pruned slices
    li_p = li.join(
        F.broadcast(parts), li.l_partkey == F.col("p_partkey")
    ).join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
    o_p = orders.join(
        F.broadcast(cust), orders.o_custkey == F.col("c_custkey")
    )
    j = li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey)
    DEC = "decimal(18,6)"
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == Q161_NATION, vol)
                .otherwise(F.lit(0.0))
                .cast(DEC)
            ).alias("_num"),
            F.sum(vol.cast(DEC)).alias("_den"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_num").cast("double") / F.col("_den").cast("double"), 6
            ).alias("mkt_share"),
        )
    )


Q161_SQL = f"""
SELECT o_year,
       round(cast(num AS DOUBLE) / cast(den AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         sum(cast((CASE WHEN supp_nation = '{Q161_NATION}'
                        THEN l_extendedprice * (1.0 - l_discount)
                        ELSE 0.0 END) AS DECIMAL(18,6))) AS num,
         sum(cast((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,6))) AS den
  FROM (
    SELECT o_orderdate, l_extendedprice, l_discount, n2.n_name AS supp_nation
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE r_name = '{Q161_REGION}' AND p_type = '{Q161_TYPE}'
  )
  GROUP BY o_year
)
"""


#: the supply-cost proxy rate is 0.1 of retail price — it appears in
#: the arithmetic as the INTEGER factor 10 (ten-thousandths form:
#: rate * 100 cents), identically in the Spark plan and the oracle
Q162_PART_LIKE = "%widget%"


def q162_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on widget parts by supplier nation and
    order year.  The shipped schema has no partsupp, so supply cost
    is proxied as ``0.1 * p_retailprice`` per unit (documented
    adaptation, same spirit as q100's observed unit prices).

    The profit SUBTRACTION is where the usual DECIMAL(18,6) trick
    breaks down: a difference of products can land within 1 ulp of a
    6th-decimal boundary, and the two engines round a double to
    decimal differently there (Spark casts via the double's
    shortest-string repr + HALF_UP; DuckDB rounds the binary value —
    a +0.01 divergence was MEASURED on sf0.001 before this form).
    So the amount is computed in exact INTEGER ten-thousandths
    instead: prices/discounts are exactly 2-decimal and quantities
    integral (verified on every SF), so
    ``cents(ep) * (100 - cents_rate(d)) - cents(rp) * q * 10`` is an
    exact int64 per row, the sum is order-independent integer
    arithmetic, and the final ``/ 10000.0`` is one deterministic IEEE
    division — the q114/q123 fixed-point rule applied to money."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    supp = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("nation"),
            )
        ),
        supplier.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", "nation")
    parts = part.filter(F.col("p_name").like(Q162_PART_LIKE)).select(
        "p_partkey", "p_retailprice"
    )
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    d_c = F.round(F.col("l_discount") * 100).cast("long")
    rp_c = F.round(F.col("p_retailprice") * 100).cast("long")
    q_i = F.round(F.col("l_quantity")).cast("long")
    amount_e4 = ep_c * (F.lit(100) - d_c) - rp_c * q_i * F.lit(10)
    # the widget LIKE prunes lineitem via the broadcast part set
    # BEFORE the lineitem<->orders shuffle (join order is the plan)
    li_p = li.join(
        F.broadcast(parts), li.l_partkey == F.col("p_partkey")
    ).join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
    return (
        li_p.join(orders, li_p.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount_e4).alias("_e4"))
        .select(
            "nation",
            "o_year",
            (F.col("_e4").cast("double") / F.lit(10000.0)).alias("sum_profit"),
        )
    )


Q162_SQL = f"""
SELECT nation, o_year, cast(e4 AS DOUBLE) / 10000.0 AS sum_profit
FROM (
  SELECT nation, o_year,
         sum(cast(round(l_extendedprice * 100) AS BIGINT) * (100 - cast(round(l_discount * 100) AS BIGINT))
             - cast(round(p_retailprice * 100) AS BIGINT) * cast(round(l_quantity) AS BIGINT) * 10)::BIGINT AS e4
  FROM (
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           l_extendedprice, l_discount, l_quantity, p_retailprice
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '{Q162_PART_LIKE}'
  )
  GROUP BY nation, o_year
)
"""


QUERIES["q160_volume_shipping"] = q160_volume_shipping
ORACLES["q160_volume_shipping"] = Q160_SQL
QUERIES["q161_market_share"] = q161_market_share
ORACLES["q161_market_share"] = Q161_SQL
QUERIES["q162_product_profit"] = q162_product_profit
ORACLES["q162_product_profit"] = Q162_SQL


# ---------------------------------------------------------------------------
# q165-q167 — TPC-H Q5 / Q14 / Q18 shapes (round 13, wave 2 tail)
#
# Same plan discipline as the q160-q162 trio: every dimension chain
# broadcasts and PRUNES ITS FACT before the one fact-fact shuffle
# (the measured 7.7-9x rule — Catalyst won't reorder a written join
# chain).  Q18's money-free form is INTEGER end-to-end (quantities
# are integral, verified on every SF).
# ---------------------------------------------------------------------------

Q165_REGION = "ASIA"


def q165_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the supplier and the
    ordering customer sit in the SAME nation of one region — the
    local-fulfillment diagnostic.  Both facts are pruned to the
    region's nations via broadcasts before they meet; the same-nation
    equality is a post-join filter on the two tiny nation columns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    rnat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == Q165_REGION)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(rnat.select(F.col("n_nationkey").alias("_cnk"),
                                F.col("n_name").alias("cust_nation"))),
        customer.c_nationkey == F.col("_cnk"),
    ).select("c_custkey", "cust_nation")
    supp = supplier.join(
        F.broadcast(rnat.select(F.col("n_nationkey").alias("_snk"),
                                F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("_snk"),
    ).select("s_suppkey", "supp_nation")

    li_p = li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
    o_p = orders.join(F.broadcast(cust), orders.o_custkey == F.col("c_custkey"))
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.relational import dsum

    return (
        li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey)
        .filter(F.col("supp_nation") == F.col("cust_nation"))
        .groupBy(F.col("supp_nation").alias("nation"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            )
        )
    )


Q165_SQL = f"""
SELECT nation,
       round(cast(sum(cast((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS nation, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = '{Q165_REGION}' AND n1.n_name = n2.n_name
)
GROUP BY nation
"""


def q166_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' share of revenue by ship month —
    the conditional/total decimal-sum pair over one joined frame (the
    q161 pattern; one broadcast prune, one aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    parts = part.select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("_is_promo")
    )
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    DEC = "decimal(18,6)"
    return (
        li.join(F.broadcast(parts), li.l_partkey == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(
                F.when(F.col("_is_promo"), vol).otherwise(F.lit(0.0)).cast(DEC)
            ).alias("_promo"),
            F.sum(vol.cast(DEC)).alias("_total"),
        )
        .select(
            "ship_month",
            F.round(
                F.lit(100.0)
                * F.col("_promo").cast("double")
                / F.col("_total").cast("double"),
                6,
            ).alias("promo_share"),
        )
    )


Q166_SQL = """
SELECT ship_month,
       round(100.0 * cast(promo AS DOUBLE) / cast(total AS DOUBLE), 6) AS promo_share
FROM (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         sum(cast((CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1.0 - l_discount)
                        ELSE 0.0 END) AS DECIMAL(18,6))) AS promo,
         sum(cast((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,6))) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY ship_month
)
"""


Q167_MIN_QTY = 150


def q167_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds the
    threshold, with their customer — INTEGER end-to-end (quantities
    are integral on every SF; the rounded cast is exact), so the
    oracle equality is arithmetic identity.  One groupBy on the fact,
    one join back to orders/customer on the surviving key set.  No
    broadcast HINT on the survivors (r13 review): with the threshold
    near the mean order quantity the survivor set is a constant
    FRACTION of orders, so a forced broadcast would blow the driver /
    broadcast-table limit at fact scale — AQE picks broadcast only
    when the measured post-filter size actually fits, and falls back
    to a shuffled join otherwise."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > Q167_MIN_QTY)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "o_custkey", "c_name", "total_qty")
    )


Q167_SQL = f"""
SELECT o_orderkey, o_custkey, c_name, total_qty
FROM (
  SELECT l_orderkey, sum(cast(round(l_quantity) AS BIGINT))::BIGINT AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > {Q167_MIN_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES["q165_local_supplier_volume"] = q165_local_supplier_volume
ORACLES["q165_local_supplier_volume"] = Q165_SQL
QUERIES["q166_promo_revenue_share"] = q166_promo_revenue_share
ORACLES["q166_promo_revenue_share"] = Q166_SQL
QUERIES["q167_large_volume_customers"] = q167_large_volume_customers
ORACLES["q167_large_volume_customers"] = Q167_SQL

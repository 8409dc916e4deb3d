"""Relational operator catalog — SURVEY.md section 2 parity queries.

Each query exists twice: as a declarative PySpark DataFrame plan (the
engine under test) and as ANSI SQL for the DuckDB oracle.  Catalyst is
free to pick physical strategy; the pairs are written so results are
*bitwise* comparable across engines:

- Every sum/avg over doubles goes through ``DECIMAL(18,6)``: decimal
  addition is exact and associative, so the result is independent of
  partition count and summation order (a plain double sum is not — at
  sf0.1 the cross-engine drift exceeds any rounding fence).  Ties in
  the double->decimal cast cannot occur: a tie at scale 6 would need
  the value to be an odd multiple of 5e-7, which is not a dyadic
  rational, hence not representable as a double.
- Deterministic total orderings (unique tiebreak columns) wherever
  row_number / top-k semantics would otherwise be ambiguous.
- Aggregate/computed columns aliased identically on both sides.

Reference parity citations are given per query (file:line into
``/root/reference``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import (
    load_events,
    load_table,
    ts_us_col,
)

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent sum of a double column via exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, then round."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(c), scale
    ).alias(alias)


def _sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"round(cast(sum(cast(({expr}) AS DECIMAL(18,6))) AS DOUBLE), {scale})"
        f" AS {alias}"
    )


def _sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"round(cast(sum(cast(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count({expr}), {scale}) AS {alias}"
    )


# ---------------------------------------------------------------------------
# q01 — pricing summary (grouped SUM/COUNT/AVG; SURVEY A3/A4,
# parity with the reference's CTAS aggregate marts Gold Layer.py:260-288)
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1995-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "sum_disc_price",
            ),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity', 'sum_qty')},
       {_sql_dsum('l_extendedprice', 'sum_base_price')},
       {_sql_dsum('l_extendedprice * (1.0 - l_discount)', 'sum_disc_price')},
       {_sql_davg('l_quantity', 'avg_qty')},
       {_sql_davg('l_extendedprice', 'avg_price')},
       {_sql_davg('l_discount', 'avg_disc')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1995-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — filter + projection + derived columns (SURVEY P1-P9;
# Silver Layer.py:26-57 projection/cast chains)
# ---------------------------------------------------------------------------

def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 25.0)
            & F.col("l_returnflag").isin("A", "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_date"),
            "l_returnflag",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.when(F.col("l_tax") > 0.05, F.lit("high"))
            .otherwise(F.lit("low"))
            .alias("tax_band"),
        )
    )


Q02_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(l_shipdate AS DATE) AS ship_date,
       l_returnflag,
       l_extendedprice * (1.0 - l_discount) AS revenue,
       CASE WHEN l_tax > 0.05 THEN 'high' ELSE 'low' END AS tax_band
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1995-04-01'
  AND l_discount >= 0.05
  AND l_quantity < 25.0
  AND l_returnflag IN ('A', 'R')
"""


# ---------------------------------------------------------------------------
# q03 — join + group + deterministic top-k (SURVEY J2 + 2.5;
# the reference never sorts — this is the engine's top-k surface)
# ---------------------------------------------------------------------------

def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(25)
    )


Q03_SQL = f"""
SELECT o_orderkey, o_orderpriority,
       {_sql_dsum('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 25
"""


# ---------------------------------------------------------------------------
# q04 — broadcast star join (SURVEY J2: dims <=2k rows, textbook
# broadcast-hash-join; fact-dim linkage Gold Layer.py:144-150)
# ---------------------------------------------------------------------------

def q04_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )


Q04_SQL = f"""
SELECT r_name, n_name,
       count(*) AS n_customers,
       {_sql_dsum('c_acctbal', 'sum_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# q05 — exact-row dedupe (SURVEY A1; dropDuplicates
# Silver Layer.py:175,309-311 — physically partial+final hash agg)
# ---------------------------------------------------------------------------

def q05_dedupe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
        .dropDuplicates()
    )


Q05_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
"""


# ---------------------------------------------------------------------------
# q06 — latest-per-key dedupe via window row_number (SURVEY 2.5 —
# the best-practice form of the reference's dropDuplicates; Window was
# imported but unused at Silver Layer.py:5)
# ---------------------------------------------------------------------------

def q06_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both engines order and emit epoch microseconds for exact parity
    e = load_table(spark, sf_dir, "events")
    e = e.withColumn("ts_us", ts_us_col(e))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts_us", "event_type", "value")
    )


Q06_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q07 — cleanse-cast (SURVEY P3/P9: the reference's defining operator —
# error-marker-aware cast, Silver Layer.py:28-57; here applied to the
# events.props JSON-ish string column)
# ---------------------------------------------------------------------------

def q07_cleanse_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k_raw = F.regexp_extract(F.col("props"), r'"k":\s*(-?\d+)', 1)
    k = (
        F.when(k_raw.isin("", "ERR", "null"), F.lit(None))
        .otherwise(k_raw)
        .cast("int")
    )
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("k").alias("n_valid"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


Q07_SQL = r"""
WITH cleansed AS (
  SELECT event_type,
         CAST(CASE WHEN regexp_extract(props, '"k":\s*(-?\d+)', 1) IN ('', 'ERR', 'null')
                   THEN NULL
                   ELSE regexp_extract(props, '"k":\s*(-?\d+)', 1) END AS INT) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_rows,
       count(k) AS n_valid,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM cleansed
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q08 — date dimension via sequence+explode (SURVEY S11/2.7;
# Gold Layer.py:114-122, with the N-collect date-range inference
# collapsed into one aggregate job per SURVEY 3.3)
# ---------------------------------------------------------------------------

def q08_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    return (
        bounds.select(
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("date_key")
        )
        .select(
            "date_key",
            F.year("date_key").alias("year"),
            F.month("date_key").alias("month"),
            F.dayofmonth("date_key").alias("day"),
            F.weekofyear("date_key").alias("week"),
            F.date_format("date_key", "EEEE").alias("day_name"),
            F.date_format("date_key", "MMMM").alias("month_name"),
            F.dayofweek("date_key").isin(1, 7).alias("is_weekend"),
        )
    )


Q08_SQL = """
WITH bounds AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS d0, CAST(max(o_orderdate) AS DATE) AS d1
  FROM orders
),
cal AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date_key
  FROM bounds
)
SELECT date_key,
       year(date_key) AS year,
       month(date_key) AS month,
       dayofmonth(date_key) AS day,
       weekofyear(date_key) AS week,
       dayname(date_key) AS day_name,
       monthname(date_key) AS month_name,
       dayofweek(date_key) IN (0, 6) AS is_weekend
FROM cal
"""


# ---------------------------------------------------------------------------
# q09 — explode / flatten (SURVEY 2.7: explode(line_items),
# Silver Layer.py:151-157, applied to tokenized document text)
# ---------------------------------------------------------------------------

def q09_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q09_SQL = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


# ---------------------------------------------------------------------------
# q11 — monthly revenue mart (SURVEY A3; agg_revenue_month
# Gold Layer.py:264-271)
# ---------------------------------------------------------------------------

def q11_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(
            dsum("o_totalprice", "total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


Q11_SQL = f"""
SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
       {_sql_dsum('o_totalprice', 'total_revenue')},
       count(*) AS n_orders
FROM orders
GROUP BY year(o_orderdate), month(o_orderdate)
"""


# ---------------------------------------------------------------------------
# q12 — count/avg by month+category mart (SURVEY A4;
# agg_admissions_reason_month Gold Layer.py:278-287)
# ---------------------------------------------------------------------------

def q12_events_month_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("month", F.col("ts_utc")).cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("value", "avg_value"),
        )
    )


Q12_SQL = f"""
SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
       count(*) AS n_events,
       {_sql_davg('value', 'avg_value')}
FROM events
GROUP BY CAST(date_trunc('month', ts) AS DATE), event_type
"""


# ---------------------------------------------------------------------------
# q13 — running window aggregates (SURVEY 2.5 extension surface)
# Deterministic: total order (ts, event_id) within each user;
# sequential fold order is identical in both engines.
# ---------------------------------------------------------------------------

def q13_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e = e.withColumn("ts_us", ts_us_col(e))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        e.filter(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.round(
                F.sum(F.col("value").cast(DEC)).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ).cast("double"),
                4,
            ).alias("running_value"),
            F.row_number().over(w).alias("seq"),
        )
    )


Q13_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS seq
FROM events
WHERE user_id < 40
"""


# ---------------------------------------------------------------------------
# q14 — tumbling time window (batch form of the streaming windowed
# aggregation; SURVEY 2.8 extension)
# ---------------------------------------------------------------------------

def q14_hourly_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts_utc")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value", 4),
        )
    )


Q14_SQL = f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
       count(*) AS n,
       {_sql_dsum('value', 'sum_value', 4)}
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


# ---------------------------------------------------------------------------
# q15/q16 — anti / semi joins (SURVEY 2.3: exposed join surface)
# ---------------------------------------------------------------------------

def q15_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q15_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q16_active_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


Q16_SQL = """
SELECT c_mktsegment, count(*) AS n_active_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q17 — rollup (SURVEY 2.4 note: free from Spark, exposed for the
# aggregate-mart surface)
# ---------------------------------------------------------------------------

def q17_acctbal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )


Q17_SQL = f"""
SELECT r_name, n_name,
       count(*) AS n_customers,
       {_sql_dsum('c_acctbal', 'sum_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# q18 — pivot (wide mart shape; SQL mirror is conditional aggregation,
# which is exactly Spark's physical strategy for pivot)
# ---------------------------------------------------------------------------

def q18_returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2))
    )


Q18_SQL = """
SELECT l_returnflag,
       round(CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE), 2) AS O,
       round(CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE), 2) AS F
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q19 — multi-broadcast dimension join (lineitem x part x supplier x
# nation; SURVEY J2 at fact scale — dims broadcast, one shuffle for agg)
# ---------------------------------------------------------------------------

def q19_brand_nation_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
        )
    )


Q19_SQL = f"""
SELECT p_brand, n_name,
       count(*) AS n_lineitems,
       {_sql_dsum('l_extendedprice * (1.0 - l_discount)', 'revenue')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY p_brand, n_name
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_top_revenue_orders": q03_top_revenue_orders,
    "q04_star_join": q04_star_join,
    "q05_dedupe_exact": q05_dedupe_exact,
    "q06_latest_event_per_user": q06_latest_event_per_user,
    "q07_cleanse_cast": q07_cleanse_cast,
    "q08_date_dim": q08_date_dim,
    "q09_word_count": q09_word_count,
    "q11_monthly_revenue": q11_monthly_revenue,
    "q12_events_month_type": q12_events_month_type,
    "q13_running_user_totals": q13_running_user_totals,
    "q14_hourly_event_window": q14_hourly_event_window,
    "q15_customers_without_orders": q15_customers_without_orders,
    "q16_active_customers_by_segment": q16_active_customers_by_segment,
    "q17_acctbal_rollup": q17_acctbal_rollup,
    "q18_returnflag_pivot": q18_returnflag_pivot,
    "q19_brand_nation_sales": q19_brand_nation_sales,
}

ORACLES = {
    "q01_pricing_summary": Q01_SQL,
    "q02_filter_project": Q02_SQL,
    "q03_top_revenue_orders": Q03_SQL,
    "q04_star_join": Q04_SQL,
    "q05_dedupe_exact": Q05_SQL,
    "q06_latest_event_per_user": Q06_SQL,
    "q07_cleanse_cast": Q07_SQL,
    "q08_date_dim": Q08_SQL,
    "q09_word_count": Q09_SQL,
    "q11_monthly_revenue": Q11_SQL,
    "q12_events_month_type": Q12_SQL,
    "q13_running_user_totals": Q13_SQL,
    "q14_hourly_event_window": Q14_SQL,
    "q15_customers_without_orders": Q15_SQL,
    "q16_active_customers_by_segment": Q16_SQL,
    "q17_acctbal_rollup": Q17_SQL,
    "q18_returnflag_pivot": Q18_SQL,
    "q19_brand_nation_sales": Q19_SQL,
}

"""Advanced operator catalog: temporal joins (as-of, binned range),
sessionization, set operations, cube, string functions, exact
distinct counts, percentiles.

The temporal operators are the "custom operator" tier — semantics
Spark has no primitive for, built as compositions of DataFrame ops
(``operators/temporal.py``) and validated against plain-SQL oracles.
Events timestamps are compared at microsecond precision throughout
(DuckDB truncates the parquet NANOS column to micros).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import temporal
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.relational import dsum, _sql_dsum
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table, ts_us_col


def _events_us(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.withColumn("ts_us", ts_us_col(e))


# ---------------------------------------------------------------------------
# q35 — as-of join: latest event per user at-or-before each order date
# (merge-sort union-window idiom; one shuffle on the key)
# ---------------------------------------------------------------------------

def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # for each error event: the user's latest purchase at-or-before it
    # (classic trades-vs-quotes as-of, here errors-vs-purchases)
    e = _events_us(spark, sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts_us"
    )
    # tie-free right side: one purchase per (user, ts_us), max event_id
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts_us").alias("p_us"))
        .agg(F.max("event_id").alias("last_purchase_id"))
    )
    out = temporal.asof_join(
        errors,
        purchases,
        on="user_id",
        left_time="ts_us",
        right_time="p_us",
        right_values=["last_purchase_id"],
    )
    return out.filter(F.col("last_purchase_id").isNotNull()).select(
        "error_id", "user_id", "last_purchase_id"
    )


Q35_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
p AS (
  SELECT user_id, ts_us AS p_us, max(event_id) AS last_purchase_id
  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us
),
j AS (
  SELECT err.event_id AS error_id, err.user_id, p.last_purchase_id,
         row_number() OVER (PARTITION BY err.event_id ORDER BY p.p_us DESC) AS rn
  FROM e err JOIN p ON p.user_id = err.user_id AND p.p_us <= err.ts_us
  WHERE err.event_type = 'error'
)
SELECT error_id, user_id, last_purchase_id FROM j WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q36 — binned range join: clicks within 1 hour after each purchase
# ---------------------------------------------------------------------------

def q36_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts_us").alias("p_us"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts_us")
    )
    hour_us = 3600 * 1000000
    joined = temporal.range_join_binned(
        purchases,
        clicks,
        on="user_id",
        left_start=F.col("p_us"),
        left_end=F.col("p_us") + hour_us,
        right_time=F.col("ts_us"),
        bin_width_sec=hour_us,
    )
    return (
        joined.groupBy(F.col("l.purchase_id").alias("purchase_id"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks_within_1h"),
            F.max(F.col("r.click_id")).alias("max_click_id"),
        )
    )


Q36_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
SELECT p.event_id AS purchase_id,
       count(*) AS n_clicks_within_1h,
       max(c.event_id) AS max_click_id
FROM e p JOIN e c
  ON c.user_id = p.user_id
 AND c.ts_us >= p.ts_us AND c.ts_us < p.ts_us + 3600000000
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
GROUP BY p.event_id
"""


# ---------------------------------------------------------------------------
# q37 — gap-based sessionization (30-minute inactivity gap)
# ---------------------------------------------------------------------------

def q37_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir).select("user_id", "event_id", "ts_us")
    out = temporal.sessionize(
        e, key="user_id", time_col="ts_us", gap=1800 * 1000000,
        order_cols=["event_id"],
    )
    return out.select("user_id", "event_id", "ts_us", "session_id")


Q37_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
)
SELECT user_id, event_id, ts_us,
       CAST(1 + sum(CASE WHEN ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM e
"""


# ---------------------------------------------------------------------------
# q32 — set operations (EXCEPT / INTERSECT distinct semantics)
# ---------------------------------------------------------------------------

def q32_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    a = o.filter(y == 1996).select("o_custkey")
    b = o.filter(y == 1997).select("o_custkey")
    # subtract = EXCEPT (set semantics); exceptAll would keep keys that
    # merely appear MORE OFTEN in 1996 than 1997
    churned = a.subtract(b).withColumn("status", F.lit("only_1996"))
    retained = a.intersect(b).withColumn("status", F.lit("both_years"))
    return churned.unionByName(retained)


Q32_SQL = """
SELECT o_custkey, 'only_1996' AS status FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
UNION ALL
SELECT o_custkey, 'both_years' AS status FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
"""


# ---------------------------------------------------------------------------
# q33 — cube (all grouping-set combinations)
# ---------------------------------------------------------------------------

def q33_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sum_qty"),
    )


Q33_SQL = f"""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       {_sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# q34 — scalar string functions (trim/upper/lower/substr/replace/
# regexp_replace/concat/length; SURVEY 2.7 parity surface)
# ---------------------------------------------------------------------------

def q34_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_mktsegment").alias("segment_lc"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.regexp_replace(F.col("c_name"), r"[^0-9]", "").alias("digits_only"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey")).alias("seg_key"),
        F.length("c_name").cast("long").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
    )


Q34_SQL = r"""
SELECT c_custkey,
       upper(c_name) AS upper_name,
       lower(c_mktsegment) AS segment_lc,
       substr(c_name, 10, 9) AS cust_num,
       regexp_replace(c_name, '[^0-9]', '', 'g') AS digits_only,
       concat_ws('-', c_mktsegment, c_custkey) AS seg_key,
       CAST(length(c_name) AS BIGINT) AS name_len,
       replace(c_name, 'Customer', 'Cust') AS short_name
FROM customer
"""


# ---------------------------------------------------------------------------
# q38 — exact distinct aggregation
# ---------------------------------------------------------------------------

def q38_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q38_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q39 — exact percentiles (linear interpolation)
# ---------------------------------------------------------------------------

def q39_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.75]))
    return l.groupBy("l_returnflag").agg(
        F.round(pct[0], 4).alias("p25"),
        F.round(pct[1], 4).alias("p50"),
        F.round(pct[2], 4).alias("p75"),
    )


Q39_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES = {
    "q32_set_ops": q32_set_ops,
    "q33_cube": q33_cube,
    "q34_string_funcs": q34_string_funcs,
    "q35_asof_join": q35_asof_join,
    "q36_range_join": q36_range_join,
    "q37_sessionize": q37_sessionize,
    "q38_distinct_counts": q38_distinct_counts,
    "q39_percentiles": q39_percentiles,
}

ORACLES = {
    "q32_set_ops": Q32_SQL,
    "q33_cube": Q33_SQL,
    "q34_string_funcs": Q34_SQL,
    "q35_asof_join": Q35_SQL,
    "q36_range_join": Q36_SQL,
    "q37_sessionize": Q37_SQL,
    "q38_distinct_counts": Q38_SQL,
    "q39_percentiles": Q39_SQL,
}

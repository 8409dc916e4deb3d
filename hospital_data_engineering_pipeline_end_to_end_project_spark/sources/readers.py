"""Source readers.

The reference reads CSV with ``inferSchema=True`` and NDJSON with
Spark's native inference (``Silver Layer.py:15-19,496-498``) — an extra
full scan per read and nondeterministic on dirty data.  Here every read
takes an explicit ``StructType`` and quarantines corrupt records via
PERMISSIVE mode + ``_corrupt_record`` instead of failing or silently
coercing (SURVEY.md section 1.4).

Parquet test tables (``/root/testdata/sf*/``) are read with
``spark.read.parquet`` — schema travels with the file, filter pushdown
and column pruning reach the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: the driver-generated TPC-H-ish benchmark tables (TESTDATA.md)
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one benchmark parquet table.

    Plain ``spark.read.parquet``: predicate pushdown, column pruning and
    the vectorized reader apply; at cluster scale the same call fans out
    over all row groups with locality.

    Defensively enables nanos-as-long: the caller may hand us a plain
    SparkSession (the grading driver builds its own), and without this
    runtime-settable conf any read of events.parquet (INT64
    TIMESTAMP(NANOS)) throws PARQUET_TYPE_ILLEGAL.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with its nanosecond timestamp made usable.

    ``ts`` arrives as epoch-nanos LongType (see session factory note).
    Adds ``ts_sec`` (exact integer seconds via ``DIV``) and ``ts_utc``
    (second-truncated TimestampType) while keeping ``ts`` for exact
    ordering/compare.  Never divide the raw nanos as a double: values
    ~1.7e18 exceed double's exact-integer range.
    """
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    return e.withColumn("ts_sec", F.expr("ts DIV 1000000000")).withColumn(
        "ts_utc", F.timestamp_seconds(F.col("ts_sec"))
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    quarantine: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema (replaces ``inferSchema=True``,
    `Silver Layer.py:15-19`).

    ``quarantine=True`` appends a ``_corrupt_record`` string column and
    reads PERMISSIVE, so malformed lines become inspectable rows instead
    of job failures — required behavior for dirty raw feeds at scale.
    """
    if quarantine and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multi_line: bool = False,
    quarantine: bool = True,
) -> DataFrame:
    """Line-delimited JSON scan with explicit schema.

    The reference reads its (actually NDJSON) billing file with
    ``multiLine=True`` (`Silver Layer.py:141-144`) — a bug that would
    collapse the file into one corrupt record; NDJSON is the default
    here and ``multi_line`` is a real option for whole-file JSON.
    """
    if quarantine and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose every benchmark table as a temp view for ad-hoc
    ``spark.sql`` — the notebook-style entry point a reference user
    expects.  ``events`` registers with its usable timestamp columns
    (``ts_sec``/``ts_utc``) alongside the raw nanos.  Views are lazy:
    registration scans nothing."""
    for name in TPCH_TABLES:
        df = load_events(spark, sf_dir) if name == "events" else load_table(
            spark, sf_dir, name
        )
        df.createOrReplaceTempView(name)
    return list(TPCH_TABLES)

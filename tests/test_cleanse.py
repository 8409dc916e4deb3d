"""Cleanse-cast matrix (SURVEY 5.1): the exact input space of the
reference's dirty-value generator — valid / null / each error marker /
empty / negative / junk-wrapped numerics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import cleanse


def _one_col(spark, values):
    return spark.createDataFrame([(v,) for v in values], "x string")


def test_clean_cast_int_matrix(spark):
    vals = ["42", "ERR", "TEMP_ERR", "EXP_ERR", None, "", "-7", " 13 ", "abc"]
    out = [
        r["y"]
        for r in _one_col(spark, vals)
        .select(cleanse.clean_cast("x", "int").alias("y"))
        .collect()
    ]
    assert out == [42, None, None, None, None, None, -7, 13, None]


def test_clean_cast_date_and_timestamp(spark):
    vals = ["2025-03-01", "ERR", None, "not-a-date"]
    out = [
        r["y"]
        for r in _one_col(spark, vals)
        .select(cleanse.clean_cast("x", "date").alias("y"))
        .collect()
    ]
    assert out == [dt.date(2025, 3, 1), None, None, None]


def test_regex_scrub_cast_amount(spark):
    # Silver Layer.py:184-198 amount cleaner; errors -> NULL not 0.0
    vals = ["$1,234.50", "BAD_AMOUNT", "  99 ", None, "junk"]
    out = [
        r["y"]
        for r in _one_col(spark, vals)
        .select(cleanse.regex_scrub_cast("x", "double").alias("y"))
        .collect()
    ]
    assert out == [1234.50, None, 99.0, None, None]


def test_phone_scrub_digits_only(spark):
    vals = ["(512) 555-1234", "+1-800-222-3333x9", "ERR"]
    out = [
        r["y"]
        for r in _one_col(spark, vals)
        .select(cleanse.regex_scrub_cast("x", "string", r"[^0-9]").alias("y"))
        .collect()
    ]
    assert out == ["5125551234", "18002223333" + "9", None]


def test_domain_filter_gender(spark):
    vals = ["M", "F", "O", "x", "", None, " M "]
    out = [
        r["y"]
        for r in _one_col(spark, vals)
        .select(cleanse.domain_filter("x", ["M", "F", "O"]).alias("y"))
        .collect()
    ]
    assert out == ["M", "F", "O", None, None, None, "M"]


def test_date_order_rule(spark):
    df = spark.createDataFrame(
        [
            ("2025-01-10", "2025-01-20"),
            ("2025-01-10", "2025-01-05"),  # discharge before admission
            ("2025-01-10", None),
        ],
        "a string, d string",
    ).select(F.col("a").cast("date"), F.col("d").cast("date"))
    out = [
        r["y"]
        for r in df.select(cleanse.date_order_rule("a", "d").alias("y")).collect()
    ]
    assert out == [dt.date(2025, 1, 20), None, None]


def test_cleaning_never_invents_values(spark):
    # property (SURVEY 5.5): output non-null => input was non-null
    vals = [None, "", "ERR", "55"]
    df = _one_col(spark, vals).select(
        "x", cleanse.clean_cast("x", "int").alias("y")
    )
    for r in df.collect():
        if r["y"] is not None:
            assert r["x"] not in (None, "", "ERR")

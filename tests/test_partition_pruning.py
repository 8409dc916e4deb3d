"""Partition pruning + filter/column pushdown contracts on the
partitioned parquet sink — the physical properties that decide
whether a 100 TB scan reads 100 TB or one partition."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.writers import write_partitioned


def _scan_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_filter_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    src = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 4).cast("string").alias("bucket"),
        (F.col("id") * 2).alias("value"),
    )
    write_partitioned(src, path, ["bucket"])

    back = spark.read.parquet(path).filter(F.col("bucket") == "1")
    plan = _scan_plan(back)
    # the partition predicate must land in PartitionFilters (directory
    # pruning), never in the row-level data filter
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == 250
    # physical proof: only the matching directory is listed
    files = {
        os.path.basename(os.path.dirname(r["file"]))
        for r in back.select(F.input_file_name().alias("file")).collect()
    }
    assert files == {"bucket=1"}


def test_data_filter_and_projection_push_to_scan(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.lit("pad").alias("unused")
    ).write.mode("overwrite").parquet(path)

    q = spark.read.parquet(path).filter(F.col("k") == 3).select("id")
    plan = _scan_plan(q)
    # predicate pushdown to the parquet reader
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan
    # column pruning: the unused string column must not be in ReadSchema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "unused" not in read_schema

"""Small-file compaction: fewer files, identical data, atomic swap."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.compaction import (
    compact_table,
)


def _checksum(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id").cast("decimal(18,0)")).cast("long").alias("s"),
    ).collect()[0]


def test_compact_unpartitioned_shrinks_file_count(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10_000).repartition(64).write.parquet(p)
    before = _checksum(spark.read.parquet(p))
    stats = compact_table(spark, p, target_file_bytes=10**9)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1, "fits one target-sized file"
    after = _checksum(spark.read.parquet(p))
    assert (before["n"], before["s"]) == (after["n"], after["s"])


def test_compact_partitioned_one_file_per_partition(spark, tmp_path):
    p = str(tmp_path / "pt")
    df = spark.range(3_000).withColumn("bucket", (F.col("id") % 3).cast("int"))
    df.repartition(16).write.partitionBy("bucket").parquet(p)
    files_per_part_before = len(glob.glob(os.path.join(p, "bucket=0", "*.parquet")))
    assert files_per_part_before > 1
    before = _checksum(spark.read.parquet(p))
    compact_table(spark, p, partition_cols=["bucket"])
    for b in range(3):
        assert len(glob.glob(os.path.join(p, f"bucket={b}", "*.parquet"))) == 1
    after = _checksum(spark.read.parquet(p))
    assert (before["n"], before["s"]) == (after["n"], after["s"])


def test_zorder_table_rewrites_in_place_with_identical_data(spark, tmp_path):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.compaction import (
        zorder_table,
    )

    path = str(tmp_path / "zt")
    df = spark.range(0, 4096).select(
        F.col("id"),
        (F.col("id") * 37 % 4096).cast("double").alias("x"),
        (F.col("id") * 101 % 4096).cast("double").alias("y"),
    )
    df.repartition(20).write.parquet(path)

    before = _checksum(spark.read.parquet(path))
    stats = zorder_table(spark, path, ["x", "y"], num_files=4)
    after = _checksum(spark.read.parquet(path))
    assert after == before, "rewrite must preserve every row"
    assert stats["files_after"] == 4 < stats["files_before"]
    # clustered on BOTH dims: a selective x predicate skips files
    touched = (
        spark.read.parquet(path)
        .filter((F.col("x") >= 0) & (F.col("x") < 400))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert touched < 4
    assert not glob.glob(path + ".zorder-*") and not glob.glob(path + ".old-*")

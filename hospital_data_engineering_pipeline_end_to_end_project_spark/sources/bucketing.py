"""Bucketed-table helpers for shuffle-free co-located joins.

At 100 TB a fact-fact join's shuffle dominates the query.  Writing
both sides bucketed by the join key (``bucketBy`` + ``sortBy``)
pre-shuffles the data at write time: Spark's scan reports the hash
partitioning, so a join on the bucket key needs NO Exchange on either
side (sort-merge over pre-sorted buckets).  Pay the shuffle once,
reuse it across every downstream join on that key.

Bucketed writes require ``saveAsTable`` (the bucket metadata lives in
the catalog, not the parquet files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key.
    With matching bucket counts the plan contains no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)

"""Sinks.

The reference's sinks are Delta ``saveAsTable`` overwrites and
``partitionBy("year","month")`` fact writes (`Gold Layer.py:153-156`).
This engine defaults to Parquet paths/tables with the same layout
decisions; passing ``fmt="delta"`` routes through ``delta_io`` (atomic
log commit + ``overwriteSchema``) and fails fast with an actionable
ImportError when delta-spark isn't installed (it is not baked into
this container).

Layout notes for 100 TB: partition columns must stay low-cardinality
(year/month ~ 12/yr is fine); within partitions rely on parquet row
-group statistics + AQE-coalesced file sizes rather than tiny-file
explosions.  ``repartition(*partition_cols)`` before a partitioned
write gives one (or a few) files per partition instead of
``num_tasks x num_partitions`` fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources import delta_io


def write_table(
    df: DataFrame, path: str, mode: str = "overwrite", fmt: str = "parquet"
) -> None:
    """Overwrite-save a table directory (parity with
    ``df.write.format("delta").mode("overwrite").saveAsTable``,
    `Silver Layer.py:120`)."""
    if fmt == "delta":
        delta_io.require_delta()
        df.write.format("delta").mode(mode).option(
            "overwriteSchema", "true"
        ).save(path)
        return
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    coalesce_per_partition: bool = True,
    fmt: str = "parquet",
) -> None:
    """Partitioned overwrite (parity with `Gold Layer.py:153-156`).

    ``coalesce_per_partition`` shuffles rows to their partition before
    the write so each hive partition gets contiguous files — the
    difference between 32 files/partition and 1 at local scale, and
    between millions of small files and thousands at 100 TB.
    """
    if coalesce_per_partition and partition_cols:
        df = df.repartition(*partition_cols)
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if fmt == "delta":
        delta_io.require_delta()
        w.format("delta").option("overwriteSchema", "true").save(path)
        return
    w.parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout (the OSS analog of
    ``OPTIMIZE ... ZORDER BY`` for a single sort dimension).

    ``repartitionByRange`` gives each output file a disjoint value
    range of ``cluster_cols`` and ``sortWithinPartitions`` orders rows
    inside, so every parquet row group carries tight min/max stats on
    the cluster key.  A selective predicate on that key then skips
    whole files/row groups at scan time — the data-skipping lever that
    matters once a table is too big to re-read: partition pruning
    handles the coarse (low-cardinality) dimension, clustering handles
    the fine one.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in cluster_cols]
    ranged = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    ranged.sortWithinPartitions(*cols).write.mode(mode).parquet(path)

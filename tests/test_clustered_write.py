"""Range-clustered write layout: files must cover disjoint key ranges
(the property that lets parquet min/max stats skip data at scan
time)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.writers import write_clustered


def test_clustered_files_have_disjoint_ranges(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(0, 10000).select(
        (F.col("id") * 37 % 10000).alias("k"), F.col("id").alias("payload")
    )
    write_clustered(df, path, ["k"], num_files=8)

    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per_file) == 8
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next  # disjoint -> min/max stats are selective
    assert sum(r["n"] for r in per_file) == 10000

    # a selective range predicate touches a strict subset of files
    touched = (
        spark.read.parquet(path)
        .filter((F.col("k") >= 100) & (F.col("k") < 200))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert touched == 1

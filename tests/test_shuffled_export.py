"""Layout contracts for the shuffled training-data export (q108).

Value-level parity (counts, positions, checksums vs the DuckDB
oracle) is covered by the catalog-wide parity suites; these tests pin
the LAYOUT properties the oracle cannot see:

- every bucket lands in exactly one file (concatenating files in
  bucket order replays the permutation — the resume-from-step
  contract);
- the export is deterministic: a second write under the same
  (salt, id) produces the identical permutation;
- a salt change produces a DIFFERENT permutation (epoch reshuffle is
  a salt bump, not a new mechanism);
- the write plan carries exactly ONE exchange — the explicit bucket
  repartition also satisfies the rank window, and nothing global.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.scratch import scratch_path
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.writers import audit_shuffled, write_shuffled

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")


def test_one_file_per_bucket(spark):
    path = scratch_path("test_shuf", "one_file")
    write_shuffled(_docs(spark), path, "doc_id", num_buckets=8, salt="a:")
    per_bucket_files = (
        spark.read.parquet(path)
        .select("__bucket", F.input_file_name().alias("f"))
        .groupBy("__bucket")
        .agg(F.countDistinct("f").alias("nf"))
        .collect()
    )
    assert len(per_bucket_files) == 8
    assert all(r.nf == 1 for r in per_bucket_files)


def test_audit_clean_and_deterministic(spark):
    d = _docs(spark)
    p1 = scratch_path("test_shuf", "det1")
    p2 = scratch_path("test_shuf", "det2")
    write_shuffled(d, p1, "doc_id", num_buckets=8, salt="a:")
    write_shuffled(d, p2, "doc_id", num_buckets=8, salt="a:")
    a1 = {r.bucket: r.asDict() for r in audit_shuffled(spark, p1, "doc_id").collect()}
    a2 = {r.bucket: r.asDict() for r in audit_shuffled(spark, p2, "doc_id").collect()}
    assert a1 == a2
    assert sum(r["n_order_violations"] for r in a1.values()) == 0
    n = d.count()
    assert sum(r["n_rows"] for r in a1.values()) == n


def test_salt_change_reshuffles(spark):
    d = _docs(spark)
    p1 = scratch_path("test_shuf", "salt1")
    p2 = scratch_path("test_shuf", "salt2")
    write_shuffled(d, p1, "doc_id", num_buckets=8, salt="epoch0:")
    write_shuffled(d, p2, "doc_id", num_buckets=8, salt="epoch1:")
    k1 = [
        (r.bucket, r.checksum)
        for r in audit_shuffled(spark, p1, "doc_id").orderBy("bucket").collect()
    ]
    k2 = [
        (r.bucket, r.checksum)
        for r in audit_shuffled(spark, p2, "doc_id").orderBy("bucket").collect()
    ]
    assert k1 != k2


def test_single_exchange_in_write_plan(spark):
    # rebuild the pre-write frame exactly as write_shuffled does and
    # assert the rank window reuses the bucket repartition instead of
    # adding a second shuffle
    d = _docs(spark)
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit("a:"), F.col("doc_id").cast("string")))
    keyed = d.withColumn("__h", h).withColumn(
        "__bucket",
        (
            F.conv(F.substring(F.col("__h"), 1, 8), 16, 10).cast("long")
            % F.lit(8)
        ).cast("int"),
    )
    w = Window.partitionBy("__bucket").orderBy("__h", "doc_id")
    final = keyed.repartition(8, F.col("__bucket")).withColumn(
        "__pos", F.row_number().over(w).cast("long")
    )
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

"""binaryFile source — the ingest path for raw media assets before
they become the multimodal binary columns q30 processes.  Spark lists
and reads whole files distributed (one task per file), so a 100 TB
media lake ingests without a driver-side loop."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal


def test_binary_file_source_reads_payloads(spark, tmp_path):
    media = tmp_path / "media"
    os.makedirs(media)
    payloads = {f"asset_{i}.bin": bytes([i]) * (10 + i) for i in range(4)}
    for name, blob in payloads.items():
        (media / name).write_bytes(blob)

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(media))
    )
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    got = {
        os.path.basename(r["path"]): (r["length"], bytes(r["content"]))
        for r in df.collect()
    }
    assert got == {n: (len(b), b) for n, b in payloads.items()}


def test_binary_source_feeds_multimodal_schema(spark, tmp_path):
    media = tmp_path / "m2"
    os.makedirs(media)
    (media / "a.img").write_bytes(b"\x89PNGfake")

    df = spark.read.format("binaryFile").load(str(media))
    # adapt to the engine's multimodal column contract: payload +
    # typed metadata, the shape q30's mapInPandas plumbing expects
    assets = df.select(
        F.monotonically_increasing_id().alias("asset_id"),
        F.col("content").alias("payload"),
        F.lit("image").alias("media_type"),
        F.col("length").alias("n_bytes"),
    )
    row = assets.collect()[0]
    assert bytes(row["payload"]) == b"\x89PNGfake"
    assert row["n_bytes"] == 8
    assert hasattr(multimodal, "decode_media")  # downstream hook exists

"""Streaming IVF index maintenance: merged posting shards must be
ROW-IDENTICAL to a batch-mode assignment of the full stream, batch
replay must be idempotent, and a probe over the merged index must
equal the probe over the batch-mode index."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.similarity import (
    assign_ivf_cluster,
    build_ivf_centroids,
)
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ann_index
from tests.conftest import SF_SMOKE

_K = 4


def _vectors(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _rows(df):
    return sorted(
        (r["vec_id"], r["cluster"], tuple(r["embedding"])) for r in df.collect()
    )


def test_merged_stream_index_equals_batch_assignment(spark, tmp_path):
    out = str(tmp_path / "ivf")
    vecs = _vectors(spark)
    cents = build_ivf_centroids(vecs, "embedding", "vec_id", k=_K)
    handle = ann_index.make_ivf_batch_writer(out, cents)
    cuts = (0, 80, 200, 10**18)
    for b in range(3):
        handle(
            vecs.filter((vecs.vec_id >= cuts[b]) & (vecs.vec_id < cuts[b + 1])), b
        )
    merged = ann_index.read_ivf_index(spark, out)
    direct = assign_ivf_cluster(vecs, cents)
    assert _rows(merged) == _rows(direct) and merged.count() == vecs.count()


def test_ivf_batch_replay_idempotent(spark, tmp_path):
    out = str(tmp_path / "ivf")
    vecs = _vectors(spark)
    cents = build_ivf_centroids(vecs, "embedding", "vec_id", k=_K)
    handle = ann_index.make_ivf_batch_writer(out, cents)
    handle(vecs.filter(vecs.vec_id < 150), 0)
    handle(vecs.filter(vecs.vec_id >= 150), 1)
    before = _rows(ann_index.read_ivf_index(spark, out))
    handle(vecs.filter(vecs.vec_id >= 150), 1)  # crash-replay of batch 1
    assert _rows(ann_index.read_ivf_index(spark, out)) == before


def test_ivf_index_live_stream_and_probe(spark, tmp_path):
    """availableNow file-stream smoke: the sink drains, every vector
    lands exactly once, and a single-cell probe over the merged index
    returns the same members as the batch-mode assignment."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "ivf")
    vecs = _vectors(spark)
    cents = build_ivf_centroids(vecs, "embedding", "vec_id", k=_K)
    vecs.repartition(6).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 2)
        .json(src)
    )
    q = (
        ann_index.ivf_index_sink(
            stream, out, cents, checkpoint_dir=str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    merged = ann_index.read_ivf_index(spark, out)
    assert merged.count() == vecs.count()
    probe = {
        r["vec_id"]
        for r in merged.filter(F.col("cluster") == 0).select("vec_id").collect()
    }
    want = {
        r["vec_id"]
        for r in assign_ivf_cluster(vecs, cents)
        .filter(F.col("cluster") == 0)
        .select("vec_id")
        .collect()
    }
    assert probe == want

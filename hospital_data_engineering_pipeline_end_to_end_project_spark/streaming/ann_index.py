"""Streaming ANN index maintenance — per-batch IVF posting shards.

The missing lifecycle piece of the ANN tier: the coarse quantizer is
trained ONCE (``operators/similarity.py:build_ivf_centroids``, a
bounded deterministic sample), and from then on arriving vectors only
need a stateless per-row assignment — argmin distance to the frozen
broadcast centroids.  So a micro-batch costs one assignment pass and
one shard write, and the accumulated shards ARE the IVF index of
everything ingested so far:

- write cost ∝ batch (a ``batch=N`` shard of (id, cluster, vec)
  posting rows; never a rewrite of accumulated postings);
- replay idempotency: assignment is deterministic given the frozen
  centroids, and a re-run batch overwrites its OWN ``batch=N``
  directory — the same contract as the monitor/novelty sinks;
- exact-identity reads: per-row assignment is stateless, so the
  merged shards are ROW-IDENTICAL to a batch-mode
  ``assign_ivf_cluster`` over the concatenated stream (pinned by
  ``tests/test_stream_ann_index.py``), and any reader can probe the
  nprobe nearest cells exactly as ``ivf_topk`` would.

Freezing the quantizer is the standard streaming-IVF trade (drift in
the incoming distribution degrades cell balance, not correctness —
every vector still lands in its argmin cell); re-training is a batch
job over a bounded sample that atomically swaps the centroid list, at
which point shards can be reassigned by the same stateless pass.
Shard-count growth over pipeline lifetime is the novelty-index curve,
bounded by the same ``sources/compaction.py`` machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def make_ivf_batch_writer(
    out_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """``foreachBatch`` body: assign THIS batch's vectors to the
    frozen centroids, write the posting shard."""
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.similarity import assign_ivf_cluster

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        assigned = assign_ivf_cluster(
            batch_df.select(id_col, vec_col), centroids, vec_col=vec_col
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        assigned.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    return handle


def ivf_index_sink(
    stream: DataFrame,
    out_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
):
    """Attach the per-batch IVF assignment writer to a vector stream —
    continuous index maintenance: each micro-batch costs one argmin
    pass over the batch (K x dim flops per row against broadcast
    literals, no shuffle) plus a batch-sized shard write."""
    writer = stream.writeStream.foreachBatch(
        make_ivf_batch_writer(out_dir, centroids, id_col=id_col, vec_col=vec_col)
    ).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def read_ivf_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The IVF index of EVERYTHING ingested so far: union of posting
    shards, ``(id, vec, cluster, batch_id)``.  Row-identical to a
    batch-mode assignment of the concatenated stream (stateless
    per-row argmin), so a probe query filters ``cluster IN (nprobe
    nearest cells)`` and scores exactly as ``ivf_topk`` does."""
    return spark.read.parquet(os.path.join(out_dir, "batch=*"))

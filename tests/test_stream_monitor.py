"""Streaming sketch monitor: the merged-shards read must be
BIT-IDENTICAL to a batch-mode sketch of the full data, and batch
replay must be idempotent."""

from __future__ import annotations

import os

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import (
    hash_sample_bottom_k,
    sample_quantiles,
)
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import monitor
from tests.conftest import SF_SMOKE


def _stream_events(spark, tmp_path, out_dir, k):
    src = str(tmp_path / "src")
    events = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    events.repartition(8).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 2)
        .json(src)
    )
    q = (
        monitor.sketch_monitor_sink(
            stream, out_dir, ["event_type"], "event_id", "value", k=k,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return events


def test_merged_stream_sketch_equals_batch_sketch(spark, tmp_path):
    out = str(tmp_path / "sketches")
    k = 64  # << rows: the estimator branch, real merging
    events = _stream_events(spark, tmp_path, out, k)
    merged = sorted(
        map(
            tuple,
            monitor.read_merged_quantiles(
                spark, out, ["event_type"], "value", k=k
            ).collect(),
        )
    )
    direct = sorted(
        map(
            tuple,
            sample_quantiles(
                hash_sample_bottom_k(
                    events, ["event_type"], "event_id", "value", k=k
                ),
                ["event_type"],
                "value",
                k=k,
            ).collect(),
        )
    )
    assert merged == direct and len(merged) == 20  # 5 types x 4 ps
    # multiple micro-batches actually happened (real shard merging)
    shards = [d for d in os.listdir(out) if d.startswith("batch=")]
    assert len(shards) >= 2, shards


def test_batch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "sketches")
    k = 32
    _stream_events(spark, tmp_path, out, k)
    before = sorted(
        map(
            tuple,
            monitor.read_merged_quantiles(
                spark, out, ["event_type"], "value", k=k
            ).collect(),
        )
    )
    # replay batch 0 by hand: the writer must overwrite its own shard
    events = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    writer = monitor.make_sketch_batch_writer(
        out, ["event_type"], "event_id", "value", k=k
    )
    writer(events.limit(200), 0)
    writer(events.limit(200), 0)  # double replay
    after = sorted(
        map(
            tuple,
            monitor.read_merged_quantiles(
                spark, out, ["event_type"], "value", k=k
            ).collect(),
        )
    )
    # still one shard per batch id, result stable across replays
    writer(events.limit(200), 0)
    again = sorted(
        map(
            tuple,
            monitor.read_merged_quantiles(
                spark, out, ["event_type"], "value", k=k
            ).collect(),
        )
    )
    assert after == again

"""Direct unit tests for the shared committed-shard machinery —
subsumption-rule edges that the per-sink suites only hit indirectly."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import shardstore


def _write_shard(spark, root, name, values):
    df = spark.range(0).select(F.lit(0).alias("v")).limit(0)
    spark.createDataFrame([(v,) for v in values], "v long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, name))


def test_listing_guards_and_success_filter(spark, tmp_path):
    root = str(tmp_path / "store")
    _write_shard(spark, root, "batch=0", [1, 2])
    _write_shard(spark, root, "batch=1", [3])
    # partial: data present, no _SUCCESS
    shutil.copytree(os.path.join(root, "batch=1"), os.path.join(root, "batch=2"))
    os.remove(os.path.join(root, "batch=2", "_SUCCESS"))
    # unparseable suffixes of every recognized prefix
    for junk in ("batch=tmp-x", "batch_id=abc", "compact_upto=?"):
        os.makedirs(os.path.join(root, junk))
    got = shardstore.committed_shard_dirs(root)
    assert [(k, n) for k, n, _ in got] == [("batch", 0), ("batch", 1)]
    df = shardstore.read_shards(spark, root)
    assert sorted(r["v"] for r in df.collect()) == [1, 2, 3]


def test_subsumption_rule_with_stacked_compacts(spark, tmp_path):
    """Crash mid-cleanup can leave an OLDER compact dir plus batch
    shards it subsumed: readers take only the newest compact and
    batches strictly above it — exact, not duplicate-tolerant."""
    root = str(tmp_path / "store")
    _write_shard(spark, root, "compact_upto=3", [1, 2, 3])
    _write_shard(spark, root, "compact_upto=5", [1, 2, 3, 4, 5])  # newest
    _write_shard(spark, root, "batch=4", [4])   # subsumed leftover
    _write_shard(spark, root, "batch=5", [5])   # subsumed leftover
    _write_shard(spark, root, "batch=6", [6])   # genuinely new
    active = shardstore.active_shard_dirs(root)
    assert [(k, n) for k, n, _ in active] == [("batch", 6), ("compact", 5)]
    df = shardstore.read_shards(spark, root)
    assert sorted(r["v"] for r in df.collect()) == [1, 2, 3, 4, 5, 6]
    shardstore.cleanup_subsumed(root)
    left = sorted(
        e for e in os.listdir(root) if "=" in e and not e.startswith("_")
    )
    assert left == ["batch=6", "compact_upto=5"]


def test_compact_folds_active_only_and_sizes_output(spark, tmp_path):
    root = str(tmp_path / "store")
    for b in range(4):
        _write_shard(spark, root, f"batch={b}", [b])
    stats = shardstore.compact_shards(spark, root)
    assert stats == {"dirs_before": 4, "dirs_after": 1}
    assert os.path.exists(os.path.join(root, "compact_upto=3", "_SUCCESS"))
    df = shardstore.read_shards(spark, root)
    assert sorted(r["v"] for r in df.collect()) == [0, 1, 2, 3]
    # idempotent: a second call with nothing new only re-checks
    assert shardstore.compact_shards(spark, root)["dirs_after"] == 1
    # a fold is applied to the merged frame
    _write_shard(spark, root, "batch=9", [0, 1])
    stats = shardstore.compact_shards(
        spark, root, fold=lambda d: d.groupBy("v").agg(F.count("*").alias("n")).select("v")
    )
    assert stats["dirs_after"] == 1
    df = shardstore.read_shards(spark, root)
    assert sorted(r["v"] for r in df.collect()) == [0, 1, 2, 3]

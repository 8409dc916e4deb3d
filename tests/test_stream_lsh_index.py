"""Streaming LSH band index: merged shards must be ROW-IDENTICAL to
batch-mode banding of the full stream, replay idempotent, compaction
value-neutral, and the index-served incremental join must equal the
recomputing operator exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import lsh_index
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).select(
        "doc_id", "text"
    )


def _band_rows(df):
    return sorted(
        (r["doc_id"], r["band_id"], r["band_hash"]) for r in df.collect()
    )


def test_merged_band_index_equals_batch_banding(spark, tmp_path):
    out = str(tmp_path / "lsh")
    docs = _docs(spark)
    handle = lsh_index.make_lsh_batch_writer(out)
    cuts = (0, 150, 320, 10**18)
    for b in range(3):
        handle(
            docs.filter((docs.doc_id >= cuts[b]) & (docs.doc_id < cuts[b + 1])), b
        )
    merged = lsh_index.read_lsh_index(spark, out)
    direct = dedupe.minhash_bands(docs, "doc_id", "text")
    assert _band_rows(merged) == _band_rows(direct)


def test_band_replay_and_compaction(spark, tmp_path):
    out = str(tmp_path / "lsh")
    docs = _docs(spark)
    handle = lsh_index.make_lsh_batch_writer(out)
    handle(docs.filter(docs.doc_id < 200), 0)
    handle(docs.filter(docs.doc_id >= 200), 1)
    before = _band_rows(lsh_index.read_lsh_index(spark, out))
    handle(docs.filter(docs.doc_id >= 200), 1)  # crash-replay
    assert _band_rows(lsh_index.read_lsh_index(spark, out)) == before
    stats = lsh_index.compact_lsh_shards(spark, out)
    assert stats["dirs_after"] == 1
    assert _band_rows(lsh_index.read_lsh_index(spark, out)) == before
    # post-compaction replay lands under the watermark and is ignored
    handle(docs.filter(docs.doc_id >= 200), 1)
    assert _band_rows(lsh_index.read_lsh_index(spark, out)) == before


def test_index_served_join_equals_recompute(spark, tmp_path):
    """The payoff contract: candidates from the STORED index +
    verification against only the candidate docs' texts must
    reproduce dedupe.lsh_incremental_join row for row."""
    out = str(tmp_path / "lsh")
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    batch = docs.filter(F.col("doc_id") % 17 == 0)
    handle = lsh_index.make_lsh_batch_writer(out)
    # the corpus index accumulates over two maintenance batches
    handle(corpus.filter(corpus.doc_id < 250), 0)
    handle(corpus.filter(corpus.doc_id >= 250), 1)

    served = sorted(
        map(
            tuple,
            lsh_index.incremental_join_against_index(
                spark, out, corpus, batch, t_num=7, t_den=10
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            dedupe.lsh_incremental_join(
                corpus, batch, "doc_id", "text", t_num=7, t_den=10
            ).collect(),
        )
    )
    assert served == recomputed and len(served) > 0


def test_lsh_index_live_stream(spark, tmp_path):
    """availableNow file-stream smoke: the sink drains and the stored
    index serves the incremental join identically."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "lsh")
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    batch = docs.filter(F.col("doc_id") % 17 == 0)
    corpus.repartition(4).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(src)
    )
    q = (
        lsh_index.lsh_index_sink(
            stream, out, checkpoint_dir=str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    served = sorted(
        map(
            tuple,
            lsh_index.incremental_join_against_index(
                spark, out, corpus, batch
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            dedupe.lsh_incremental_join(corpus, batch, "doc_id", "text").collect(),
        )
    )
    assert served == recomputed

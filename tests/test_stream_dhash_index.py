"""Streaming dHash fingerprint index: merged shards must be
ROW-IDENTICAL to batch-mode hashing of the full stream's decodable
payloads, replay idempotent, compaction value-neutral, and the
index-served image join must equal the recomputing cross-pair
operator exactly — with ZERO corpus payload re-reads (the stored
fingerprints are the whole verification input)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import dhash_index
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).select(
        "doc_id", "text"
    )


def _media(docs):
    return multimodal.synthesize_minhash_pgm(docs, "doc_id", "text")


def _hash_rows(df):
    return sorted(
        (r["media_id"], r["b0"], r["b1"], r["b2"], r["b3"])
        for r in df.collect()
    )


def test_merged_dhash_index_equals_batch_hashing(spark, tmp_path):
    out = str(tmp_path / "dh")
    docs = _docs(spark)
    handle = dhash_index.make_dhash_batch_writer(out)
    cuts = (0, 150, 320, 10**18)
    for b in range(3):
        handle(
            _media(docs.filter((docs.doc_id >= cuts[b]) & (docs.doc_id < cuts[b + 1]))),
            b,
        )
    merged = dhash_index.read_dhash_index(spark, out)
    direct = (
        multimodal.dhash_bands_from_pgm(_media(docs))
        .filter(F.col("decode_ok"))
        .select("media_id", "b0", "b1", "b2", "b3")
    )
    assert _hash_rows(merged) == _hash_rows(direct)


def test_dhash_replay_compaction_and_corrupt_rows(spark, tmp_path):
    out = str(tmp_path / "dh")
    docs = _docs(spark)
    handle = dhash_index.make_dhash_batch_writer(out)
    m0 = _media(docs.filter(docs.doc_id < 200))
    # corrupt a payload in batch 1: it must never enter the index,
    # exactly as the batch operator's decode_ok filter drops it
    m1 = _media(docs.filter(docs.doc_id >= 200)).withColumn(
        "payload",
        F.when(
            F.col("media_id") == 201, F.expr("substring(payload, 1, 5)")
        ).otherwise(F.col("payload")),
    )
    handle(m0, 0)
    handle(m1, 1)
    before = _hash_rows(dhash_index.read_dhash_index(spark, out))
    assert not any(r[0] == 201 for r in before)
    handle(m1, 1)  # crash-replay overwrites its own shard
    assert _hash_rows(dhash_index.read_dhash_index(spark, out)) == before
    stats = dhash_index.compact_dhash_shards(spark, out)
    assert stats["dirs_after"] == 1
    assert _hash_rows(dhash_index.read_dhash_index(spark, out)) == before
    # post-compaction replay lands under the watermark and is ignored
    handle(m1, 1)
    assert _hash_rows(dhash_index.read_dhash_index(spark, out)) == before


def test_index_served_image_join_equals_recompute(spark, tmp_path):
    out = str(tmp_path / "dh")
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    batch = docs.filter(F.col("doc_id") % 17 == 0)
    handle = dhash_index.make_dhash_batch_writer(out)
    handle(_media(corpus.filter(corpus.doc_id < 250)), 0)
    handle(_media(corpus.filter(corpus.doc_id >= 250)), 1)

    served = sorted(
        map(
            tuple,
            dhash_index.incremental_image_join_against_index(
                spark, out, _media(batch)
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            multimodal.dhash_cross_pairs(
                multimodal.dhash_bands_from_pgm(_media(corpus)),
                multimodal.dhash_bands_from_pgm(_media(batch)),
            ).collect(),
        )
    )
    assert served == recomputed and len(served) > 0


def test_dhash_index_live_stream(spark, tmp_path):
    """availableNow file-stream smoke: docs stream in, the synthesis
    projection runs ON the stream, the sink drains, and the stored
    index serves the image join identically."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "dh")
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
        dhash_index.dhash_index_sink(
            _media(stream), out, checkpoint_dir=str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    served = sorted(
        map(
            tuple,
            dhash_index.incremental_image_join_against_index(
                spark, out, _media(batch)
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            multimodal.dhash_cross_pairs(
                multimodal.dhash_bands_from_pgm(_media(corpus)),
                multimodal.dhash_bands_from_pgm(_media(batch)),
            ).collect(),
        )
    )
    assert served == recomputed


def test_dhash_doc_sink_matches_media_sink(spark, tmp_path):
    """The docs-level convenience writer (synthesize inside the batch,
    fan_out below the synthesis) must produce the identical index."""
    docs = _docs(spark).filter(F.col("doc_id") < 200)
    out_doc = str(tmp_path / "dh_doc")
    out_med = str(tmp_path / "dh_med")
    dhash_index.make_dhash_doc_batch_writer(out_doc)(docs, 0)
    dhash_index.make_dhash_batch_writer(out_med)(_media(docs), 0)
    assert _hash_rows(
        dhash_index.read_dhash_index(spark, out_doc)
    ) == _hash_rows(dhash_index.read_dhash_index(spark, out_med))

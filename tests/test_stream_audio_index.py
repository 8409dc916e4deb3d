"""Streaming audio feature store: merged energy-gram posting shards
must be ROW-IDENTICAL to batch-mode gram postings of the full
stream's decodable payloads, replay idempotent, compaction
value-neutral, and the index-served segment match must equal the
recomputing operator exactly — with ZERO payload re-reads or decodes
(the stored postings are the whole match-stage input)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import audio_index
from tests.conftest import SF_SMOKE

_K = 4
_MIN = 8


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).select(
        "doc_id", "text"
    )


def _media(docs):
    return multimodal.synthesize_speech_wav(docs, "doc_id", "text")


def _postings(df):
    return sorted((r["media_id"], r["pos"], r["h"]) for r in df.collect())


def _direct_postings(docs):
    return multimodal.audio_gram_postings(_media(docs), k=_K).select(
        "media_id", F.col("__pos").alias("pos"), F.col("__h").alias("h")
    )


def test_merged_audio_index_equals_batch_postings(spark, tmp_path):
    out = str(tmp_path / "au")
    docs = _docs(spark)
    handle = audio_index.make_audio_batch_writer(out, k=_K)
    cuts = (0, 150, 320, 10**18)
    for b in range(3):
        handle(
            _media(docs.filter((docs.doc_id >= cuts[b]) & (docs.doc_id < cuts[b + 1]))),
            b,
        )
    merged = audio_index.read_audio_index(spark, out)
    assert _postings(merged) == _postings(_direct_postings(docs))


def test_audio_replay_compaction_and_corrupt_rows(spark, tmp_path):
    out = str(tmp_path / "au")
    docs = _docs(spark)
    handle = audio_index.make_audio_batch_writer(out, k=_K)
    m0 = _media(docs.filter(docs.doc_id < 200))
    # corrupt a payload in batch 1: the truncated RIFF emits no frames
    # and must never enter the store, exactly as the batch operator's
    # decode drops it
    m1 = _media(docs.filter(docs.doc_id >= 200)).withColumn(
        "payload",
        F.when(
            F.col("media_id") == 201, F.expr("substring(payload, 1, 5)")
        ).otherwise(F.col("payload")),
    )
    handle(m0, 0)
    handle(m1, 1)
    before = _postings(audio_index.read_audio_index(spark, out))
    assert before and not any(r[0] == 201 for r in before)
    handle(m1, 1)  # crash-replay overwrites its own shard
    assert _postings(audio_index.read_audio_index(spark, out)) == before
    stats = audio_index.compact_audio_shards(spark, out)
    assert stats["dirs_after"] == 1
    assert _postings(audio_index.read_audio_index(spark, out)) == before
    # post-compaction replay lands under the watermark and is ignored
    handle(m1, 1)
    assert _postings(audio_index.read_audio_index(spark, out)) == before


def test_index_served_segments_equal_recompute(spark, tmp_path):
    """The payoff contract: segments served from the store ==
    audio_segment_pairs recomputing from payloads, same knobs,
    max_df engaged."""
    out = str(tmp_path / "au")
    docs = _docs(spark)
    handle = audio_index.make_audio_doc_batch_writer(out, k=_K)
    for b in range(3):
        handle(docs.filter(docs.doc_id % 3 == b), b)
    served = sorted(
        map(
            tuple,
            audio_index.segments_from_index(
                spark, out, k=_K, min_frames=_MIN, max_df=8
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            multimodal.audio_segment_pairs(
                _media(docs), k=_K, min_frames=_MIN, max_df=8
            ).collect(),
        )
    )
    assert served == recomputed and served


def test_audio_index_live_stream(spark, tmp_path):
    """availableNow file-stream smoke: docs stream in, the synthesis
    projection runs ON the stream, the sink drains, and the stored
    postings serve the segment match identically."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "au")
    docs = _docs(spark)
    docs.repartition(4).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(src)
    )
    q = (
        audio_index.audio_index_sink(
            _media(stream), out, k=_K, checkpoint_dir=str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    served = sorted(
        map(
            tuple,
            audio_index.segments_from_index(
                spark, out, k=_K, min_frames=_MIN
            ).collect(),
        )
    )
    recomputed = sorted(
        map(
            tuple,
            multimodal.audio_segment_pairs(
                _media(docs), k=_K, min_frames=_MIN
            ).collect(),
        )
    )
    assert served == recomputed and served


def test_incremental_segments_probe_equals_batch_restriction(spark, tmp_path):
    """The daily-probe form: batch-vs-index segments must equal the
    recomputing operator over the concatenated corpus restricted to
    batch-vs-corpus pairs (either orientation), with the df cap
    computed against the INDEX."""
    out = str(tmp_path / "au")
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    batch = docs.filter(F.col("doc_id") % 17 == 0)
    handle = audio_index.make_audio_doc_batch_writer(out, k=_K)
    for b in range(2):
        handle(corpus.filter(corpus.doc_id % 2 == b), b)
    served = sorted(
        map(
            tuple,
            audio_index.incremental_segments_against_index(
                spark, out, _media(batch), k=_K, min_frames=_MIN
            ).collect(),
        )
    )
    full = multimodal.audio_segment_pairs(
        _media(docs), k=_K, min_frames=_MIN
    )
    bkeys = {r.doc_id for r in batch.select("doc_id").collect()}
    want = sorted(
        (ra, rb, sa, sb, n)
        for (a, b2, s_a, s_b, n) in map(tuple, full.collect())
        if (a in bkeys) != (b2 in bkeys)
        for (ra, rb, sa, sb) in [
            (a, b2, s_a, s_b) if a in bkeys else (b2, a, s_b, s_a)
        ]
    )
    assert served == want and served

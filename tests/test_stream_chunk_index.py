"""Streaming CDC chunk index: merged chunk-hash shards must be
ROW-IDENTICAL to batch-mode cdc_chunks over the concatenated stream,
replay idempotent, compaction value-neutral; the served dup report
must equal the recomputing operator exactly and the incremental
probe must equal the batch-vs-corpus restriction — all with ZERO
document re-reads beyond the arriving batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import chunk_index
from tests.conftest import SF_SMOKE

_W = 4
_MOD = 8


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).select(
        "doc_id", "text"
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_hash"], r["n_tokens"])
        for r in df.collect()
    )


def test_merged_chunk_index_equals_batch_chunks(spark, tmp_path):
    out = str(tmp_path / "ch")
    docs = _docs(spark)
    handle = chunk_index.make_chunk_batch_writer(out, w=_W, boundary_mod=_MOD)
    cuts = (0, 150, 320, 10**18)
    for b in range(3):
        handle(
            docs.filter((docs.doc_id >= cuts[b]) & (docs.doc_id < cuts[b + 1])), b
        )
    merged = chunk_index.read_chunk_index(spark, out)
    direct = dedupe.cdc_chunks(docs, "doc_id", "text", w=_W, boundary_mod=_MOD)
    assert _rows(merged) == _rows(direct)


def test_chunk_replay_and_compaction_value_neutral(spark, tmp_path):
    out = str(tmp_path / "ch")
    docs = _docs(spark)
    handle = chunk_index.make_chunk_batch_writer(out, w=_W, boundary_mod=_MOD)
    b0 = docs.filter(docs.doc_id < 200)
    b1 = docs.filter(docs.doc_id >= 200)
    handle(b0, 0)
    handle(b1, 1)
    before = _rows(chunk_index.read_chunk_index(spark, out))
    handle(b1, 1)  # replay overwrites its own shard — no dup rows
    assert _rows(chunk_index.read_chunk_index(spark, out)) == before
    stats = chunk_index.compact_chunk_shards(spark, out)
    assert stats["dirs_after"] == 1
    assert _rows(chunk_index.read_chunk_index(spark, out)) == before
    # post-compaction replay lands under the watermark and is ignored
    handle(b1, 1)
    assert _rows(chunk_index.read_chunk_index(spark, out)) == before


def test_dup_report_served_from_index(spark, tmp_path):
    out = str(tmp_path / "ch")
    docs = _docs(spark)
    handle = chunk_index.make_chunk_batch_writer(out, w=_W, boundary_mod=_MOD)
    for b in range(2):
        handle(docs.filter(docs.doc_id % 2 == b), b)
    chunk_index.compact_chunk_shards(spark, out)
    served = sorted(
        map(tuple, chunk_index.dup_chunks_from_index(spark, out).collect())
    )
    recomputed = sorted(
        map(
            tuple,
            dedupe.cdc_dup_chunks(
                docs, "doc_id", "text", w=_W, boundary_mod=_MOD
            ).collect(),
        )
    )
    assert served == recomputed and served


def test_incremental_probe_equals_batch_restriction(spark, tmp_path):
    """The daily-probe form must equal the closed-form join of the
    batch's per-hash counts against the corpus's per-hash counts."""
    out = str(tmp_path / "ch")
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 19 != 0)
    batch = docs.filter(F.col("doc_id") % 19 == 0)
    handle = chunk_index.make_chunk_batch_writer(out, w=_W, boundary_mod=_MOD)
    for b in range(2):
        handle(corpus.filter(corpus.doc_id % 2 == b), b)
    served = sorted(
        map(
            tuple,
            chunk_index.incremental_dup_chunks_against_index(
                spark, out, batch, w=_W, boundary_mod=_MOD
            ).collect(),
        )
    )

    def counts(d):
        out_ = {}
        ch = dedupe.cdc_chunks(d, "doc_id", "text", w=_W, boundary_mod=_MOD)
        for r in ch.collect():
            key = r["chunk_hash"]
            cnt, ds, nt = out_.get(key, (0, set(), r["n_tokens"]))
            ds = set(ds) | {r["doc_id"]}
            out_[key] = (cnt + 1, ds, nt)
        return out_

    bc, cc = counts(batch), counts(corpus)
    want = sorted(
        (h, bc[h][0], cc[h][0], len(cc[h][1]), bc[h][2])
        for h in bc
        if h in cc
    )
    assert served == want and served


def test_chunk_index_live_stream(spark, tmp_path):
    """availableNow file-stream smoke: docs stream in, the sink
    drains, and the stored chunks serve the dup report identically."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "ch")
    docs = _docs(spark)
    docs.repartition(4).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(src)
    )
    q = (
        chunk_index.chunk_index_sink(
            stream,
            out,
            w=_W,
            boundary_mod=_MOD,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    served = sorted(
        map(tuple, chunk_index.dup_chunks_from_index(spark, out).collect())
    )
    recomputed = sorted(
        map(
            tuple,
            dedupe.cdc_dup_chunks(
                docs, "doc_id", "text", w=_W, boundary_mod=_MOD
            ).collect(),
        )
    )
    assert served == recomputed and served

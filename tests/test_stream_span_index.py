"""Streaming winnowing fingerprint index: merged shards must be
ROW-IDENTICAL to batch-mode winnowing of the full stream, replay
idempotent, compaction value-neutral, and the index-served
incremental span extraction must equal the batch operator exactly on
batch-vs-corpus pairs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import span_index
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).select(
        "doc_id", "text"
    )


def _fp_rows(df):
    return sorted((r["doc_id"], r["fp"]) for r in df.collect())


def _cross_spans_via_batch_operator(docs, batch_pred):
    """Reference result: the batch operator over the FULL corpus,
    restricted to pairs with exactly one batch-side doc, oriented
    (batch_doc, corpus_doc)."""
    out = []
    for r in dedupe.repeated_span_pairs(docs, "doc_id", "text", k=8, w=9).collect():
        a_in, b_in = batch_pred(r["doc_a"]), batch_pred(r["doc_b"])
        if a_in == b_in:
            continue
        if a_in:
            out.append((r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_tokens"]))
        else:
            out.append((r["doc_b"], r["doc_a"], r["start_b"], r["start_a"], r["span_tokens"]))
    return sorted(out)


def test_merged_fp_index_equals_batch_winnowing(spark, tmp_path):
    out = str(tmp_path / "spanidx")
    docs = _docs(spark)
    handle = span_index.make_span_batch_writer(out)
    cuts = (0, 150, 320, 10**18)
    for b in range(3):
        handle(
            docs.filter((docs.doc_id >= cuts[b]) & (docs.doc_id < cuts[b + 1])), b
        )
    merged = span_index.read_span_index(spark, out)
    direct = span_index._fp_postings(docs, "doc_id", "text", 8, 9)
    assert _fp_rows(merged) == _fp_rows(direct)


def test_fp_replay_and_compaction(spark, tmp_path):
    out = str(tmp_path / "spanidx")
    docs = _docs(spark)
    handle = span_index.make_span_batch_writer(out)
    handle(docs.filter(docs.doc_id < 200), 0)
    handle(docs.filter(docs.doc_id >= 200), 1)
    before = _fp_rows(span_index.read_span_index(spark, out))
    handle(docs.filter(docs.doc_id >= 200), 1)  # crash-replay
    assert _fp_rows(span_index.read_span_index(spark, out)) == before
    stats = span_index.compact_span_shards(spark, out)
    assert stats["dirs_after"] == 1
    assert _fp_rows(span_index.read_span_index(spark, out)) == before
    # post-compaction replay lands under the watermark and is ignored
    handle(docs.filter(docs.doc_id >= 200), 1)
    assert _fp_rows(span_index.read_span_index(spark, out)) == before


def test_index_served_spans_equal_batch_operator(spark, tmp_path):
    """The payoff contract: candidates from the STORED fingerprint
    index + positional verification against only the candidate docs'
    texts must reproduce repeated_span_pairs row for row on the
    batch-vs-corpus cross pairs."""
    out = str(tmp_path / "spanidx")
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    batch = docs.filter(F.col("doc_id") % 17 == 0)
    handle = span_index.make_span_batch_writer(out)
    # the corpus index accumulates over two maintenance batches
    handle(corpus.filter(corpus.doc_id < 250), 0)
    handle(corpus.filter(corpus.doc_id >= 250), 1)

    served = sorted(
        map(
            tuple,
            span_index.incremental_spans_against_index(
                spark, out, corpus, batch
            ).collect(),
        )
    )
    expected = _cross_spans_via_batch_operator(docs, lambda d: d % 17 == 0)
    assert served == expected and len(served) > 0


def test_span_index_live_stream(spark, tmp_path):
    """availableNow file-stream smoke: the sink drains and the stored
    index serves the incremental span extraction identically."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "spanidx")
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
        span_index.span_index_sink(
            stream, out, checkpoint_dir=str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    served = sorted(
        map(
            tuple,
            span_index.incremental_spans_against_index(
                spark, out, corpus, batch
            ).collect(),
        )
    )
    expected = _cross_spans_via_batch_operator(docs, lambda d: d % 17 == 0)
    assert served == expected


def test_index_served_spans_max_df(spark, tmp_path):
    """The boilerplate escape on the index side: an above-cap
    fingerprint's candidates vanish; a loose cap is output-identical."""
    out = str(tmp_path / "spanidx")
    boiler = [f"b{i}" for i in range(20)]
    corpus_rows = [
        (i, " ".join(boiler + [f"c{i}_{j}" for j in range(10)]))
        for i in range(1, 31)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, " ".join(boiler + ["q1", "q2", "q3"]))],
        "doc_id long, text string",
    )
    span_index.make_span_batch_writer(out)(corpus, 0)
    uncapped = span_index.incremental_spans_against_index(
        spark, out, corpus, batch
    )
    assert uncapped.count() == 30  # the boilerplate span vs every doc
    capped = span_index.incremental_spans_against_index(
        spark, out, corpus, batch, max_df=8
    )
    assert capped.count() == 0
    loose = span_index.incremental_spans_against_index(
        spark, out, corpus, batch, max_df=10**6
    )
    assert sorted(map(tuple, loose.collect())) == sorted(
        map(tuple, uncapped.collect())
    )

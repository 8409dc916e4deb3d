"""Streaming vocabulary (word-frequency) index: the served vocab must
be ROW-IDENTICAL to one batch pass over the full corpus, replay
idempotent, compaction value-neutral, and the index-served BPE train
must equal the recomputing trainer exactly (integer counts + the
deterministic winner order make it an equality, not a similarity)."""

from __future__ import annotations

import os

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import tokenizer
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import shardstore, vocab_index
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).select(
        "doc_id", "text"
    )


def _vocab_rows(df):
    return sorted((r["word"], r["freq"]) for r in df.collect())


def _write_batches(spark, out, docs, cuts=(0, 150, 320, 10**18)):
    handle = vocab_index.make_vocab_batch_writer(out)
    for b in range(len(cuts) - 1):
        handle(
            docs.filter((docs.doc_id >= cuts[b]) & (docs.doc_id < cuts[b + 1])),
            b,
        )
    return handle


def test_served_vocab_equals_batch_pass(spark, tmp_path):
    out = str(tmp_path / "vx")
    docs = _docs(spark)
    _write_batches(spark, out, docs)
    served = vocab_index.read_vocab(spark, out)
    direct = tokenizer.word_freqs(docs, "text")
    assert _vocab_rows(served) == _vocab_rows(direct)


def test_vocab_replay_and_compaction_value_neutral(spark, tmp_path):
    out = str(tmp_path / "vx")
    docs = _docs(spark)
    handle = _write_batches(spark, out, docs)
    before = _vocab_rows(vocab_index.read_vocab(spark, out))
    # replay batch 1: overwrites its own shard, counts unchanged
    handle(docs.filter((docs.doc_id >= 150) & (docs.doc_id < 320)), 1)
    assert _vocab_rows(vocab_index.read_vocab(spark, out)) == before
    # compaction folds to summary size and stays value-neutral
    vocab_index.compact_vocab_shards(spark, out)
    dirs = [k for k, _, _ in shardstore.active_shard_dirs(out)]
    assert dirs == ["compact"]
    assert _vocab_rows(vocab_index.read_vocab(spark, out)) == before
    # a post-compaction batch unions on top of the compacted summary
    handle(docs.filter(docs.doc_id < 5), 7)
    plus = _vocab_rows(vocab_index.read_vocab(spark, out))
    assert sum(f for _, f in plus) > sum(f for _, f in before)


def test_index_served_bpe_equals_recompute(spark, tmp_path):
    out = str(tmp_path / "vx")
    docs = _docs(spark)
    _write_batches(spark, out, docs)
    vocab_index.compact_vocab_shards(spark, out)
    served = vocab_index.bpe_merges_from_index(spark, out, steps=3, top=5)
    direct = tokenizer.bpe_train_steps(docs, "text", steps=3, top=5)
    got = sorted(map(tuple, served.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want and len(got) == 15


def test_bpe_compression_ratio_bounds(spark):
    docs = _docs(spark).limit(100)
    _steps, vocab = tokenizer.bpe_train_from_vocab(
        tokenizer.word_freqs(docs, "text"), steps=3
    )
    docs = docs.withColumn("grp", docs.doc_id % 2)
    out = tokenizer.bpe_compression_by_group(docs, "grp", "text", vocab)
    rows = out.collect()
    assert len(rows) == 2
    for r in rows:
        # merges only ever shrink the symbol count, never below
        # chars/len(longest merged symbol)
        assert r.tokens <= r.chars
        assert r.ratio >= 1.0
        assert abs(r.ratio - round(r.chars / r.tokens, 6)) < 1e-9

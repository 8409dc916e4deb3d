"""Streaming word-frequency (vocabulary) index maintenance — the
tokenizer-training leg of the index family.

The SEVENTH leg (SimHash novelty gate: ``corpus_ingest.py``; IVF
postings: ``ann_index.py``; MinHash-LSH bands: ``lsh_index.py``;
winnowing span postings: ``span_index.py``; dHash fingerprints:
``dhash_index.py``; plus the served IVF top-k of ``q152``): BPE
tokenizer training iterates over the ``(word, freq)`` VOCABULARY, and
at 100 TB the one thing you must never redo is the corpus -> vocab
collapse.  This sink maintains that collapse incrementally — each
arriving batch contributes its own partial word counts as a
``batch=N`` shard, and training runs entirely FROM the store with
zero corpus re-reads.

Word counts are the canonical LINEAR summary (a sum), so the whole
lifecycle is the count-min sink's, at word granularity:

- write cost ∝ batch distinct words (one partial-aggregate pass over
  the batch's tokens; never a rewrite of accumulated counts);
- replay idempotency: a re-run batch overwrites its OWN ``batch=N``
  directory, and counting is deterministic;
- compaction fold = per-word summation — value-neutral by
  associativity of ``+`` (the read path sums anyway);
- committed-only subsumption reads from ``shardstore``.

:func:`bpe_merges_from_index` is the payoff: the first-N BPE merges
computed from the STORED vocabulary, pinned hash-identical to
recomputing :func:`~hospital_data_engineering_pipeline_end_to_end_project_spark.operators.tokenizer.bpe_train_steps`
over the concatenated corpus (integer pair counts + the deterministic
winner order make the equality exact, not approximate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import tokenizer
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import shardstore


def make_vocab_batch_writer(out_dir: str, text_col: str = "text"):
    """``foreachBatch`` body over DOCUMENT batches: collapse THIS
    batch to its partial ``(word, freq)`` counts and write the shard.
    Shards carry no batch column — the dir name is the batch identity
    and counts are mergeable without it."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        wf = tokenizer.word_freqs(batch_df, text_col)
        shardstore.write_shard(
            wf, os.path.join(out_dir, f"batch={batch_id}")
        )

    return handle


def vocab_index_sink(
    stream: DataFrame,
    out_dir: str,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
):
    """Attach the partial-count writer to a document stream."""
    writer = stream.writeStream.foreachBatch(
        make_vocab_batch_writer(out_dir, text_col)
    ).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def compact_vocab_shards(spark: SparkSession, out_dir: str) -> dict[str, int]:
    """Compact the vocab store: counts are LINEAR, the fold is plain
    per-word summation (the read path's own aggregate, hence
    value-neutral by associativity)."""

    def fold(df: DataFrame) -> DataFrame:
        return df.groupBy("word").agg(F.sum("freq").alias("freq"))

    return shardstore.compact_shards(spark, out_dir, fold=fold)


def read_vocab(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The served vocabulary: union of active shards, summed per word.
    After compaction this is one summary-sized dir plus any newer
    batch shards."""
    df = shardstore.read_shards(spark, out_dir)
    if df is None:
        return None
    return df.groupBy("word").agg(F.sum("freq").alias("freq"))


def bpe_merges_from_index(
    spark: SparkSession,
    out_dir: str,
    steps: int = 3,
    top: int = 5,
) -> DataFrame:
    """First-``steps`` BPE merges computed entirely FROM the stored
    vocabulary — the train step a tokenizer service runs nightly
    without touching corpus text."""
    vocab = read_vocab(spark, out_dir)
    if vocab is None:
        raise ValueError(f"vocab index at {out_dir} has no committed shards")
    steps_df, _final = tokenizer.bpe_train_from_vocab(vocab, steps=steps, top=top)
    return steps_df

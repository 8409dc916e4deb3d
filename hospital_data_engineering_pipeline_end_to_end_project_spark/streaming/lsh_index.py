"""Streaming MinHash-LSH band index maintenance — per-batch band
shards.

The third leg of the index-maintenance triad (SimHash novelty gate:
``corpus_ingest.py``; IVF postings: ``ann_index.py``): the corpus's
LSH band index is what :func:`~hospital_data_engineering_pipeline_end_to_end_project_spark.operators.dedupe.lsh_incremental_join`
probes daily, and recomputing it from the corpus text per probe is
exactly the rescan a 100 TB pipeline cannot afford.  Banding is
STATELESS per document (md5-derived MinHash under a frozen
``(num_hashes, bands, shingle_n)`` config), so the sink mirrors the
IVF contract:

- write cost ∝ batch (a ``batch=N`` shard of (id, band_id,
  band_hash) rows; never a rewrite of accumulated bands);
- replay idempotency: banding is deterministic given the config, and
  a re-run batch overwrites its OWN ``batch=N`` directory;
- exact-identity reads: the merged shards are ROW-IDENTICAL to a
  batch-mode ``minhash_bands`` over the concatenated stream (pinned
  by ``tests/test_stream_lsh_index.py``);
- lifecycle from ``shardstore``: committed-only subsumption reads,
  plain-union compaction.

:func:`incremental_join_against_index` is the payoff: the q139
incremental near-dup join with the corpus side served FROM the
stored index — candidates come from one index scan with the batch's
bands broadcast, and only the CANDIDATE corpus docs' texts are read
for exact verification (a semi-join keyed scan, not a corpus
rescan).  Pinned row-identical to the recomputing operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import text as TX
from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import shardstore


def make_lsh_batch_writer(
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 5,
):
    """``foreachBatch`` body: band THIS batch's documents, write the
    band shard (``batch_id`` stamped as a column, the established
    sink contract)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        banded = dedupe.minhash_bands(
            batch_df.select(id_col, text_col),
            id_col,
            text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        shardstore.write_shard(
            banded, os.path.join(out_dir, f"batch={batch_id}")
        )

    return handle


def lsh_index_sink(
    stream: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 5,
    checkpoint_dir: str | None = None,
):
    """Attach the per-batch band writer to a document stream —
    continuous LSH index maintenance: each micro-batch costs one
    shingle+MinHash pass over the batch (explode + map-side-combined
    min aggregates, the q25 shape) plus a batch-sized shard write."""
    writer = stream.writeStream.foreachBatch(
        make_lsh_batch_writer(
            out_dir, id_col, text_col, num_hashes, bands, shingle_n
        )
    ).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def read_lsh_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The band index of EVERYTHING ingested so far: union of the
    ACTIVE committed shards (``shardstore`` — ``_SUCCESS`` filtered,
    compaction-subsumption applied), ``(id, band_id, band_hash,
    batch_id)``."""
    df = shardstore.read_shards(spark, out_dir)
    if df is None:
        raise FileNotFoundError(f"no committed LSH band shards under {out_dir!r}")
    return df


def compact_lsh_shards(spark: SparkSession, out_dir: str) -> dict[str, int]:
    """Fold the per-batch band shards into one ``compact_upto=N`` dir
    — band rows are plain postings (no summary to merge), so the fold
    is the identity union; commit-then-delete via
    ``shardstore.compact_shards``."""
    return shardstore.compact_shards(spark, out_dir)


def incremental_join_against_index(
    spark: SparkSession,
    out_dir: str,
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 5,
    t_num: int = 7,
    t_den: int = 10,
) -> DataFrame:
    """The q139 incremental near-dup join with candidates served from
    the STORED band index instead of re-banding the corpus.

    The band config must match the writer's (banding is exact given
    the config, so the candidate set is identical — pinned by
    ``tests/test_stream_lsh_index.py``).  ``corpus`` supplies only
    the TEXTS for exact verification, and only candidate docs' rows
    survive the semi-join before the shingle sets are built — the
    full corpus text is never re-shingled.

    Returns the :func:`~hospital_data_engineering_pipeline_end_to_end_project_spark.operators.dedupe.lsh_incremental_join`
    schema: ``(batch_doc, corpus_doc, inter_size, union_size,
    jaccard)``.
    """
    cb = read_lsh_index(spark, out_dir)
    bb = dedupe.minhash_bands(
        batch.select(id_col, text_col),
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    cand = (
        cb.alias("c")
        .join(
            F.broadcast(bb.alias("b")),
            (F.col("c.band_id") == F.col("b.band_id"))
            & (F.col("c.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col(f"b.{id_col}").alias("batch_doc"),
            F.col(f"c.{id_col}").alias("corpus_doc"),
        )
        .distinct()
    )
    # only candidate corpus docs are shingled: semi-join BEFORE the
    # array build, so verification cost is candidates x doc length
    corpus_cand = corpus.join(
        cand.select(F.col("corpus_doc").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    shc = corpus_cand.select(
        F.col(id_col).alias("corpus_doc"),
        F.array_distinct(TX.shingles(text_col, shingle_n)).alias("__shc"),
    )
    shb = batch.select(
        F.col(id_col).alias("batch_doc"),
        F.array_distinct(TX.shingles(text_col, shingle_n)).alias("__shb"),
    )
    inter = F.size(F.array_intersect("__shb", "__shc"))
    union = F.size("__shb") + F.size("__shc") - inter
    return (
        cand.join(F.broadcast(shb), "batch_doc")
        .join(shc, "corpus_doc")
        .withColumn("inter_size", inter.cast("long"))
        .withColumn("union_size", union.cast("long"))
        .filter(
            (t_den + t_num) * F.col("inter_size")
            >= t_num * (F.size("__shb") + F.size("__shc"))
        )
        .select(
            "batch_doc",
            "corpus_doc",
            "inter_size",
            "union_size",
            F.round(
                F.col("inter_size").cast("double") / F.col("union_size"), 6
            ).alias("jaccard"),
        )
    )

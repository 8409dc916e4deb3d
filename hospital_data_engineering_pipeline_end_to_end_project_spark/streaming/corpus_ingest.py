"""Streaming corpus ingestion with a persistent novelty gate.

The flagship training-data ingestion loop, composed from pieces this
engine already attests separately: each micro-batch of documents is
screened against the corpus's stored SimHash fingerprint INDEX
(16 bytes per admitted doc — the corpus text is never re-read, let
alone re-fingerprinted), novel docs are appended to the accepted
store, and the index advances in the same batch — so the gate a
100 TB corpus runs on every incoming crawl shard is one banded
equi-join of the batch against warm state
(``operators/dedupe.simhash_novel_against_index``, exact by the
pigeonhole argument).

The index is SHARDED per batch (``fingerprints/batch_id=N``), so the
per-batch write cost is proportional to the batch — never to the
accumulated index (a monolithic rewrite-per-batch would be quadratic
over the stream's lifetime); readers union the shards through plain
partition discovery.  Exactly-once posture mirrors the SCD2 sink
(``streaming/ingest.make_scd2_batch_merger``): both the accepted docs
and the fingerprint shard land in DETERMINISTIC per-batch directories
(replaying a batch overwrites its own output, never duplicates it),
and the applied-batch marker ledger short-circuits replays — a crash
between the shard commit and the marker is recovered by the shard's
own ``_SUCCESS`` (the shard IS the epoch), and a crash mid-write
leaves no ``_SUCCESS``, so the replay recomputes and overwrites.
Small-file pressure from many tiny shards is the standard trade the
repo's ``sources/compaction.py`` exists for.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore

#: directory names under the store root
INDEX_DIR = "fingerprints"
ACCEPTED_DIR = "accepted"

#: entity name kept for BC with the r09 SilverStore-backed layout
INDEX_ENTITY = INDEX_DIR


def accepted_batch_path(root: str, batch_id: int) -> str:
    return os.path.join(root, ACCEPTED_DIR, f"batch_id={batch_id}")


def index_shard_path(root: str, batch_id: int) -> str:
    return os.path.join(root, INDEX_DIR, f"batch_id={batch_id}")


def read_index(spark, root: str, id_col: str = "doc_id") -> DataFrame:
    """Union of all committed fingerprint shards (partition
    discovery); empty-typed frame when no shard exists yet."""
    p = os.path.join(root, INDEX_DIR)
    if os.path.isdir(p) and any(
        e.startswith("batch_id=") for e in os.listdir(p)
    ):
        return spark.read.parquet(p).select(id_col, "simhash")
    return None


def make_novelty_batch_ingestor(
    store: SilverStore,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    skip_applied: bool = True,
):
    """The ``foreachBatch`` body of :func:`novelty_ingest_sink`,
    factored out (like the SCD2 merger) so replay behavior is
    directly testable.

    Per batch: (1) intra-batch guard — among batch docs sharing an
    IDENTICAL fingerprint only the lowest id survives (the
    batch-vs-state gate cannot see duplicates that arrive together;
    near-dup pairs *within* one batch are admitted and then block all
    future look-alikes — the standard streaming-dedup horizon trade,
    documented rather than hidden); (2) batch-vs-index banded
    membership test; (3) novel docs and their fingerprint shard each
    written to the batch's own deterministic directory (idempotent
    under replay; shard cost ∝ batch, not ∝ index).
    """
    root = store.root
    ledger = os.path.join(root, "silver", f"{INDEX_DIR}__applied")

    def _write_marker(marker: str) -> None:
        os.makedirs(ledger, exist_ok=True)
        with open(marker, "w"):
            pass

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger, f"batch-{batch_id}")
        if skip_applied and os.path.exists(marker):
            return
        shard = index_shard_path(root, batch_id)
        if skip_applied and os.path.exists(
            os.path.join(shard, "_SUCCESS")
        ):
            # crash landed between the shard commit and the marker on
            # a previous run of this very batch — the shard IS the
            # epoch: restore the marker and skip the re-apply
            _write_marker(marker)
            return
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col)
        index = read_index(spark, root, id_col)
        if index is None:
            # empty index with the id type taken from the batch, so
            # string/int-typed ids union cleanly
            index = batch.select(id_col).limit(0).withColumn(
                "simhash", F.lit(0).cast("long")
            )
        verdicts = dedupe.simhash_novel_against_index(
            index, batch, id_col, text_col, bits, bands, max_hamming
        )
        # intra-batch guard: identical fingerprints inside one batch
        # collapse to the lowest id (deterministic)
        w = Window.partitionBy("simhash").orderBy(id_col)
        novel = (
            verdicts.filter(F.col("is_novel"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(id_col, "simhash")
        )
        accepted = batch.join(novel.select(id_col), id_col, "left_semi")
        accepted.write.mode("overwrite").parquet(
            accepted_batch_path(root, batch_id)
        )
        novel.write.mode("overwrite").parquet(shard)
        if skip_applied:
            _write_marker(marker)

    return _ingest


def novelty_ingest_sink(
    stream: DataFrame,
    store: SilverStore,
    checkpoint_dir: str | None = None,
    **kwargs,
):
    """Continuously ingest a document stream through the novelty gate
    (``foreachBatch`` — one code path for batch and streaming, the
    same Kappa idiom as the SCD2 sink)."""
    writer = stream.writeStream.foreachBatch(
        make_novelty_batch_ingestor(store, **kwargs)
    ).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer

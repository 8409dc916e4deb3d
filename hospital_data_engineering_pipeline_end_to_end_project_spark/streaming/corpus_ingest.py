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

Exactly-once posture mirrors the SCD2 sink
(``streaming/ingest.make_scd2_batch_merger``): accepted docs land in
a DETERMINISTIC per-batch directory (``accepted/batch_id=N`` —
replaying a batch overwrites its own output, never duplicates it),
the index publishes through ``SilverStore.write(applied_batch=...)``
(the batch id rides INSIDE the atomic state rename), and the
applied-batch marker ledger short-circuits replays — with the
index epoch covering a crash between commit and marker.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore

#: entity name of the fingerprint index inside the SilverStore root
INDEX_ENTITY = "corpus_fingerprints"


def accepted_batch_path(root: str, batch_id: int) -> str:
    return os.path.join(root, "accepted", f"batch_id={batch_id}")


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
    membership test; (3) novel docs written to the batch's own
    ``accepted/batch_id=N`` directory (idempotent under replay);
    (4) index state advanced via the epoch-carrying atomic swap.
    """
    ledger = os.path.join(store.root, "silver", f"{INDEX_ENTITY}__applied")

    def _write_marker(marker: str) -> None:
        os.makedirs(ledger, exist_ok=True)
        with open(marker, "w"):
            pass

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger, f"batch-{batch_id}")
        if skip_applied and os.path.exists(marker):
            return
        if skip_applied and store.last_applied(INDEX_ENTITY) == batch_id:
            _write_marker(marker)
            return
        if batch_df.isEmpty():
            return
        batch = batch_df.select(id_col, text_col)
        if store.exists(INDEX_ENTITY):
            index = store.read(INDEX_ENTITY)
        else:
            # empty index with the id type taken from the batch, so
            # string/int/composite-typed ids union cleanly
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
            accepted_batch_path(store.root, batch_id)
        )
        store.write(
            INDEX_ENTITY,
            index.unionByName(novel),
            applied_batch=batch_id if skip_applied else None,
        )
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

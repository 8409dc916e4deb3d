"""Composed incremental lifecycle, end-to-end.

The pieces are individually pinned (novelty gate, index-served
incremental join, incremental label maintenance, leakage-free split);
this suite asserts the COMPOSITION — exactly what a production corpus
service runs nightly: each arriving batch is (1) screened by the
SimHash novelty gate, (2) near-dup-joined against the corpus via the
STORED LSH band index (never re-banding the corpus), (3) folded into
the maintained cluster-label table, after which (4) the train/val/test
split is refreshed from those labels — and the final split must equal
the from-scratch batch derivation over the final accepted corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import components, dataprep, dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest, lsh_index
from tests.conftest import SF_SMOKE

_N_BATCHES = 4
_ROUNDS = 8  # headroom over q141's 4: multi-batch chains can daisy-link


def _verified_pairs(corpus, batch):
    """Exact-verified near-dup pairs (Jaccard >= 0.7), recomputing
    shape — the from-scratch reference edge generator."""
    return dedupe.lsh_incremental_join(corpus, batch, "doc_id", "text")


def test_lifecycle_stream_equals_batch_derivation(spark, tmp_path):
    d = (
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
        .select("doc_id", "text")
    )
    store = SilverStore(spark, str(tmp_path / "corpus"))
    ingest = corpus_ingest.make_novelty_batch_ingestor(store)
    lsh_dir = str(tmp_path / "lsh_idx")
    lsh_writer = lsh_index.make_lsh_batch_writer(lsh_dir)

    labels = spark.createDataFrame([], "node long, label long")
    accepted = []
    for b in range(_N_BATCHES):
        batch = d.filter(F.col("doc_id") % _N_BATCHES == b)
        # 1. novelty gate: only docs novel vs the fingerprint index
        ingest(batch, b)
        adm = (
            spark.read.parquet(corpus_ingest.accepted_batch_path(store.root, b))
            .select("doc_id", "text")
        )
        # 2. near-dup edges of the admitted docs: batch-vs-corpus
        # served FROM the stored band index (the corpus is never
        # re-banded), plus exact-verified intra-batch pairs
        edges = (
            _verified_pairs(adm, adm)
            .filter(F.col("batch_doc") < F.col("corpus_doc"))
            .select(
                F.col("batch_doc").alias("id_a"),
                F.col("corpus_doc").alias("id_b"),
            )
        )
        if accepted:
            corpus_texts = accepted[0]
            for a in accepted[1:]:
                corpus_texts = corpus_texts.union(a)
            cross = lsh_index.incremental_join_against_index(
                spark, lsh_dir, corpus_texts, adm
            ).select(
                F.col("batch_doc").alias("id_a"),
                F.col("corpus_doc").alias("id_b"),
            )
            edges = edges.union(cross)
        # 3. label maintenance from the batch's new edges only
        labels = components.incremental_labels(labels, edges, rounds=_ROUNDS)
        labels = labels.localCheckpoint()  # bound the per-batch lineage
        # 4. ONLY NOW does the batch enter the band index: batch b
        # must probe the index of batches < b
        lsh_writer(adm, b)
        accepted.append(adm)

    final = accepted[0]
    for a in accepted[1:]:
        final = final.union(a)
    final = final.localCheckpoint()
    n_final = final.count()
    # the gate did real work: some arrivals were rejected as near-dups
    assert 0 < n_final < d.count()

    # 5. the refreshed split from the maintained labels
    split_inc = dataprep.leakage_free_split(final, labels, "doc_id")

    # FROM-SCRATCH derivation over the final corpus: recomputed
    # verified edges, converged connected components, same split
    edges_full = (
        _verified_pairs(final, final)
        .filter(F.col("batch_doc") < F.col("corpus_doc"))
        .select(
            F.col("batch_doc").alias("id_a"), F.col("corpus_doc").alias("id_b")
        )
    )
    labels_full = components.connected_components(edges_full).select(
        F.col("node"), F.col("component").alias("label")
    )
    split_full = dataprep.leakage_free_split(final, labels_full, "doc_id")

    # the maintained label table IS the converged labeling ...
    inc = {r["node"]: r["label"] for r in labels.collect()}
    full = {r["node"]: r["label"] for r in labels_full.collect()}
    assert inc == full and len(inc) > 0
    # ... and the composed split equals the from-scratch split
    got = {r["doc_id"]: r["split"] for r in split_inc.collect()}
    want = {r["doc_id"]: r["split"] for r in split_full.collect()}
    assert got == want and len(got) == n_final

    # the leakage invariant holds on the composed path: no verified
    # near-dup edge straddles two splits
    sp = split_inc.select("doc_id", "split")
    straddle = (
        edges_full.join(
            sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0

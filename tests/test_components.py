"""Connected-components (dedup clustering) unit tests: planted
topologies with known closures, plus stratified-sample invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dataprep
from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.components import (
    cluster_stats,
    connected_components,
)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components_min_label(spark):
    # chain 1-2-3 and pair 10-11: min id wins per component
    got = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_past_one_hop(spark):
    # a path graph needs O(diameter) rounds — exercises the loop, not
    # just the first propagation
    n = 12
    got = _labels(spark, [(i, i + 1) for i in range(1, n)])
    assert set(got.values()) == {1} and len(got) == n


def test_bridge_merges_cliques(spark):
    cliq = lambda ids: [(a, b) for a in ids for b in ids if a < b]
    edges = cliq([1, 2, 3]) + cliq([7, 8, 9]) + [(3, 7)]
    got = _labels(spark, edges)
    assert set(got.values()) == {1}


def test_cluster_stats_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    stats = {
        r["component"]: r["n_members"]
        for r in cluster_stats(connected_components(df)).collect()
    }
    assert stats == {1: 3, 10: 2}


def test_stratified_sample_deterministic_and_bounded(spark):
    rows = [(i, "en" if i % 2 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {"en": 0.25, "zh": 1.0}
    a = dataprep.stratified_sample(df, "doc_id", "lang", fr)
    b = dataprep.stratified_sample(df, "doc_id", "lang", fr)
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())  # reproducible
    kept = a.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    by = {r["lang"]: r["n"] for r in kept}
    assert by["zh"] == 1000  # fraction >= 1 keeps everything
    assert 150 <= by["en"] <= 350  # ~25% of 1000, md5-uniform


def test_stratified_sample_drops_unlisted_strata(spark):
    df = spark.createDataFrame([(1, "en"), (2, "xx")], "doc_id long, lang string")
    out = dataprep.stratified_sample(df, "doc_id", "lang", {"en": 1.0})
    assert [r["lang"] for r in out.collect()] == ["en"]


def test_long_path_converges_via_pointer_jumping(spark):
    # a 300-node path has diameter 299: plain min-label propagation
    # needs ~300 rounds, far past max_iter=25 — the adaptive
    # pointer-jump regime must close it in O(log d) rounds, and every
    # node must still land on the path's minimum id
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    )
    got = connected_components(edges).collect()
    assert len(got) == 300
    assert {r["component"] for r in got} == {0}


def test_simhash_novel_flags_corpus_near_dups(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, "existing corpus document about spark plans")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base),  # exact re-crawl of corpus doc 1 -> not novel
            (11, "entirely new content discussing morton curves extensively"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["is_novel"] for r in
           dedupe.simhash_novel(corpus, batch, "doc_id", "text").collect()}
    assert out == {10: False, 11: True}


def test_simhash_novel_rejects_bad_knobs(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="bands must divide"):
        dedupe.simhash_novel(d, d, "doc_id", "text", bits=64, bands=5)
    with _pt.raises(ValueError, match="only exact"):
        dedupe.simhash_novel(d, d, "doc_id", "text", bands=4, max_hamming=4)


def test_triangle_counts_planted(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.components import triangle_counts

    # triangle {1,2,3} + square {10,11,12,13} without diagonals + a
    # dangling edge; edges given in MIXED orientation with a duplicate
    edges = spark.createDataFrame(
        [
            (1, 2), (3, 2), (1, 3), (2, 1),      # triangle (dup + reversed)
            (10, 11), (11, 12), (12, 13), (10, 13),  # square: no triangle
            (20, 21),
        ],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}, "square and dangling edge emit nothing"


def test_triangle_counts_shared_edge(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.components import triangle_counts

    # two triangles sharing edge (1,2): nodes 1,2 sit in both
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "id_a long, id_b long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_degree_cap_bounds_hub_and_stays_exact_below(spark):
    """The hub guard: a deg ~ n false-positive hub makes unguarded
    enumeration quadratic.  With max_degree the hub keeps only its
    cap lowest-md5 out-edges (deterministic), bounding join volume to
    cap x |E|; nodes at or under the cap are byte-identical to the
    exact path."""
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.components import triangle_counts

    n_leaves, cap = 200, 8
    # hub 0 -> leaves 1..200 (star: no triangles), plus one planted
    # triangle among high ids that no cap can disturb
    hub = [(0, i) for i in range(1, n_leaves + 1)]
    tri = [(1001, 1002), (1002, 1003), (1001, 1003)]
    edges = spark.createDataFrame(hub + tri, "id_a long, id_b long")

    capped = triangle_counts(edges, max_degree=cap)
    got = {r["node"]: r["n_triangles"] for r in capped.collect()}
    assert got == {1001: 1, 1002: 1, 1003: 1}

    # the capped ordered-edge frame never exceeds cap per node: replay
    # the guard's own sampling and check the bound it enforces
    from pyspark.sql.window import Window

    e = (
        edges.select(
            F.least("id_a", "id_b").alias("u"),
            F.greatest("id_a", "id_b").alias("v"),
        )
        .distinct()
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("u").orderBy(
                    F.md5(
                        F.concat_ws(
                            "\x1f",
                            F.col("u").cast("string"),
                            F.col("v").cast("string"),
                        )
                    )
                )
            ),
        )
        .filter(F.col("__rn") <= cap)
    )
    assert e.groupBy("u").count().agg(F.max("count")).collect()[0][0] <= cap
    # determinism: two runs sample the identical edge subset
    s1 = sorted(map(tuple, e.select("u", "v").collect()))
    s2 = sorted(map(tuple, e.select("u", "v").collect()))
    assert s1 == s2

    # below-cap graphs are byte-identical to the exact path
    exact = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(edges).collect()
    }
    big_cap = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(edges, max_degree=1000).collect()
    }
    assert big_cap == exact


def test_incremental_labels_merge_and_join(spark):
    """Incremental maintenance semantics on a hand graph: a new doc
    joins its cluster in one hop, and a batch doc BRIDGING two
    existing clusters merges them to the global min label."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import components

    # existing state: two clusters {1,2,3} (rep 1) and {10,11} (rep 10)
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "node long, label long"
    )
    # batch: doc 100 joins cluster 1; doc 200 bridges both clusters
    new_edges = spark.createDataFrame(
        [(100, 2), (200, 3), (200, 11)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["label"]
        for r in components.incremental_labels(labels, new_edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 100: 1, 200: 1, 10: 1, 11: 1}


def test_incremental_labels_equals_converged_cc(spark):
    """On the benchmark fixture, folding the batch's edges into the
    corpus labels partitions the nodes EXACTLY as converged connected
    components over the full accumulated graph — the star collapse
    loses nothing."""
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import components, dedupe
    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    batch = d.filter(F.col("doc_id") % 17 == 0)
    cb = dedupe.minhash_bands(corpus, "doc_id", "text")
    bb = dedupe.minhash_bands(batch, "doc_id", "text")
    labels = components.label_propagation_min(
        dedupe.near_dup_candidates(cb, "doc_id")
    )
    cross = (
        cb.alias("c")
        .join(
            bb.alias("b"),
            (F.col("c.band_id") == F.col("b.band_id"))
            & (F.col("c.band_hash") == F.col("b.band_hash")),
        )
        .select(F.col("b.doc_id").alias("id_a"), F.col("c.doc_id").alias("id_b"))
        .distinct()
    )
    new_edges = cross.union(dedupe.near_dup_candidates(bb, "doc_id"))
    inc = {
        r["node"]: r["label"]
        for r in components.incremental_labels(labels, new_edges).collect()
    }
    # ground truth: converged CC over the FULL accumulated edge set
    corpus_edges = dedupe.near_dup_candidates(cb, "doc_id")
    full = {
        r["node"]: r["component"]
        for r in components.connected_components(
            corpus_edges.union(new_edges)
        ).collect()
    }
    assert set(inc) == set(full) and len(inc) > 0
    assert inc == full


def test_incremental_labels_keeps_unreferenced_selflabel_nodes(spark):
    """A NON-converged input label table can hold a node whose label
    equals itself yet is referenced by no other node — its star edge
    is a self-loop, which the propagation primitive drops.  The
    maintenance operator must still return a row for it (coalesced to
    its old label): silently dropping a previously-labeled node would
    make a downstream leakage-free split fall back to a per-doc split
    for that doc, permanently."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import components

    # one bounded round over edges 1-5, 2-5 yields (1,1),(5,1),(2,2):
    # node 2 still self-labels while 5 already reached 1
    labels = spark.createDataFrame(
        [(1, 1), (5, 1), (2, 2)], "node long, label long"
    )
    # a batch that never touches node 2
    new_edges = spark.createDataFrame(
        [(100, 1)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["label"]
        for r in components.incremental_labels(labels, new_edges).collect()
    }
    # node 2 keeps its best-known label instead of vanishing
    assert got[2] == 2
    assert got == {1: 1, 5: 1, 100: 1, 2: 2}

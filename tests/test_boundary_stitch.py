"""Crawl-shard boundary stitches: the anchor identity must surface
every suffix/prefix overlap >= min_overlap with its exact MAXIMAL
length, reject non-boundary repeats, and honor the boilerplate cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe


def _pairs(df):
    return {
        (r["left_doc"], r["right_doc"]): r["overlap_tokens"]
        for r in df.collect()
    }


def test_planted_stitches_exact_and_directed(spark):
    ov = [f"o{i}" for i in range(10)]  # the carried 10-token overlap
    docs = spark.createDataFrame(
        [
            # record 1's suffix == record 2's prefix (the stitch)
            (1, " ".join([f"a{i}" for i in range(8)] + ov)),
            (2, " ".join(ov + [f"b{i}" for i in range(8)])),
            # the same overlap sits MID-document here: no boundary
            # stitch in either direction with doc 3
            (3, " ".join(["c0", "c1"] + ov + ["c2", "c3", "c4", "c5"])),
            (4, " ".join(f"d{i}" for i in range(12))),
        ],
        "doc_id long, text string",
    )
    got = _pairs(
        dedupe.boundary_stitch_pairs(docs, "doc_id", "text", k=4, min_overlap=8)
    )
    # directed: (1, 2) only — never (2, 1); doc 3's interior copy of
    # the run is not a boundary on either side
    assert got == {(1, 2): 10}


def test_maximal_overlap_on_periodic_text(spark):
    # suffix 'x x x x x x x x' vs prefix 'x x x x x x x x': several
    # anchors verify; the reported overlap must be the MAXIMUM (8)
    docs = spark.createDataFrame(
        [
            (1, " ".join(["a0", "a1"] + ["x"] * 8)),
            (2, " ".join(["x"] * 8 + ["b0", "b1"])),
        ],
        "doc_id long, text string",
    )
    got = _pairs(
        dedupe.boundary_stitch_pairs(docs, "doc_id", "text", k=4, min_overlap=4)
    )
    assert got[(1, 2)] == 8
    # the reverse direction also stitches on periodic text (suffix of
    # 2 is 'b0 b1'... no: doc 2 ends in b0 b1 — no x suffix), so no
    # (2, 1) row
    assert (2, 1) not in got


def test_containment_and_too_long_suffix(spark):
    full = [f"t{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            # B is exactly A's suffix: containment, reported with m = n_B
            (1, " ".join(["a0", "a1"] + full)),
            (2, " ".join(full)),
            # C starts with only HALF the suffix run: m would exceed
            # n_C for the deep anchors and must be rejected there but
            # the 4-token true prefix is below min_overlap=8 -> no row
            (3, " ".join(full[:4])),
        ],
        "doc_id long, text string",
    )
    got = _pairs(
        dedupe.boundary_stitch_pairs(docs, "doc_id", "text", k=4, min_overlap=8)
    )
    assert got == {(1, 2): 8}


def test_max_df_boilerplate_escape_and_guard(spark):
    # every doc opens with the same 8 tokens and ends with them too:
    # all 20 ordered pairs stitch; the cap on the ubiquitous anchor
    # gram removes them from candidate generation
    shared = [f"s{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(shared + [f"u{i}_{j}" for j in range(4)] + shared))
            for i in range(5)
        ],
        "doc_id long, text string",
    )
    full = dedupe.boundary_stitch_pairs(docs, "doc_id", "text", k=4, min_overlap=8)
    assert full.count() == 20
    capped = dedupe.boundary_stitch_pairs(
        docs, "doc_id", "text", k=4, min_overlap=8, max_df=3
    )
    assert capped.count() == 0
    with pytest.raises(ValueError, match="below the anchor gram"):
        dedupe.boundary_stitch_pairs(docs, "doc_id", "text", k=4, min_overlap=3)


def test_stitch_merge_reconstructs_the_page(spark):
    ov = [f"o{i}" for i in range(10)]
    left_rest = [f"a{i}" for i in range(8)]
    right_rest = [f"b{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(left_rest + ov)),
            (2, " ".join(ov + right_rest)),
            (4, " ".join(f"d{i}" for i in range(12))),
        ],
        "doc_id long, text string",
    )
    rows = dedupe.stitch_merge(docs, "doc_id", "text", k=4, min_overlap=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["left_doc"], r["right_doc"], r["overlap_tokens"]) == (1, 2, 10)
    # the merge drops the overlap exactly once: the logical page
    assert r["merged_text"] == " ".join(left_rest + ov + right_rest)


def test_stitch_merge_skips_ambiguous_and_handles_containment(spark):
    ov = [f"o{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            # two different left records both stitch onto doc 3:
            # ambiguous on the right side -> neither merges
            (1, " ".join([f"a{i}" for i in range(6)] + ov)),
            (2, " ".join([f"b{i}" for i in range(6)] + ov)),
            (3, " ".join(ov + [f"c{i}" for i in range(6)])),
            # containment: doc 5 is exactly doc 4's suffix -> merged
            # text is doc 4 itself (overlap = all of doc 5)
            (4, " ".join([f"x{i}" for i in range(4)] + [f"y{i}" for i in range(8)])),
            (5, " ".join(f"y{i}" for i in range(8))),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["left_doc"], r["right_doc"]): (r["overlap_tokens"], r["merged_text"])
        for r in dedupe.stitch_merge(docs, "doc_id", "text", k=4, min_overlap=8).collect()
    }
    assert set(got) == {(4, 5)}
    m, text = got[(4, 5)]
    assert m == 8
    assert text == " ".join([f"x{i}" for i in range(4)] + [f"y{i}" for i in range(8)])


def test_stitch_merge_excludes_chain_middles(spark):
    # A -> B -> C: each stitch is pairwise-unambiguous, but B is on
    # BOTH sides — pairwise merges would duplicate B's tokens across
    # two pages, so the chain guard excludes every stitch touching B.
    ov1 = [f"p{i}" for i in range(8)]
    ov2 = [f"q{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            (1, " ".join([f"a{i}" for i in range(6)] + ov1)),
            (2, " ".join(ov1 + [f"b{i}" for i in range(6)] + ov2)),
            (3, " ".join(ov2 + [f"c{i}" for i in range(6)])),
            # an independent clean pair must still merge alongside
            (8, " ".join([f"u{i}" for i in range(6)] + [f"w{i}" for i in range(8)])),
            (9, " ".join([f"w{i}" for i in range(8)] + [f"v{i}" for i in range(6)])),
        ],
        "doc_id long, text string",
    )
    # the stitches themselves are all named...
    st = _pairs(dedupe.boundary_stitch_pairs(docs, "doc_id", "text", k=4, min_overlap=8))
    assert set(st) == {(1, 2), (2, 3), (8, 9)}
    # ...but only the chain-free pair merges
    got = {
        (r["left_doc"], r["right_doc"])
        for r in dedupe.stitch_merge(docs, "doc_id", "text", k=4, min_overlap=8).collect()
    }
    assert got == {(8, 9)}


def test_anchor_join_auto_routes_on_doc_count(spark):
    """r13 review: the anchor broadcast is size-dispatched, not a
    manual flag — below ANCHOR_BROADCAST_MAX_DOCS the anchor probe is
    a BroadcastHashJoin, above it the initial plan holds no broadcast
    hint (shuffled probe), and both routes name identical stitches."""
    ov = [f"o{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [
            (1, " ".join([f"a{i}" for i in range(8)] + ov)),
            (2, " ".join(ov + [f"b{i}" for i in range(8)])),
            (4, " ".join(f"d{i}" for i in range(12))),
        ],
        "doc_id long, text string",
    )
    small = dedupe.boundary_stitch_pairs(
        docs, "doc_id", "text", k=4, min_overlap=8, approx_docs=3
    )
    p_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p_small
    big = dedupe.boundary_stitch_pairs(
        docs, "doc_id", "text", k=4, min_overlap=8,
        approx_docs=dedupe.ANCHOR_BROADCAST_MAX_DOCS + 1,
    )
    # initial (pre-AQE) plan: the hint is absent, so the anchor probe
    # plans as a shuffled join — AQE may still localize it at runtime
    # on toy data, which is exactly the desired behavior
    p_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in p_big
    assert _pairs(small) == _pairs(big) == {(1, 2): 10}

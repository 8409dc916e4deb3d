

def test_cluster_keepers_quality_and_ties(spark):
    """Keeper = max quality, lowest id on ties; singleton clusters kept;
    member counts exact."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7), (5, 5)],
        "node long, label long",
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 4), (9, 4), (5, 2)],
        "doc_id long, q long",
    )
    got = {
        r["label"]: (r["keeper_doc"], r["keeper_quality"], r["n_members"])
        for r in dedupe.cluster_keepers(labels, docs, "doc_id", "q").collect()
    }
    # label 1: quality tie 30/30 between docs 2 and 3 -> lowest id 2
    # label 7: tie 4/4 between 7 and 9 -> 7; label 5: singleton
    assert got == {1: (2, 30, 3), 7: (7, 4, 2), 5: (5, 2, 1)}


def test_prefix_jaccard_max_df_identical_on_normal_corpus(spark):
    """With a cap no prefix shingle reaches, the output is IDENTICAL —
    the completeness witness (the globally-rarest shared shingle)
    survives the cap by definition on a diverse corpus."""
    from tests.conftest import SF_SMOKE

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(200)
    base = sorted(
        map(
            tuple,
            dedupe.prefix_jaccard_join(
                docs, "doc_id", "text", t_num=4, t_den=5
            ).collect(),
        )
    )
    stats = {}
    capped = sorted(
        map(
            tuple,
            dedupe.prefix_jaccard_join(
                docs, "doc_id", "text", t_num=4, t_den=5,
                max_df=10**6, stats=stats,
            ).collect(),
        )
    )
    assert capped == base
    assert stats["n_prefix_rows"] > 0


def test_prefix_jaccard_max_df_bounds_adversarial_candidates(spark):
    """Boilerplate-degenerate corpus: every doc = the SAME long
    boilerplate plus a small unique tail, so every prefix still
    carries corpus-wide shingles and the uncapped candidate set is the
    full n^2/2 cross of the boilerplate postings.  The cap drops those
    postings from candidate generation — bounded volume — while pairs
    that share surviving rare shingles still verify EXACTLY."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    boiler = " ".join(f"tok{i}" for i in range(40))
    # 60 docs: unique 8-token tails -> no pair qualifies at t=0.8,
    # but every doc's prefix is pure boilerplate (df=60 shingles)
    rows = [
        (i, boiler + " " + " ".join(f"u{i}x{j}" for j in range(8)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped, capped = {}, {}
    out_un = dedupe.prefix_jaccard_join(
        docs, "doc_id", "text", t_num=4, t_den=5, stats=uncapped
    ).collect()
    out_cap = dedupe.prefix_jaccard_join(
        docs, "doc_id", "text", t_num=4, t_den=5, max_df=5, stats=capped
    ).collect()
    # uncapped: the boilerplate postings generate the full pair cross
    assert uncapped["n_candidates"] == 60 * 59 // 2
    # capped: boilerplate shingles (df=60 > 5) fall out of candidate
    # generation entirely; only the disjoint unique tails remain
    assert capped["n_candidates"] == 0 and capped["n_prefix_rows"] > 0
    # ground truth: no pair qualifies, and the capped run agrees with
    # the uncapped one here (nothing to lose - tails are disjoint)
    assert out_un == [] and out_cap == []


def test_prefix_jaccard_max_df_recall_semantics_exact(spark):
    """The cap's documented trade, pinned precisely: a qualifying pair
    that shares a BELOW-cap shingle is still found with the exact same
    integer intersection/union (precision 1.0 — verification runs on
    full sets); a qualifying pair whose every shared shingle is
    above-cap is the one and only thing lost."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    boiler = " ".join(f"tok{i}" for i in range(30))
    twin = boiler + " rare marker words here now"
    rows = [(1, twin), (2, twin + " extra"), (3, boiler + " other tail words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(max_df=None):
        return {
            (r["doc_a"], r["doc_b"]): (r["inter_size"], r["union_size"])
            for r in dedupe.prefix_jaccard_join(
                docs, "doc_id", "text", t_num=1, t_den=2, max_df=max_df
            ).collect()
        }

    base, capped = pairs(), pairs(max_df=2)
    # uncapped finds all three pairs (they all share the boilerplate)
    assert set(base) == {(1, 2), (1, 3), (2, 3)}
    # (1,2) share rare "marker" shingles (df=2 <= cap): kept, with
    # bit-identical exact stats
    assert capped[(1, 2)] == base[(1, 2)]
    # (1,3)/(2,3) share ONLY above-cap boilerplate shingles: the
    # documented recall loss — and nothing else changes
    assert set(capped) == {(1, 2)}


def test_lsh_incremental_join_finds_corpus_matches(spark):
    """Batch docs that exact/near-duplicate a corpus doc are matched
    (banded candidates + exact integer-thresholded verification);
    unrelated batch docs are not.  Pairs are directional:
    (batch_doc, corpus_doc)."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun today"
    )
    other = (
        "completely different text about spark shuffles partitions and "
        "broadcast joins running on large clusters with many executors"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, base),                                   # exact dup of 1
         (101, base.replace("afternoon", "evening")),   # near dup of 1
         (102, "an entirely novel document about watermarks state "
               "stores and exactly once semantics in streaming land")],
        "doc_id long, text string",
    )
    got = {
        (r["batch_doc"], r["corpus_doc"]): (r["inter_size"], r["jaccard"])
        for r in dedupe.lsh_incremental_join(
            corpus, batch, "doc_id", "text", t_num=7, t_den=10
        ).collect()
    }
    assert (100, 1) in got and got[(100, 1)][1] == 1.0
    assert (101, 1) in got and got[(101, 1)][1] < 1.0
    assert all(b != 102 for b, _ in got)


def test_tf_cosine_join_exact_integer_scores(spark):
    """Dot products and squared norms replay integer-exactly against a
    Python computation over unigram counts; the threshold filter is
    the cross-multiplied squared cosine."""
    from collections import Counter

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    rows = [
        (1, "a a b c"),
        (2, "a a a b b c c"),   # same direction-ish, heavier
        (3, "x y z"),           # disjoint
        (4, "a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["norm2_a"], r["norm2_b"])
        for r in dedupe.tf_cosine_join(
            docs, "doc_id", "text", term_n=1, t_num=1, t_den=100
        ).collect()
    }
    cnts = {i: Counter(t.split()) for i, t in rows}
    for (a, b), (dot, n2a, n2b) in got.items():
        ca, cb = cnts[a], cnts[b]
        assert dot == sum(ca[t] * cb[t] for t in ca)
        assert n2a == sum(v * v for v in ca.values())
        assert n2b == sum(v * v for v in cb.values())
    assert (1, 2) in got and (3, 4) not in got and all(3 not in p for p in got)
    # a tight threshold keeps only the aligned pair
    tight = {
        (r["doc_a"], r["doc_b"])
        for r in dedupe.tf_cosine_join(
            docs, "doc_id", "text", term_n=1, t_num=95, t_den=100
        ).collect()
    }
    assert (1, 2) in tight and (1, 4) not in tight


def test_tf_cosine_join_max_df_candidate_cap(spark):
    """The q133-style escape on the TF join: above-cap terms fall out
    of candidate generation only; surviving pairs keep exact scores
    computed over ALL shared terms."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    # 'common' appears in every doc; 'rare*' links only 1-2
    rows = [
        (1, "common rare1 rare1 alpha"),
        (2, "common rare1 rare1 alpha"),
        (3, "common beta gamma delta"),
        (4, "common beta2 gamma2 delta2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["cosine"])
        for r in dedupe.tf_cosine_join(
            docs, "doc_id", "text", term_n=1, t_num=9, t_den=10
        ).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["cosine"])
        for r in dedupe.tf_cosine_join(
            docs, "doc_id", "text", term_n=1, t_num=9, t_den=10, max_df=2
        ).collect()
    }
    # (1,2) share rare terms: kept under the cap with the IDENTICAL
    # exact dot (which still counts the above-cap 'common' term)
    assert capped[(1, 2)] == base[(1, 2)] and base[(1, 2)][1] == 1.0
    # any qualifying pair sharing ONLY 'common' is the documented
    # recall loss under the cap
    assert all(p == (1, 2) for p in capped)


def test_repeated_span_pairs_exact_boundaries(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    # one 20-token span planted at token 5 of doc 0 and token 3 of
    # doc 1; all surrounding tokens are doc-unique, so the maximal
    # run is exactly the planted span with exact 1-based offsets
    span = [f"s{i}" for i in range(20)]
    d0 = " ".join([f"a{i}" for i in range(4)] + span + ["z1", "z2"])
    d1 = " ".join(["b1", "b2"] + span + ["c1"])
    frame = spark.createDataFrame([(0, d0), (1, d1)], "doc_id int, text string")
    rows = dedupe.repeated_span_pairs(frame, "doc_id", "text", k=8, w=9).collect()
    assert [
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_tokens"])
        for r in rows
    ] == [(0, 1, 5, 3, 20)]


def test_repeated_span_pairs_threshold_and_guard(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    import pytest as _pt

    # a 15-token shared span sits below min_span = w + k - 1 = 16:
    # no qualifying output even though stage 1 may surface the pair
    span = [f"t{i}" for i in range(15)]
    frame = spark.createDataFrame(
        [
            (0, " ".join([f"a{i}" for i in range(4)] + span)),
            (1, " ".join(span + [f"b{i}" for i in range(4)])),
        ],
        "doc_id int, text string",
    )
    assert dedupe.repeated_span_pairs(frame, "doc_id", "text", k=8, w=9).count() == 0
    # requesting spans below the winnowing guarantee must raise, not
    # silently under-report
    with _pt.raises(ValueError):
        dedupe.repeated_span_pairs(frame, "doc_id", "text", k=8, w=9, min_span=10)


def test_repeated_span_pairs_two_occurrences_two_diagonals(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    # doc 1 contains the span TWICE: each occurrence is its own
    # diagonal, so two maximal runs are reported for the pair
    span = [f"u{i}" for i in range(16)]
    d0 = " ".join(span + ["q1", "q2"])
    d1 = " ".join(span + [f"m{i}" for i in range(3)] + span)
    frame = spark.createDataFrame([(0, d0), (1, d1)], "doc_id int, text string")
    rows = sorted(
        (r["start_a"], r["start_b"], r["span_tokens"])
        for r in dedupe.repeated_span_pairs(frame, "doc_id", "text", k=8, w=9).collect()
    )
    assert rows == [(1, 1, 16), (1, 20, 16)]


def test_repeated_span_pairs_max_df_semantics(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    # boilerplate-heavy adversarial corpus: every doc opens with the
    # same 20-token block (a real >= 16-token shared span between
    # EVERY pair — the true answer is quadratic) + a unique tail
    boiler = [f"b{i}" for i in range(20)]
    rows = [
        (i, " ".join(boiler + [f"u{i}_{j}" for j in range(10)]))
        for i in range(40)
    ]
    frame = spark.createDataFrame(rows, "doc_id int, text string")
    uncapped = dedupe.repeated_span_pairs(frame, "doc_id", "text", k=8, w=9)
    assert uncapped.count() == 40 * 39 // 2  # every pair, one span each
    # max_df drops the ubiquitous boilerplate fingerprints from
    # candidate generation: the quadratic pair set is pruned away
    # (stated recall trade — those spans are boilerplate, the thing
    # the cap exists to ignore)
    capped = dedupe.repeated_span_pairs(
        frame, "doc_id", "text", k=8, w=9, max_df=8
    )
    assert capped.count() == 0
    # and on a corpus with no above-cap fingerprint the cap is inert
    distinct_rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(25))) for i in range(30)
    ]
    d2 = spark.createDataFrame(distinct_rows, "doc_id int, text string")
    a = sorted(map(tuple, dedupe.repeated_span_pairs(d2, "doc_id", "text", k=8, w=9).collect()))
    b = sorted(map(tuple, dedupe.repeated_span_pairs(d2, "doc_id", "text", k=8, w=9, max_df=10**6).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# content-defined chunking (q183)
# ---------------------------------------------------------------------------


def test_cdc_chunks_partition_document_exactly(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    # chunks concatenated in chunk_idx order must reconstruct the
    # tokenized document — CDC is a partition, not a sample
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(200))) for i in range(5)]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    ch = dedupe.cdc_chunks(d, "doc_id", "text", w=4, boundary_mod=8)
    got = {
        r.doc_id: " ".join(
            c for _, c in sorted((x.chunk_idx, x.chunk_text) for x in grp)
        )
        for r in ch.select("doc_id").distinct().collect()
        for grp in [[x for x in ch.collect() if x.doc_id == r.doc_id]]
    }
    for i, text in rows:
        assert got[i] == text


def test_cdc_chunks_shift_robust(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    # the CDC property: prepending tokens changes only the chunks up
    # to the first surviving boundary — the tail chunk hashes
    # re-align (a fixed-size chunker would shift every chunk)
    base = " ".join(f"tok{j}" for j in range(400))
    d = spark.createDataFrame(
        [(1, base), (2, "INSERTED HEAD " + base)], "doc_id int, text string"
    )
    ch = dedupe.cdc_chunks(d, "doc_id", "text", w=4, boundary_mod=8)
    hashes = {
        i: {r.chunk_hash for r in ch.filter(ch.doc_id == i).collect()}
        for i in (1, 2)
    }
    shared = hashes[1] & hashes[2]
    # everything after the first boundary following the edit is
    # identical; with ~50 chunks the overlap must be nearly total
    assert len(shared) >= len(hashes[1]) - 2
    assert len(shared) >= 1


def test_cdc_chunks_edge_docs(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    # empty docs vanish; docs shorter than the gram window are one
    # chunk equal to the whole document
    d = spark.createDataFrame(
        [(1, ""), (2, "a b"), (3, "   ")], "doc_id int, text string"
    )
    ch = dedupe.cdc_chunks(d, "doc_id", "text", w=4, boundary_mod=8)
    rows = {(r.doc_id, r.chunk_idx): r.chunk_text for r in ch.collect()}
    assert rows == {(2, 0): "a b"}


def test_cdc_dup_chunks_counts_copies_and_docs(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    shared = " ".join(f"s{j}" for j in range(120))
    rows = [
        (1, shared),
        (2, "PFX " + shared),          # same shared tail, shifted
        (3, " ".join(f"u{j}" for j in range(60))),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    dup = dedupe.cdc_dup_chunks(d, "doc_id", "text", w=4, boundary_mod=8)
    got = {r.chunk_hash: (r.n_copies, r.n_docs) for r in dup.collect()}
    assert got  # the re-aligned shared chunks are found
    assert all(v == (2, 2) for v in got.values())

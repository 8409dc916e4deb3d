"""Unit tests for the round-13 wave-2 operators (q153+) — oracle
parity is covered by test_oracle_parity / test_gate_scale_parity;
these pin the operator-level invariants the oracles can't express."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import (
    components,
    dataprep,
    profiling,
    reconcile,
    tokenizer,
)


# ---------------------------------------------------------------------------
# profiling (q153)
# ---------------------------------------------------------------------------


def _report_map(df):
    return {
        (r.tbl, r.col, r.chk): (r.value, r.ok) for r in df.collect()
    }


def test_profile_report_flags_violations(spark):
    d = spark.createDataFrame(
        [
            Row(k=1, v=10.0, s="A"),
            Row(k=2, v=None, s="B"),
            Row(k=2, v=-1.0, s="Z"),  # dup key, negative value, bad domain
        ]
    )
    rep = profiling.profile_report(
        d,
        "t",
        complete_cols=["v"],
        unique_cols=["k"],
        compliance=[("s", "domain", F.col("s").isin("A", "B"))],
    )
    m = _report_map(rep)
    assert m[("t", "*", "row_count")] == (3, True)
    # 2 of 3 non-null, in integer ppm: floor(2e6 / 3)
    assert m[("t", "v", "completeness")] == (666666, False)
    # 2 distinct of 3
    assert m[("t", "k", "uniqueness")] == (666666, False)
    assert m[("t", "s", "domain")] == (666666, False)


def test_profile_report_null_predicate_is_noncompliant(spark):
    d = spark.createDataFrame([Row(x=1.0), Row(x=None)])
    rep = profiling.profile_report(
        d, "t", compliance=[("x", "positive", F.col("x") > 0)]
    )
    m = _report_map(rep)
    # NULL can't prove compliance -> counts against the fraction
    assert m[("t", "x", "positive")] == (500000, False)


def test_profile_report_single_job(spark):
    """All intra-table checks ride ONE aggregate: the plan contains
    exactly one scan of the input."""
    d = spark.createDataFrame([Row(k=1, v=2.0)])
    rep = profiling.profile_report(
        d,
        "t",
        complete_cols=["v"],
        unique_cols=["k"],
        compliance=[("v", "positive", F.col("v") > 0)],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") == 1


def test_fk_containment_counts_orphans(spark):
    child = spark.createDataFrame([Row(fk=1), Row(fk=2), Row(fk=9)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    rep = profiling.fk_containment_report(child, "c", "fk", parent, "pk")
    m = _report_map(rep)
    assert m[("c", "fk", "fk_containment")] == (1, False)


# ---------------------------------------------------------------------------
# reconcile (q155)
# ---------------------------------------------------------------------------


def _toy_snapshots(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),
            Row(k=2, a="y", b=2.0),
            Row(k=3, a=None, b=3.0),
            Row(k=4, a="w", b=4.0),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),     # unchanged
            Row(k=2, a="y2", b=2.0),    # changed: a
            Row(k=3, a=None, b=3.0),    # unchanged (NULL == NULL null-safely)
            Row(k=5, a="new", b=5.0),   # added (4 removed)
        ]
    )
    return old, new


def test_snapshot_diff_statuses(spark):
    old, new = _toy_snapshots(spark)
    diff = reconcile.snapshot_diff(old, new, ["k"], ["a", "b"])
    got = {r.k: r.status for r in diff.collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "removed",
        5: "added",
    }


def test_snapshot_diff_null_transitions(spark):
    old = spark.createDataFrame([Row(k=1, a=None), Row(k=2, a="v")])
    new = spark.createDataFrame([Row(k=1, a="v"), Row(k=2, a=None)])
    diff = reconcile.snapshot_diff(old, new, ["k"], ["a"])
    got = {r.k: (r.status, r.chg_a) for r in diff.collect()}
    # NULL -> value and value -> NULL are both changes
    assert got == {1: ("changed", True), 2: ("changed", True)}


def test_diff_summary_counts(spark):
    old, new = _toy_snapshots(spark)
    diff = reconcile.snapshot_diff(old, new, ["k"], ["a", "b"])
    summ = {r.metric: r.n for r in reconcile.diff_summary(diff, ["a", "b"]).collect()}
    assert summ == {
        "added": 1,
        "removed": 1,
        "changed": 1,
        "unchanged": 2,
        "changed:a": 1,
        "changed:b": 0,
    }


def test_snapshot_diff_single_join(spark):
    old, new = _toy_snapshots(spark)
    diff = reconcile.snapshot_diff(old, new, ["k"], ["a", "b"])
    plan = diff._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join FullOuter") == 1


# ---------------------------------------------------------------------------
# tokenizer (q154)
# ---------------------------------------------------------------------------


def _bpe_steps(spark, docs, steps=1, top=5):
    df = spark.createDataFrame([Row(text=t) for t in docs])
    return tokenizer.bpe_train_steps(df, "text", steps=steps, top=top)


def test_bpe_pair_counting_overlap_convention(spark):
    # one word "aaa" x freq 2: classic get_stats counts (a,a) twice
    # per word occurrence
    out = _bpe_steps(spark, ["aaa aaa"], steps=1, top=5).collect()
    assert [(r.a, r.b, r.cnt, r.merged) for r in out] == [("a", "a", 4, True)]


def test_bpe_merge_is_greedy_left_to_right(spark):
    # after merging (a,a), "aaa" must become "aa a" (NOT "aa aa" or
    # "a aa"): step-2 counts then see the pair (aa, a)
    out = _bpe_steps(spark, ["aaa"], steps=2, top=5)
    step2 = sorted(
        [(r.a, r.b, r.cnt) for r in out.collect() if r.step == 2]
    )
    assert step2 == [("aa", "a", 1)]


def test_bpe_merged_symbols_never_false_suffix_match(spark):
    # merge (b,c) first; then the word "abc" holds symbols a|bc and
    # the word "bbc" holds b|bc.  A naive string replace of "b c"
    # would corrupt "bc"-suffixed symbols; the separator-bounded fold
    # must leave pair (a, bc) and (b, bc) distinct.
    docs = ["b c " * 10 + "abc bbc"]
    out = _bpe_steps(spark, docs, steps=2, top=10)
    step2 = {(r.a, r.b): r.cnt for r in out.collect() if r.step == 2}
    assert step2[("a", "bc")] == 1
    assert step2[("b", "bc")] == 1


def test_bpe_tiebreak_is_lexicographic(spark):
    # (a,b) and (c,d) both occur once; (a,b) must win the merge
    out = _bpe_steps(spark, ["ab cd"], steps=1, top=2).collect()
    winner = [(r.a, r.b) for r in out if r.merged]
    assert winner == [("a", "b")]


# ---------------------------------------------------------------------------
# weighted sampling (q156)
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_k(spark):
    d = spark.createDataFrame([Row(i=i, w=10 * (i % 5 + 1)) for i in range(200)])
    s1 = dataprep.weighted_minhash_sample(d, "i", "w", k=20, unit=4)
    s2 = dataprep.weighted_minhash_sample(d, "i", "w", k=20, unit=4)
    r1 = sorted(map(tuple, s1.collect()))
    r2 = sorted(map(tuple, s2.collect()))
    assert r1 == r2 and len(r1) == 20


def test_weighted_sample_weight_monotone_in_expectation(spark):
    # heavier rows draw more tickets -> the top-k should skew heavy:
    # with weights 1 vs 801 (1 vs 101 tickets at unit=8) the heavy
    # half must dominate any reasonable sample
    rows = [Row(i=i, w=1) for i in range(100)] + [
        Row(i=100 + i, w=801) for i in range(100)
    ]
    d = spark.createDataFrame(rows)
    s = dataprep.weighted_minhash_sample(d, "i", "w", k=30, unit=8)
    heavy = sum(1 for r in s.collect() if r.i >= 100)
    assert heavy >= 25


def test_weighted_sample_salt_changes_sample(spark):
    d = spark.createDataFrame([Row(i=i, w=16) for i in range(300)])
    a = {r.i for r in dataprep.weighted_minhash_sample(d, "i", "w", 20, salt="s1").collect()}
    b = {r.i for r in dataprep.weighted_minhash_sample(d, "i", "w", 20, salt="s2").collect()}
    assert a != b


# ---------------------------------------------------------------------------
# HITS (q157)
# ---------------------------------------------------------------------------


def test_hits_bipartite_star_graph(spark):
    # suppliers 1..3 all supply part 10; supplier 1 also supplies the
    # exclusive parts 11, 12 -> supplier 1 must be the top hub and
    # part 10 the top authority
    edges = spark.createDataFrame(
        [Row(s=1, p=10), Row(s=2, p=10), Row(s=3, p=10), Row(s=1, p=11), Row(s=1, p=12)]
    )
    out = components.hits_bipartite_fixed(edges, "s", "p", iterations=3)
    hubs = {r.id: r.score for r in out.collect() if r.side == "hub"}
    auths = {r.id: r.score for r in out.collect() if r.side == "auth"}
    assert max(hubs, key=hubs.get) == 1
    assert max(auths, key=auths.get) == 10
    assert hubs[2] == hubs[3]  # symmetric suppliers tie exactly


def test_hits_scores_l1_normalized(spark):
    edges = spark.createDataFrame(
        [Row(s=a, p=b) for a in range(4) for b in range(10, 14) if (a + b) % 3]
    )
    scale = 10**9
    out = components.hits_bipartite_fixed(edges, "s", "p", iterations=2, scale=scale)
    for side in ("hub", "auth"):
        tot = sum(r.score for r in out.collect() if r.side == side)
        # integer floors shave at most one unit per node
        n = sum(1 for r in out.collect() if r.side == side)
        assert scale - n <= tot <= scale


def test_hits_duplicate_edges_ignored(spark):
    e1 = spark.createDataFrame([Row(s=1, p=10), Row(s=2, p=11)])
    e2 = e1.union(e1).union(e1)  # triplicated edge list
    r1 = sorted(map(tuple, components.hits_bipartite_fixed(e1, "s", "p").collect()))
    r2 = sorted(map(tuple, components.hits_bipartite_fixed(e2, "s", "p").collect()))
    assert r1 == r2


def test_bpe_exhausted_vocab_survives_extra_steps(spark):
    # single-char words: step 1 has NO pairs, so there is no winner —
    # the vocab must survive the no-op merge (a cross join against the
    # empty winner frame would silently empty it) and later steps must
    # simply report nothing
    out = _bpe_steps(spark, ["a b a c"], steps=3, top=5)
    assert out.collect() == []
    df = spark.createDataFrame([Row(text="a b a c")])
    _steps, vocab = tokenizer.bpe_train_from_vocab(
        tokenizer.word_freqs(df, "text"), steps=3
    )
    got = sorted((r.word, r.freq, r.sym) for r in vocab.collect())
    assert got == [("a", 2, " a"), ("b", 1, " b"), ("c", 1, " c")]


def test_hits_requires_an_iteration(spark):
    import pytest

    edges = spark.createDataFrame([Row(s=1, p=10)])
    with pytest.raises(ValueError, match="iterations"):
        components.hits_bipartite_fixed(edges, "s", "p", iterations=0)


def test_snapshot_diff_keys_only(spark):
    old = spark.createDataFrame([Row(k=1), Row(k=2)])
    new = spark.createDataFrame([Row(k=2), Row(k=3)])
    diff = reconcile.snapshot_diff(old, new, ["k"], [])
    got = {r.k: r.status for r in diff.collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "added"}


def test_profile_report_fail_closed_on_empty_table(spark):
    d = spark.createDataFrame([], "k long, v double")
    rep = profiling.profile_report(
        d, "t", complete_cols=["v"], unique_cols=["k"],
        compliance=[("v", "positive", F.col("v") > 0)],
    )
    m = _report_map(rep)
    assert m[("t", "*", "row_count")] == (0, False)
    # fractions are undefined (NULL value) but ok must be FALSE, not
    # NULL — a check that can't prove itself has failed
    for key in (("t", "v", "completeness"), ("t", "k", "uniqueness"), ("t", "v", "positive")):
        value, ok = m[key]
        assert value is None and ok is False

"""Unit tests for the q118-q123 scale-technique operators (binary
Hamming search, JL projection, Bloom prefilter join, co-purchase
lift, count-min sketch, fixed-point PageRank) — oracle parity is
covered by test_oracle_parity / test_gate_scale_parity; these pin
the operator-level invariants the oracles can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import metrics
from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import bloom, components, cooccur, similarity

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# binary sign pack / Hamming
# ---------------------------------------------------------------------------


def test_binary_sign_pack_known_words(spark):
    # dims 0 and 33 positive -> bit 0 of word 0 and bit 1 of word 1
    vec = [0.0] * 64
    vec[0] = 1.0
    vec[33] = 2.5
    df = spark.createDataFrame([(1, vec)], "vec_id int, embedding array<double>")
    row = similarity.binary_sign_pack(df, dim=64).collect()[0]
    assert row["code"] == [1, 2]


def test_binary_sign_pack_zero_is_unset(spark):
    # strict > 0: zeros and negatives are 0 bits
    df = spark.createDataFrame(
        [(1, [0.0, -1.0] * 32)], "vec_id int, embedding array<double>"
    )
    row = similarity.binary_sign_pack(df, dim=64).collect()[0]
    assert row["code"] == [0, 0]


def test_binary_hamming_topk_identical_vector_distance_zero(spark):
    base = [float((i % 7) - 3) for i in range(64)]
    rows = [(0, base), (1, list(base)), (2, [-x if x else 1.0 for x in base])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = similarity.binary_hamming_topk(
        df.filter(F.col("vec_id") == 0), df, k=2
    ).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["neighbor_id"] == 1 and by_rank[1]["hamming"] == 0
    # the flipped vector differs on every non-zero sign bit
    assert by_rank[2]["neighbor_id"] == 2 and by_rank[2]["hamming"] > 0


def test_binary_hamming_topk_query_guard(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    try:
        similarity.binary_hamming_topk(e, e, max_queries=10)
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "broadcasts the query side" in str(exc)


# ---------------------------------------------------------------------------
# JL projection
# ---------------------------------------------------------------------------


def test_jl_sign_matrix_deterministic_and_pm1():
    m1 = similarity.jl_sign_matrix(64, 16)
    m2 = similarity.jl_sign_matrix(64, 16)
    assert m1 == m2
    assert {x for row in m1 for x in row} == {-1.0, 1.0}
    # a different seed is a different matrix
    assert similarity.jl_sign_matrix(64, 16, seed="other") != m1


def test_jl_project_zero_vector_null_ratio(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id int, embedding array<double>"
    )
    row = similarity.jl_project(df).collect()[0]
    assert row["norm_ratio"] is None
    assert row["p1"] == 0.0


def test_jl_project_norm_ratio_concentrates(spark):
    # E[|p|^2] = |v|^2 for +-1 JL: across the fixture the mean ratio
    # must sit near 1 (loose band — 500 vectors, 16 output dims)
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    mean_ratio = (
        similarity.jl_project(e)
        .agg(F.avg("norm_ratio").alias("m"))
        .collect()[0]["m"]
    )
    assert 0.8 < mean_ratio < 1.2


# ---------------------------------------------------------------------------
# Bloom prefilter join
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom.bloom_bitmap(keys, "k", m_bits=8192, n_hashes=3)
    assert len(words) == 128
    # probing the build keys through the operator keeps every one
    out = bloom.bloom_semi_join(keys, keys, "k", "k", m_bits=8192)
    assert out.count() == 500


def test_bloom_semi_join_equals_plain_semi_join(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    fast = bloom.bloom_semi_join(
        o, c.select("c_custkey"), "o_custkey", "c_custkey", m_bits=65536
    )
    plain = o.join(
        c.select(F.col("c_custkey").alias("k")),
        F.col("o_custkey") == F.col("k"),
        "left_semi",
    )
    assert fast.count() == plain.count()
    assert (
        fast.select("o_orderkey")
        .exceptAll(plain.select("o_orderkey"))
        .count()
        == 0
    )


def test_bloom_bitmap_rejects_unaligned_m():
    try:
        bloom.bloom_bitmap(None, "k", m_bits=100)
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "multiple of 64" in str(exc)


# ---------------------------------------------------------------------------
# co-purchase lift
# ---------------------------------------------------------------------------


def test_copurchase_lift_hand_computed(spark):
    # baskets: {a,b} x3, {a,c} x1  -> N=4, c_a=4, c_b=3, c_c=1,
    # c_ab=3, c_ac=1; lift(a,b) = 3*4/(4*3) = 1.0
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccur.copurchase_lift(df, "basket", "item").collect()
    }
    ab = out[("a", "b")]
    assert ab["c_ab"] == 3 and ab["c_a"] == 4 and ab["c_b"] == 3
    assert ab["lift"] == 1.0
    assert ("a", "c") not in out  # below min_support=2


def test_copurchase_lift_dedupes_and_caps(spark):
    # duplicate (basket, item) rows count once; a mega-basket is
    # capped to `cap` items so pair volume stays bounded
    rows = [(1, f"i{j}") for j in range(20)] + [(1, "i0"), (1, "i1")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = cooccur.copurchase_lift(df, "basket", "item", cap=4, min_support=1)
    # 4 capped items -> C(4,2) = 6 pairs
    assert out.count() == 6


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_countmin_never_underestimates(spark):
    toks = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .limit(5000)
    )
    toks = toks.localCheckpoint()
    counts = metrics.countmin_counts(toks, "tok")
    est = metrics.countmin_estimate(counts, toks.distinct(), "tok")
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    bad = est.join(exact, "tok").filter(F.col("cm_est") < F.col("n")).count()
    assert bad == 0  # one-sided error: estimates upper-bound truth


def test_countmin_counts_bounded_and_mergeable(spark):
    toks = spark.createDataFrame(
        [(f"t{i % 50}",) for i in range(1000)], "tok string"
    )
    whole = metrics.countmin_counts(toks, "tok", depth=4, width=64)
    assert whole.count() <= 4 * 64
    # linearity: counters of two halves sum to the whole's counters
    h1 = metrics.countmin_counts(toks.limit(500), "tok", depth=4, width=64)
    h2 = metrics.countmin_counts(
        toks.exceptAll(toks.limit(500)), "tok", depth=4, width=64
    )
    merged = (
        h1.union(h2).groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_countmin_unseen_item_probes_zero(spark):
    toks = spark.createDataFrame([("a",), ("b",)], "tok string")
    counts = metrics.countmin_counts(toks, "tok", depth=4, width=256)
    cand = spark.createDataFrame([("never-seen-token",)], "tok string")
    est = metrics.countmin_estimate(counts, cand, "tok", depth=4, width=256)
    # width 256 with 2 items: overwhelmingly likely all 4 probes miss
    assert est.collect()[0]["cm_est"] == 0


# ---------------------------------------------------------------------------
# fixed-point PageRank
# ---------------------------------------------------------------------------


def _replay_pagerank(edges, iterations=3, scale=10**12):
    """Pure-python replay of the integer fixed-point recurrence."""
    sym = {}
    for a, b in edges:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    n = len(sym)
    base = (3 * scale) // (20 * n)
    pr = {v: scale // n for v in sym}
    for _ in range(iterations):
        nxt = {}
        for v in sym:
            s = sum(pr[u] // len(sym[u]) for u in sym[v])
            nxt[v] = base + (17 * s) // 20
        pr = nxt
    return pr


def test_pagerank_matches_python_replay(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("e", "b")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {
        r["node"]: r["pr"]
        for r in components.pagerank_fixed(df).collect()
    }
    assert got == _replay_pagerank(edges)


def test_pagerank_symmetric_graph_equal_ranks(spark):
    # a triangle is vertex-transitive: all ranks identical
    df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("x", "z")], "id_a string, id_b string"
    )
    prs = {
        r["pr"] for r in components.pagerank_fixed(df).collect()
    }
    assert len(prs) == 1


def test_pagerank_hub_outranks_leaf(spark):
    # star: hub h with 4 leaves — h must outrank every leaf
    df = spark.createDataFrame(
        [("h", f"l{i}") for i in range(4)], "id_a string, id_b string"
    )
    got = {
        r["node"]: r["pr"]
        for r in components.pagerank_fixed(df).collect()
    }
    assert all(got["h"] > got[f"l{i}"] for i in range(4))


# ---------------------------------------------------------------------------
# Bloom prefilter: type canonicalization + plan-size guard (round 10)
# ---------------------------------------------------------------------------


def test_bloom_semi_join_mixed_integral_key_types(spark):
    # xxhash64 is type-sensitive: INT and BIGINT keys hash differently,
    # so without the common-type widening the prefilter would produce
    # FALSE NEGATIVES on equal values.  int fact keys vs long build keys
    # must still return exactly the plain semi join's rows.
    fact = spark.range(0, 200).select(F.col("id").cast("int").alias("fk"))
    keys = spark.range(0, 200, 3).select(F.col("id").alias("bk"))  # bigint
    out = bloom.bloom_semi_join(fact, keys, "fk", "bk", m_bits=8192)
    assert sorted(r["fk"] for r in out.collect()) == list(range(0, 200, 3))


def test_bloom_semi_join_rejects_non_integral_mismatch(spark):
    fact = spark.range(3).select(F.col("id").cast("string").alias("fk"))
    keys = spark.range(3).select(F.col("id").alias("bk"))
    try:
        bloom.bloom_semi_join(fact, keys, "fk", "bk")
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "common type" in str(exc)


def test_bloom_bitmap_rejects_oversized_m():
    try:
        bloom.bloom_bitmap(None, "k", m_bits=bloom.MAX_LITERAL_BITS * 2)
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "MAX_LITERAL_BITS" in str(exc)


def test_bloom_semi_join_autoroutes_above_literal_cap(spark):
    # above MAX_LITERAL_BITS the literal bitmap would bloat the plan:
    # the call must route to the plain semi join (same rows, and the
    # plan carries no xxhash64 probe expression at all)
    fact = spark.range(0, 100).select(F.col("id").alias("fk"))
    keys = spark.range(0, 100, 7).select(F.col("id").alias("bk"))
    out = bloom.bloom_semi_join(
        fact, keys, "fk", "bk", m_bits=bloom.MAX_LITERAL_BITS * 4
    )
    assert sorted(r["fk"] for r in out.collect()) == list(range(0, 100, 7))
    assert "xxhash64" not in out._jdf.queryExecution().executedPlan().toString()

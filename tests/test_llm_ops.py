"""Semantic tests for the LLM-pipeline operators on planted cases:
real near-duplicates must be found, unrelated docs must not."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import (
    dedupe,
    multimodal,
    similarity,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun and nothing else moves"
)
NEAR = BASE.replace("afternoon", "evening")  # one-token edit
OTHER = (
    "completely different text about spark shuffles partitions and "
    "broadcast joins running on large clusters with many executors today"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)],
        "doc_id long, text string",
    )


def test_exact_dedupe_keeps_first(spark, docs):
    kept = dedupe.keep_first_exact(docs, "doc_id", "text")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2, 3], "doc 4 is an exact copy of doc 1"


def test_minhash_lsh_finds_near_dups(spark, docs):
    bands = dedupe.minhash_bands(docs, "doc_id", "text", 8, 4, 5)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedupe.near_dup_candidates(bands).collect()
    }
    assert (1, 4) in pairs, "exact copies always collide in every band"
    assert (1, 2) in pairs or (2, 4) in pairs, (
        "one-token edit should collide in at least one of 4 bands"
    )
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_jaccard_confirms_candidates(spark, docs):
    bands = dedupe.minhash_bands(docs, "doc_id", "text", 8, 4, 5)
    pairs = dedupe.near_dup_candidates(bands)
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedupe.jaccard_pairs(docs, pairs, "doc_id", "text", 3).collect()
    }
    assert jac[(1, 4)] == 1.0
    for (a, b), j in jac.items():
        if 3 in (a, b):
            assert j < 0.2


def test_simhash_hamming_locality(spark, docs):
    sh = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", dedupe.simhash16("text").alias("h")
        ).collect()
    }
    d_near = bin(sh[1] ^ sh[2]).count("1")
    d_far = bin(sh[1] ^ sh[3]).count("1")
    assert sh[1] == sh[4]
    assert d_near < d_far, f"near dist {d_near} should be < far dist {d_far}"


def test_simhash64_hamming_locality(spark, docs):
    sh = {
        r["doc_id"]: r["simhash"]
        for r in dedupe.simhash_agg(docs, "doc_id", "text", bits=64).collect()
    }
    # signed-long xor: mask to 64 bits before popcount
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    d_near = ham(sh[1], sh[2])
    d_far = ham(sh[1], sh[3])
    assert sh[1] == sh[4], "exact copies share the fingerprint"
    assert d_near < d_far, f"near dist {d_near} should be < far dist {d_far}"
    # unrelated 64-bit fingerprints should disagree on roughly half
    # the bits — require well over the near-dup distance
    assert d_far >= 16


def test_simhash_agg_matches_inline_16(spark, docs):
    # the explode-agg form at bits=16 must reproduce the inline
    # Column form bit-for-bit (same md5-nibble layout)
    inline = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", dedupe.simhash16("text").alias("h")
        ).collect()
    }
    agg = {
        r["doc_id"]: r["simhash"]
        for r in dedupe.simhash16_agg(docs, "doc_id", "text").collect()
    }
    assert inline == agg


def test_lsh_ann_recall_vs_bruteforce(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.cosine_topk(e, e, k=3)
    approx = similarity.lsh_bucket_topk(e, dim=64, k=3, n_planes=4)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    approx_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 16 buckets over a small corpus: LSH trades recall for candidate
    # count; anything clearly above random co-bucketing is structure
    assert recall >= 0.3, f"LSH recall {recall:.2f} too low"
    assert approx.count() > 0


def test_zero_norm_vector_yields_null_not_nan(spark):
    """A zero embedding has no direction: the nullif guard must make
    its similarity NULL (sorting LAST under DESC) on the Spark side,
    mirroring the identical guard in the DuckDB ``_UNIT`` fragment —
    never NaN/inf, which DuckDB's IEEE division would rank ABOVE real
    similarities."""
    import math

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),  # the degenerate vector
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.cosine_topk(e, e, k=2).collect()
    sims = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in got}
    for v in sims.values():
        assert v is None or math.isfinite(v), f"non-finite cos_sim {v}"
    # pairs touching the zero vector are NULL, and NULL ranks last:
    # query 0's rank-1 neighbor is the real vector, not the zero one
    assert sims[(0, 1)] is not None and sims[(0, 1)] > 0.9
    ranks = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in got
    }
    assert ranks[(0, 1)] == 1 and ranks[(0, 2)] == 2


def test_cosine_topk_oversized_query_guard(spark):
    e = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="broadcasts the query side"):
        similarity.cosine_topk(e, e, k=1, max_queries=10)
    # bounded probe: a query set under the cap still works
    assert similarity.cosine_topk(e.limit(5), e, k=1, max_queries=10).count() == 5


def test_near_dup_pairs_recall_and_plan(spark):
    """q31's LSH+verify path: high recall vs the brute-force oracle at
    its tuned threshold, and a bucketed equi-join plan — never a
    cartesian (the thing that made brute force a 100 TB non-starter)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh = similarity.embedding_near_dup_pairs(
        e, threshold=0.4, n_planes=3, n_tables=24
    )
    brute = similarity.brute_force_near_dup_pairs(e, threshold=0.4)
    lp = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    bp = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert lp <= bp, "exact verify means no false positives, ever"
    assert len(lp) / len(bp) >= 0.95, f"recall {len(lp)/len(bp):.3f}"
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_ivf_recall_vs_bruteforce(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.cosine_topk(e, e, k=3)
    approx = similarity.ivf_topk(e, k=3, n_clusters=8, nprobe=3)
    ep = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ep & ap) / len(ep)
    # probing 3/8 clusters; true neighbors are usually co-clustered,
    # so recall should clearly beat the 3/8 random-probe floor
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_ivf_training_sample_partition_invariant(spark):
    """The md5-ordered training sample — and therefore the trained
    centroids — must not depend on how the input happens to be
    partitioned (the property that makes q48 replayable and
    cluster-retry-safe)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # train_per_cluster=8 -> cap 32 << 500 rows, so the sample BINDS
    a = similarity.build_ivf_centroids(e, k=4, train_per_cluster=8)
    b = similarity.build_ivf_centroids(
        e.repartition(17, "vec_id"), k=4, train_per_cluster=8
    )
    c = similarity.build_ivf_centroids(e.coalesce(1), k=4, train_per_cluster=8)
    assert a == b == c


def test_ivf_assign_scales_to_many_clusters(spark):
    """Regression for the round-6 scale bug: the argmin used to chain
    when(d < best_d, ...) per centroid, nesting each partial result
    twice per step — exponential in K, driver OOM near K~80.  The
    array-literal form must plan and execute a K=128 assignment in
    bounded time (production IVF wants K ~ sqrt(n))."""
    import time as _time

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(64)
    cents = [
        [float((i * 31 + j) % 17) / 17.0 for j in range(64)] for i in range(128)
    ]
    t0 = _time.monotonic()
    got = similarity.assign_ivf_cluster(e, cents).select("cluster").collect()
    assert _time.monotonic() - t0 < 60, "K=128 assignment should be seconds"
    assert all(0 <= r["cluster"] < 128 for r in got) and len(got) == 64


def test_multimodal_stub_and_plumbing(spark, docs):
    media = multimodal.documents_as_media(
        docs.withColumn("source", F.lit("test"))
    )
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert len(feats) == 4
    assert feats[1]["byte_len"] == len(BASE.encode())
    assert feats[1]["content_md5"] == feats[4]["content_md5"]

    # image/png and image/jpeg now ship real stdlib header decoders;
    # use a genuinely unregistered mime for the NotImplementedError
    # contract, and restore the registry after overriding
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xxx", "image/tiff")
    before = multimodal.registered_decoders()
    try:
        multimodal.register_decoder("image/tiff", lambda b: ("decoded", len(b)))
        assert multimodal.decode_media(b"xxx", "image/tiff") == ("decoded", 3)
    finally:
        multimodal._DECODERS.clear()
        multimodal._DECODERS.update(before)


def test_png_jpeg_header_decoders(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = multimodal.synthesize_image_media(ids, "doc_id", corrupt_every=0)
    rows = {r["media_id"]: r for r in multimodal.image_dims(media).collect()}
    assert len(rows) == 40
    for i, r in rows.items():
        assert r["decode_ok"], f"id {i} should decode"
        assert r["width"] == i % 300 + 1
        assert r["height"] == i * 7 % 200 + 1
        assert r["mime"] == ("image/png" if i % 2 == 0 else "image/jpeg")

    # direct byte-level checks on the parsers
    png = bytes(
        media.filter(F.col("media_id") == 2).collect()[0]["payload"]
    )
    d = multimodal.png_header_decoder(png)
    assert (d["width"], d["height"], d["bit_depth"], d["color_type"]) == (3, 15, 8, 6)
    jpg = bytes(
        media.filter(F.col("media_id") == 3).collect()[0]["payload"]
    )
    d = multimodal.jpeg_sof_decoder(jpg)
    assert (d["width"], d["height"], d["precision"], d["n_components"]) == (4, 22, 8, 3)

    # truncated headers must be rejected, not mis-parsed
    with pytest.raises(ValueError):
        multimodal.png_header_decoder(png[:16])
    with pytest.raises(ValueError):
        multimodal.jpeg_sof_decoder(jpg[:16])
    with pytest.raises(ValueError):
        multimodal.png_header_decoder(jpg)  # wrong container
    with pytest.raises(ValueError):
        multimodal.jpeg_sof_decoder(png)


def test_wav_decoder_rejects_truncated_data_chunk():
    import struct

    pcm = bytes(range(16))
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    assert multimodal.wav_pcm_decoder(wav) == pcm
    # declared size exceeds remaining payload -> must raise, not clamp
    lying = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"data" + struct.pack("<I", len(pcm) + 8) + pcm
    )
    with pytest.raises(ValueError):
        multimodal.wav_pcm_decoder(lying)


def test_quantization_roundtrip_fidelity(spark):
    """int8 codes must reconstruct the vector to within scale/2 per
    element, i.e. dequantized cosine vs the original ~1."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import vectors as V

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = V.as_double("embedding")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / 127.0
    qv = F.transform(v, lambda x: F.floor(x / (amax / 127.0) + 0.5).cast("int"))
    deq = F.transform(qv, lambda q: q.cast("double") * scale)
    worst = (
        e.select(V.cosine(v, deq).alias("c"))
        .agg(F.min("c"))
        .collect()[0][0]
    )
    assert worst > 0.995, f"dequantized cosine dropped to {worst}"


def test_decoded_stats_registry_closure(spark, docs):
    media = multimodal.documents_as_media(
        docs.withColumn("source", F.lit("test"))
    )
    # default registry: text/plain decodes; replace-decode of valid
    # utf-8 text is the text itself, so decoded_len == len(text)
    rows = {r["media_id"]: r for r in multimodal.decoded_stats(media).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert all(r["decode_ok"] for r in rows.values())
    assert {i: r["decoded_len"] for i, r in rows.items()} == {
        i: len(t) for i, t in texts.items()
    }

    # unknown mime -> decode_ok=false, never a stage failure
    exotic = media.withColumn(
        "meta",
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.col("meta.source").alias("source"),
            F.col("meta.byte_len").alias("byte_len"),
        ),
    )
    bad = multimodal.decoded_stats(exotic).collect()
    assert all(not r["decode_ok"] and r["decoded_len"] is None for r in bad)

    # explicit decoder mapping overrides the registry snapshot
    halved = multimodal.decoded_stats(
        exotic, decoders={"video/mp4": lambda b: b[: len(b) // 2]}
    ).collect()
    assert all(r["decode_ok"] for r in halved)
    assert {r["media_id"]: r["decoded_len"] for r in halved} == {
        i: len(t.encode()) // 2 for i, t in texts.items()
    }


def test_decoded_stats_wav_and_decoder_exceptions(spark):
    """A binary (non-UTF-8) mime runs through the registry for real,
    and a payload that makes its decoder raise yields decode_ok=false
    while good rows in the same Arrow batch still decode."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 0, 1000, -1000, 0))
    good = buf.getvalue()
    corrupt = b"RIFF\x00\x00\x00\x00WAVE"  # valid magic, no data chunk
    not_wav = b"\x89PNG\r\n"
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt)), (3, bytearray(not_wav))],
        "media_id long, payload binary",
    ).select(
        "media_id",
        "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit("t").alias("source"),
            F.length("payload").cast("long").alias("byte_len"),
        ).alias("meta"),
    )
    got = {r["media_id"]: r for r in multimodal.decoded_stats(rows).collect()}
    assert got[1]["decode_ok"] and got[1]["decoded_len"] == 8  # 4 frames x int16
    assert not got[2]["decode_ok"] and got[2]["decoded_len"] is None
    assert not got[3]["decode_ok"] and got[3]["decoded_len"] is None


def test_simhash_near_dups_exact_recall(spark, docs):
    # pigeonhole guarantee: with 4 bands and max_hamming 3, the
    # banded plan must return EXACTLY the pairs a brute-force
    # fingerprint comparison finds — not an approximation
    sh = {
        r["doc_id"]: r["simhash"]
        for r in dedupe.simhash_agg(docs, "doc_id", "text", bits=64).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    expected = {
        (a, b, ham(sh[a], sh[b]))
        for a in sh
        for b in sh
        if a < b and ham(sh[a], sh[b]) <= 3
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedupe.simhash_near_dups(
            docs, "doc_id", "text", bits=64, bands=4, max_hamming=3
        ).collect()
    }
    assert got == expected
    assert any(a == 1 and b == 4 and h == 0 for a, b, h in got), (
        "exact copies must surface at hamming 0"
    )


def test_simhash_near_dups_rejects_lossy_knobs(spark, docs):
    with pytest.raises(ValueError, match="exact"):
        dedupe.simhash_near_dups(
            docs, "doc_id", "text", bands=4, max_hamming=4
        )
    with pytest.raises(ValueError, match="divide"):
        dedupe.simhash_near_dups(docs, "doc_id", "text", bands=5)


def test_semantic_dedup_keeps_one_nearest_per_cluster(spark):
    # two tight groups far apart in 4-d; the quantizer (k=2, trained
    # on all 6 rows — cap >> n) must separate them, and exactly the
    # member closest to each centroid survives
    # ids chosen so the md5-ordered seed draw (6, then 23) picks one
    # seed per group — the separation assertion is then a Lloyd
    # invariant, not seed luck
    rows = [
        (6, [0.0, 0.0, 0.0, 1.0]),
        (7, [0.0, 0.0, 0.1, 1.0]),
        (9, [0.0, 0.0, 0.2, 1.0]),
        (21, [9.0, 9.0, 0.0, 1.0]),
        (22, [9.0, 9.0, 0.1, 1.0]),
        (23, [9.0, 9.0, 0.2, 1.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(e, n_clusters=2).collect()
    assert len(out) == 6, "every vector gets a verdict"
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster) == 2, "far-apart groups land in distinct clusters"
    for members in by_cluster.values():
        kept = [r for r in members if r["is_kept"]]
        assert len(kept) == 1, "exactly one canonical per cluster"
        assert kept[0]["dist"] == min(r["dist"] for r in members), (
            "the survivor is the centroid-nearest member"
        )
        ids = {r["vec_id"] for r in members}
        assert ids <= {6, 7, 9} or ids <= {21, 22, 23}, (
            "clusters never mix the two groups"
        )


def test_hierarchical_assign_invariants(spark):
    import random as _r

    rng = _r.Random(7)
    centroids = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(25)]
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in similarity.assign_ivf_cluster_hierarchical(
            e, centroids, "embedding", n_super=5
        ).collect()
    }
    groups = similarity._centroid_kmeans(centroids, 5)
    by_group = {}
    for idx, g in enumerate(groups):
        by_group.setdefault(g, []).append(idx)
    children = [by_group[g] for g in sorted(by_group)]
    supers = [
        [sum(centroids[i][j] for i in ch) / len(ch) for j in range(8)]
        for ch in children
    ]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    vecs = {i: v for i, v in rows}
    for vid, cl in got.items():
        v = vecs[vid]
        sd = [d2(v, s) for s in supers]
        sup = sd.index(min(sd))
        assert cl in children[sup], "assigned child must live in the routed super"
        best_in_super = min(children[sup], key=lambda i: (d2(v, centroids[i]), i))
        assert d2(v, centroids[cl]) == d2(v, centroids[best_in_super]), (
            "assignment must be distance-optimal within the super"
        )


def test_hierarchical_assign_agrees_on_separated_data(spark):
    # when clusters are well separated, the hierarchy introduces no
    # boundary error: flat and hierarchical must agree exactly
    import random as _r

    rng = _r.Random(11)
    centers = [[10.0 * g + rng.uniform(-0.2, 0.2) for _ in range(4)] for g in range(9)]
    rows = []
    for i in range(90):
        c = centers[i % 9]
        rows.append((i, [x + rng.uniform(-0.3, 0.3) for x in c]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flat = {
        r["vec_id"]: r["cluster"]
        for r in similarity.assign_ivf_cluster(e, centers, "embedding").collect()
    }
    hier = {
        r["vec_id"]: r["cluster"]
        for r in similarity.assign_ivf_cluster_hierarchical(
            e, centers, "embedding", n_super=3
        ).collect()
    }
    assert flat == hier


def test_semantic_dedup_hierarchical_mode(spark):
    # same separated-groups fixture as the flat test: the hierarchy
    # introduces no boundary error there, so verdicts must be
    # IDENTICAL to the flat path, schema included
    rows = [
        (6, [0.0, 0.0, 0.0, 1.0]),
        (7, [0.0, 0.0, 0.1, 1.0]),
        (9, [0.0, 0.0, 0.2, 1.0]),
        (21, [9.0, 9.0, 0.0, 1.0]),
        (22, [9.0, 9.0, 0.1, 1.0]),
        (23, [9.0, 9.0, 0.2, 1.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flat = sorted(map(tuple, similarity.semantic_dedup(e, n_clusters=2).collect()))
    hier = sorted(map(tuple, similarity.semantic_dedup(
        e, n_clusters=2, hierarchical=True).collect()))
    assert flat == hier


def test_hierarchical_auto_routing_threshold():
    # the default (None) routes by cluster count; explicit flags win
    t = similarity.HIER_AUTO_MIN_K
    assert similarity._resolve_hierarchical(t - 1, None) is False
    assert similarity._resolve_hierarchical(t, None) is True
    assert similarity._resolve_hierarchical(t * 10, False) is False
    assert similarity._resolve_hierarchical(2, True) is True


def test_semantic_dedup_auto_matches_explicit_paths(spark):
    # below the threshold the default must be BIT-IDENTICAL to the
    # exact flat path (the oracle contract); above it, identical to
    # the explicit hierarchical path
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    auto_small = sorted(map(tuple, similarity.semantic_dedup(
        e, n_clusters=8).collect()))
    flat_small = sorted(map(tuple, similarity.semantic_dedup(
        e, n_clusters=8, hierarchical=False).collect()))
    assert auto_small == flat_small

    k_big = similarity.HIER_AUTO_MIN_K
    auto_big = sorted(map(tuple, similarity.semantic_dedup(
        e, n_clusters=k_big).collect()))
    hier_big = sorted(map(tuple, similarity.semantic_dedup(
        e, n_clusters=k_big, hierarchical=True).collect()))
    assert auto_big == hier_big


def test_ivf_hierarchical_recall_vs_bruteforce(spark):
    # the two-level probe adds one approximation (super routing) on
    # top of flat IVF's probed-fraction trade; on the real embedding
    # fixture it must still clearly beat the random-probe floor
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.cosine_topk(e, e, k=3)
    approx = similarity.ivf_topk(
        e, k=3, n_clusters=8, nprobe=3, hierarchical=True
    )
    ep = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ep & ap) / len(ep)
    assert recall >= 0.4, f"hierarchical IVF recall {recall:.2f} too low"


def test_ivf_blocked_scorer_matches_exact(spark):
    # the blocked BLAS scorer ranks the SAME candidate set as the
    # exact per-pair fold; scores round to 6 places on both paths, so
    # the selected pairs agree except at last-ulp rounding boundaries
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(k=5, n_clusters=8, nprobe=2, hierarchical=False)
    exact = similarity.ivf_topk(e, **kw, scorer="exact").collect()
    blocked = similarity.ivf_topk(e, **kw, scorer="blocked").collect()
    ep = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    bp = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in blocked}
    assert len(bp) == len(ep)
    overlap = set(ep) & set(bp)
    assert len(overlap) / len(ep) >= 0.98
    for pair in overlap:
        assert bp[pair] == pytest.approx(ep[pair], abs=2e-6)
    # schema parity, rank included
    assert [f.name for f in similarity.ivf_topk(
        e, **kw, scorer="blocked").schema] == [
        f.name for f in similarity.ivf_topk(e, **kw, scorer="exact").schema]


def test_ivf_unknown_scorer_rejected(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="unknown scorer"):
        similarity.ivf_topk(e, scorer="quantum").collect()


def test_lsh_blocked_scorer_matches_exact(spark):
    # blocked per-bucket scoring ranks the SAME candidate set as the
    # exact join; pair sets agree except at last-ulp rounding
    # boundaries
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(k=3, n_planes=4, n_tables=4)
    exact = similarity.lsh_bucket_topk(e, **kw, scorer="exact").collect()
    blocked = similarity.lsh_bucket_topk(e, **kw, scorer="blocked").collect()
    ep = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    bp = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in blocked}
    assert len(bp) == len(ep)
    overlap = set(ep) & set(bp)
    assert len(overlap) / len(ep) >= 0.98
    for pair in overlap:
        assert bp[pair] == pytest.approx(ep[pair], abs=2e-6)


def test_near_dup_blocked_scorer_matches_exact(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(threshold=0.4, n_planes=3, n_tables=24)
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(
            e, **kw, scorer="exact"
        ).collect()
    }
    # 24 tables is past the auto threshold: the DEFAULT must take the
    # blocked path and agree with exact modulo boundary ulps
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(e, **kw).collect()
    }
    assert exact, "fixture must produce near-dup pairs"
    common = set(exact) & set(blocked)
    assert len(common) / max(len(exact), len(blocked)) >= 0.98
    for pair in common:
        assert blocked[pair] == pytest.approx(exact[pair], abs=2e-6)


def test_lsh_unknown_scorer_rejected(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="unknown scorer"):
        similarity.lsh_bucket_topk(e, scorer="quantum").collect()
    with pytest.raises(ValueError, match="unknown scorer"):
        similarity.embedding_near_dup_pairs(e, scorer="quantum").collect()


def test_blocked_scorers_emit_null_scored_rows_like_exact(spark):
    # a zero-norm vector scores NULL against everything on the exact
    # path (nullif guard) but is still EMITTED, ranked last; the
    # blocked scorers must reproduce that row set — true NULLs, never
    # NaN (Spark desc ranks NaN ABOVE every number) and never dropped
    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(60)
    )
    zero = spark.createDataFrame(
        [(999999, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    both = e.unionByName(zero)

    kw = dict(k=5, n_clusters=4, nprobe=2)
    exact = similarity.ivf_topk(both, **kw, scorer="exact").collect()
    blocked = similarity.ivf_topk(both, **kw, scorer="blocked").collect()
    ep = {(r["query_id"], r["neighbor_id"], r["rank"]): r["cos_sim"] for r in exact}
    bp = {(r["query_id"], r["neighbor_id"], r["rank"]): r["cos_sim"] for r in blocked}
    assert set(ep) == set(bp), "row sets (incl. NULL-scored) must agree"
    null_keys = [kk for kk, v in ep.items() if v is None]
    assert null_keys, "fixture must exercise the NULL-score path"
    for kk in null_keys:
        assert bp[kk] is None

    lw = dict(k=3, n_planes=3, n_tables=4)
    lex = similarity.lsh_bucket_topk(both, **lw, scorer="exact").collect()
    lbl = similarity.lsh_bucket_topk(both, **lw, scorer="blocked").collect()
    lep = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in lex}
    lbp = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in lbl}
    assert lep == lbp


def test_ivf_default_routes_blocked_at_large_k(spark):
    # the auto rule is load-bearing: above the threshold the default
    # plan must contain the applyInPandas scorer; below it, must not
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    big = similarity.ivf_topk(
        e, k=3, n_clusters=similarity.SCORER_AUTO_MIN_K, nprobe=2
    )
    small = similarity.ivf_topk(e, k=3, n_clusters=8, nprobe=2)
    assert "FlatMapGroupsInPandas" in big._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in small._jdf.queryExecution().executedPlan().toString()


def test_ivf_default_scorer_small_k_is_exact(spark):
    # below the auto threshold the default must be BIT-IDENTICAL to
    # scorer='exact' — the q48 oracle contract
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(k=3, n_clusters=8, nprobe=2)
    default = sorted(map(tuple, similarity.ivf_topk(e, **kw).collect()))
    exact = sorted(
        map(tuple, similarity.ivf_topk(e, **kw, scorer="exact").collect())
    )
    assert default == exact


def test_numpy_lloyd_matches_exact_replay():
    # the vectorized mid-K trainer lands on the same dyadic-snapped
    # grid as the exact pure-python replay: same seeds/tie/snap rules.
    # The snap absorbs summation-order ulps EXCEPT within an ulp of a
    # snap boundary (_numpy_lloyd is declared not fold-bit-identical),
    # so the contract tested is coordinates within ONE 2^-10 grid step
    # — with a count of exact matches high enough that a systematic
    # divergence (wrong seeds, wrong tie rule, wrong snap) still fails
    import random as _r

    rng = _r.Random(29)
    rows = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(400)]
    exact = similarity._local_lloyd(rows, 12, 2)
    fast = similarity._numpy_lloyd(rows, 12, 2)
    assert len(fast) == len(exact)
    coords = [
        (a, b) for ce, cf in zip(exact, fast) for a, b in zip(ce, cf)
    ]
    assert all(abs(a - b) <= 1 / 1024 for a, b in coords)
    exact_frac = sum(a == b for a, b in coords) / len(coords)
    assert exact_frac >= 0.99, f"only {exact_frac:.3f} coords bit-equal"


def test_mid_k_training_routes_to_numpy_driver_side(spark):
    # at K above the exact-replay flop budget but under the collect
    # cap, training must produce the numpy-local result (no
    # distributed Lloyd jobs) — asserted by value equality with a
    # direct numpy replay of the md5-ordered sample
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import vectors as V

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    k = 40
    cap = similarity.IVF_TRAIN_PER_CLUSTER * k
    assert cap * k * 2 > 65_536 and cap <= similarity.NUMPY_TRAIN_MAX_ROWS
    got = similarity.build_ivf_centroids(e, "embedding", "vec_id", k)
    sample = [
        [float(x) for x in r["__tv"]]
        for r in e.select(
            "vec_id", V.as_double("embedding").alias("__tv")
        )
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(cap)
        .collect()
    ]
    assert got == similarity._numpy_lloyd(sample, min(k, len(sample)), 2)


def test_local_and_distributed_training_agree(spark):
    # the driver-side Lloyd fast path must produce BIT-IDENTICAL
    # centroids to the distributed path on real fixtures at both gate
    # SFs — the property that lets the q48/q88 oracles stay valid
    # regardless of which path ran
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        local = similarity.build_ivf_centroids(e, k=8)
        dist = similarity.build_ivf_centroids(e, k=8, _force_distributed=True)
        assert local == dist, f"training paths diverge at {sf}"


def test_wav_synthesis_and_frame_energy(spark):
    # the synthesized payload must be a decodable spec-correct WAV and
    # the framed energies must match a direct python replay of the
    # closed-form waveform, including the short last frame
    import struct

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal

    d = spark.createDataFrame([(5,), (16,)], "doc_id long")
    media = multimodal.synthesize_wav_media(d, "doc_id")
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, b in payloads.items():
        pcm = multimodal.wav_pcm_decoder(b)  # raises if malformed
        n = 64 + mid % 64
        assert len(pcm) == 2 * n
        samples = struct.unpack(f"<{n}h", pcm)
        expect = [
            (((mid * 31 + i * 7) % 65536 + 32768) % 65536) - 32768
            for i in range(n)
        ]
        assert list(samples) == expect

    out = multimodal.audio_frame_energy(media, frame_samples=16).collect()
    got = {(r["media_id"], r["frame_id"]): (r["n_samples"], r["energy"])
           for r in out}
    for mid in payloads:
        n = 64 + mid % 64
        samples = [
            (((mid * 31 + i * 7) % 65536 + 32768) % 65536) - 32768
            for i in range(n)
        ]
        for f in range(0, n, 16):
            frame = samples[f:f + 16]
            assert got[(mid, f // 16)] == (
                len(frame), sum(x * x for x in frame))
    # doc 5: n = 69 -> a 5-sample final frame must exist
    assert got[(5, 4)][0] == 5


def test_video_frame_sampling_walks_and_decimates(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal

    d = spark.createDataFrame([(6,), (9,)], "doc_id long")
    media = multimodal.synthesize_video_media(d, "doc_id")
    # payloads are real back-to-back JPEGs: every frame parses
    for r in media.collect():
        b = bytes(r["payload"])
        n = 3 + r["media_id"] % 4
        parts = b.split(b"\xff\xd9")
        assert len(parts) == n + 1 and parts[-1] == b""
        for f, frame in enumerate(parts[:-1]):
            hdr = multimodal.jpeg_sof_decoder(frame + b"\xff\xd9")
            assert hdr["width"] == (r["media_id"] * 5 + f) % 300 + 1
            assert hdr["height"] == (r["media_id"] * 3 + f * 7) % 200 + 1

    out = multimodal.video_frame_dims(media, sample_every=2).collect()
    got = {(r["media_id"], r["frame_index"]): (r["width"], r["height"])
           for r in out}
    # doc 6: n=5 -> frames 0,2,4 sampled; doc 9: n=4 -> frames 0,2
    assert {k[1] for k in got if k[0] == 6} == {0, 2, 4}
    assert {k[1] for k in got if k[0] == 9} == {0, 2}
    assert got[(6, 2)] == ((6 * 5 + 2) % 300 + 1, (6 * 3 + 14) % 200 + 1)

    # corrupt payload (truncated mid-frame): emits nothing, no failure
    import pandas as pd

    corrupt = media.limit(1).selectExpr(
        "media_id", "substring(payload, 1, 10) AS payload", "meta"
    )
    assert multimodal.video_frame_dims(corrupt).count() == 0


def test_prefilter_keeps_rounding_boundary_pair(spark):
    """ADVICE r08 (high): the exact path qualifies pairs on
    ``round(fold, 6) >= threshold``, so a pair whose RAW score sits in
    [threshold - 5e-7, threshold) rounds UP and must survive — but the
    r08 prefilter cut at threshold - 1e-7 compared the UNROUNDED BLAS
    score and dropped it before re-scoring.  Plant exactly such a pair
    and assert the prefiltered exact path (n_tables past the auto
    threshold) emits the identical pair set as the plain unfiltered
    self-join path on the same bucketing."""
    import math

    import hospital_data_engineering_pipeline_end_to_end_project_spark.operators.similarity as sim

    th = 0.9
    c = th - 3e-7  # raw cosine inside the round-up band
    rows = [
        (1, [1.0, 0.0]),
        (2, [c, math.sqrt(1.0 - c * c)]),  # boundary pair with 1
        (3, [-1.0, 0.0]),                  # clearly below threshold
        (4, [1.0, 1e-9]),                  # clearly above with 1
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(
        id_col="vec_id",
        vec_col="embedding",
        threshold=th,
        dim=2,
        n_planes=2,
        n_tables=sim._DEDUP_BEFORE_SCORE_MIN_TABLES,
        scorer="exact",
    )
    prefiltered = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in sim.embedding_near_dup_pairs(e, **kw).collect()
    }
    # force the plain (unfiltered) exact self-join on the SAME
    # bucketing by lifting the auto threshold past n_tables
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(sim, "_DEDUP_BEFORE_SCORE_MIN_TABLES", 10**9)
        plain = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in sim.embedding_near_dup_pairs(e, **kw).collect()
        }
    finally:
        mp.undo()
    assert prefiltered == plain, "prefilter must be output-invisible"
    assert (1, 2, th) in prefiltered, (
        "rounding-boundary pair must survive the widened prefilter cut"
    )
    assert not any(3 in (a, b) for a, b, _ in prefiltered)


def test_video_corrupt_payload_all_or_nothing(spark):
    """ADVICE r08 (low): a payload corrupted MID-stream (earlier
    frames decode fine, a later sampled frame fails SOF parse) must
    emit nothing for that payload — not a silently partial frame set
    — while clean payloads in the same batch are unaffected."""
    from pyspark.sql import functions as F

    ids = spark.range(6, 11).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_video_media(ids, "doc_id")
    row = media.filter("media_id = 6").collect()[0]
    clean = bytes(row["payload"])
    # find the SECOND frame's EOI and garble the SOF marker after it:
    # frame 0 (sampled) decodes, frame 2 (sampled) fails
    first_eoi = clean.find(b"\xff\xd9")
    second_eoi = clean.find(b"\xff\xd9", first_eoi + 2)
    seg_start = second_eoi + 2
    corrupted = (
        clean[: seg_start + 2] + b"\x00\x00" + clean[seg_start + 4 :]
    )
    both = spark.createDataFrame(
        [(6, bytearray(corrupted)), (7, bytearray(bytes(
            media.filter("media_id = 7").collect()[0]["payload"]
        )))],
        "media_id long, payload binary",
    )
    out = multimodal.video_frame_dims(both, sample_every=2).collect()
    assert all(r["media_id"] == 7 for r in out), (
        "mid-stream-corrupt payload must emit zero rows"
    )
    assert any(r["media_id"] == 7 for r in out), "clean payload unaffected"

    # truncated mid-frame (no trailing EOI) is corruption too
    trunc = spark.createDataFrame(
        [(6, bytearray(clean[:-3]))], "media_id long, payload binary"
    )
    assert multimodal.video_frame_dims(trunc).count() == 0


def test_containment_pairs_planted(spark):
    """q105 semantics: a short doc verbatim inside a long one scores
    containment 1.0 even though its Jaccard is low; orientation puts
    the smaller shingle set first; unrelated docs never pair."""
    rows = [
        (1, "a", "the quick brown fox jumps over the lazy dog while the cat "
                 "watches from the windowsill and many other words follow "
                 "in a long tail of filler content here"),
        (2, "a", "the quick brown fox jumps over the lazy dog"),
        (3, "a", "completely different text about spark and shuffles"),
        (4, "b", "the quick brown fox jumps over the lazy dog"),  # other key
    ]
    d = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {
        (r["id_contained"], r["id_container"]): r["containment"]
        for r in dedupe.containment_pairs(
            d, "doc_id", "text", "src", threshold=0.9
        ).collect()
    }
    assert got == {(2, 1): 1.0}, got
    # jaccard for the same pair is far below the containment
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedupe.jaccard_within_key(
            d, "doc_id", "text", "src"
        ).collect()
    }
    assert j[(1, 2)] < 0.5

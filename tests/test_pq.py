"""Product-quantization contracts (q109).

Value parity vs the DuckDB replay is covered by the catalog-wide
parity suites; these tests pin the quantizer's SEMANTIC properties:

- codes are in range and the codebook shapes are (n_sub, k, ds);
- compression bookkeeping: n_sub * ceil(log2 k) bits per vector;
- ADC top-k recall against the exact squared-L2 top-k is well above
  chance (PQ is lossy by design — the assertion is a measured floor,
  not equality);
- ADC distances approximate the true distances (relative error
  bounded on the fixture);
- training is deterministic: two builds from the same frame agree.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import similarity

SF = "/root/testdata/sf0.001"
N_SUB, K = 4, 16


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _books(spark):
    return similarity.build_pq_codebooks(
        _emb(spark), "embedding", "vec_id", n_sub=N_SUB, k=K, iterations=2
    )


def test_codebook_shapes_and_determinism(spark):
    b1 = _books(spark)
    b2 = _books(spark)
    assert b1 == b2
    assert len(b1) == N_SUB
    assert all(len(book) == K for book in b1)
    assert all(len(c) == 64 // N_SUB for book in b1 for c in book)


def test_codes_in_range(spark):
    books = _books(spark)
    codes = similarity.pq_encode(_emb(spark), "vec_id", "embedding", books)
    stats = codes.select(
        *[F.min(f"code_{m}").alias(f"lo{m}") for m in range(N_SUB)],
        *[F.max(f"code_{m}").alias(f"hi{m}") for m in range(N_SUB)],
    ).collect()[0]
    for m in range(N_SUB):
        assert stats[f"lo{m}"] >= 0
        assert stats[f"hi{m}"] < K


def test_adc_recall_and_distortion_vs_exact(spark):
    import numpy as np

    books = _books(spark)
    e = _emb(spark)
    n_q, k_top = 8, 5
    adc = (
        similarity.pq_adc_topk(
            e,
            e.filter(F.col("vec_id") < n_q),
            "vec_id",
            "embedding",
            books,
            k_top=k_top,
        )
        .collect()
    )
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    by_q: dict[int, list[tuple[int, float]]] = {}
    for r in adc:
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.adc_dist))
    assert sorted(by_q) == list(range(n_q))
    recalls = []
    for qid, got in by_q.items():
        qv = X[ids == qid][0]
        d2 = ((X - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        exact = [int(i) for i in ids[order] if i != qid][:k_top]
        recalls.append(len({g for g, _ in got} & set(exact)) / k_top)
        # ADC distance approximates the true distance: mean relative
        # error on the returned neighbors bounded (lossy, not wrong)
        for nid, ad in got:
            true = float(d2[ids == nid][0])
            assert ad >= 0
            if true > 1e-9:
                assert abs(ad - true) / true < 0.9
    # The fixture's embeddings are near-uniform high-dim noise whose
    # pairwise distances CONCENTRATE (min ~1.33 vs median ~1.98 for a
    # probe query), so neighbor gaps are tiny and lossy 16-bit codes
    # rank them imperfectly at ANY config (even 128-bit PQ only
    # reaches ~0.68 here — measured, numpy replica).  The honest
    # assertion is therefore "far above chance", not "high": chance
    # recall@5 is 5/499 ~ 0.01; measured mean is 0.125 (deterministic
    # pipeline, stable value) = 12x chance.
    assert sum(recalls) / len(recalls) >= 0.1, recalls


def test_bits_per_vector_bookkeeping():
    bits = N_SUB * math.ceil(math.log2(K))
    assert bits == 16  # 2 bytes vs 256 B float32 = 128x


def test_ivf_pq_residual_cuts_quantization_error(spark):
    """The reason residual PQ is canonical: quantizing x - c(x)
    instead of x spans only the within-cell displacement, so the same
    code budget loses less.  Measured as reconstruction MSE over the
    corpus (numpy replay of the trained models — ties may differ from
    the engine in the last ulp, irrelevant at MSE granularity)."""
    import numpy as np

    e = _emb(spark)
    rows = e.select("vec_id", "embedding").collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    raw_books = _books(spark)
    coarse, res_books = similarity.build_ivf_pq(
        e, "vec_id", "embedding", n_clusters=8, n_sub=N_SUB, k_codes=K
    )
    ds = 64 // N_SUB

    def mse(vectors, books):
        err = 0.0
        for m in range(N_SUB):
            S = vectors[:, m * ds : (m + 1) * ds]
            C = np.array(books[m])
            codes = ((S[:, None, :] - C[None]) ** 2).sum(-1).argmin(1)
            err += ((S - C[codes]) ** 2).sum()
        return err / len(vectors)

    Cc = np.array(coarse)
    assign = ((X[:, None, :] - Cc[None]) ** 2).sum(-1).argmin(1)
    resid = X - Cc[assign]
    mse_raw = mse(X, raw_books)
    mse_res = mse(resid, res_books)
    assert mse_res < mse_raw, (mse_res, mse_raw)


def test_ivf_pq_topk_contract(spark):
    e = _emb(spark)
    n_q, k_top = 8, 5
    out = similarity.ivf_pq_adc_topk(
        e,
        e.filter(F.col("vec_id") < n_q),
        "vec_id",
        "embedding",
        n_clusters=8,
        nprobe=2,
        n_sub=N_SUB,
        k_codes=K,
        k_top=k_top,
    ).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert r.adc_dist >= 0
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    assert sorted(by_q) == list(range(n_q))
    for qid, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        dists = [r.adc_dist for r in sorted(rs, key=lambda r: r.rank)]
        assert dists == sorted(dists)
        # pruned search scores only the probed cells' members — with
        # 8 cells and nprobe=2 there are always >= k_top candidates
        # on this fixture
        assert len(rs) == k_top


def test_codes_storage_is_fraction_of_raw(spark):
    """The residency claim, measured on disk: the PQ codes table
    (id + n_sub small ints) must be a small fraction of the raw
    embeddings parquet.  Parquet encodes int32 codes with value
    widths, so the exact ratio varies — the contract is the order of
    magnitude, not a byte count."""
    import os

    from hospital_data_engineering_pipeline_end_to_end_project_spark.scratch import scratch_path

    e = _emb(spark)
    books = _books(spark)
    codes = similarity.pq_encode(e, "vec_id", "embedding", books)
    raw_p = scratch_path("test_pq", "raw")
    codes_p = scratch_path("test_pq", "codes")
    e.select("vec_id", "embedding").coalesce(1).write.mode(
        "overwrite"
    ).parquet(raw_p)
    codes.coalesce(1).write.mode("overwrite").parquet(codes_p)

    def psize(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    raw_b, codes_b = psize(raw_p), psize(codes_p)
    assert codes_b < raw_b / 5, (codes_b, raw_b)


def test_blas_encoder_matches_expression_path(spark):
    """The two encoders implement the same argmin (first-min ties on
    both: np.argmin / array_position) — codes must agree on the
    fixture at both a small and a routed-size k (expansion-form BLAS
    distances differ from the sequential fold only in the last ulp,
    which flips a code only on an exact near-tie; none exists here)."""
    e = _emb(spark)
    for k in (16, 64):
        books = similarity.build_pq_codebooks(
            e, "embedding", "vec_id", n_sub=N_SUB, k=k, iterations=2
        )
        a = {
            r.vec_id: tuple(r[f"code_{m}"] for m in range(N_SUB))
            for r in similarity.pq_encode(
                e, "vec_id", "embedding", books, encoder="expr"
            ).collect()
        }
        b = {
            r.vec_id: tuple(r[f"code_{m}"] for m in range(N_SUB))
            for r in similarity.pq_encode(
                e, "vec_id", "embedding", books, encoder="blas"
            ).collect()
        }
        assert a == b


def test_ivf_pq_blas_route_matches_expr(spark):
    e = _emb(spark)
    model = similarity.build_ivf_pq(
        e, "vec_id", "embedding", n_clusters=8, n_sub=N_SUB, k_codes=K
    )
    kw = dict(
        id_col="vec_id",
        vec_col="embedding",
        n_clusters=8,
        nprobe=2,
        n_sub=N_SUB,
        k_codes=K,
        k_top=5,
        model=model,
    )
    q = e.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, similarity.ivf_pq_adc_topk(e, q, encoder="expr", **kw).collect()))
    b = sorted(map(tuple, similarity.ivf_pq_adc_topk(e, q, encoder="blas", **kw).collect()))
    assert a == b


def test_encoder_auto_routing_thresholds():
    assert similarity._resolve_pq_encoder(16, None) == "expr"
    assert similarity._resolve_pq_encoder(
        similarity.PQ_ENCODER_AUTO_MIN_K, None
    ) == "blas"
    assert similarity._resolve_pq_encoder(256, "expr") == "expr"


def test_empty_training_corpus_raises_cleanly(spark):
    # build_* return empty models for an empty corpus; every consumer
    # must fail with the cause, not an IndexError three frames deep
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    books = similarity.build_pq_codebooks(empty, "embedding", "vec_id")
    assert books == []
    q = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    for fn in (
        lambda: similarity.pq_encode(q, "vec_id", "embedding", books),
        lambda: similarity.pq_adc_topk(q, q, "vec_id", "embedding", books),
        lambda: similarity.ivf_pq_adc_topk(empty, q, "vec_id", "embedding"),
    ):
        try:
            fn()
            raise AssertionError("expected ValueError")
        except ValueError as exc:
            assert "empty PQ codebooks" in str(exc)

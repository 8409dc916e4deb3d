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

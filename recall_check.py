"""Measured recall@5 operating points for the approximate ANN family.

Every approximate neighbor operator in the catalog trades recall for
candidate volume; the per-operator tests assert "far above chance",
but the *operating curve* — recall vs wall-clock as the knobs move —
is a measurement.  This script produces it at sf0.1 so BASELINE.md
can carry the table next to the 10x growth numbers.

TWO corpora (round-10: the r09 verdict's decision-grade gap):

- ``noise``: the synthetic sf0.1 ``embeddings`` table — near-uniform
  noise, so absolute recall is structurally capped (the top-5 of a
  noise corpus is an arbitrary set any lossy sketch half-misses);
  knob DIRECTION is what this corpus validates.
- ``clustered``: planted Gaussian clusters (deterministic seed,
  n_clusters centers, within-cluster spread) — the structure a real
  embedding corpus has.  A query's true neighbors share its cluster,
  which is exactly what quantizers/buckets preserve, so these numbers
  are the ones that transfer to production corpora.

Protocol (all deterministic):

- query set = ``vec_id % 20 == 7`` (100 of the 2,000 vectors);
- the quantized query-vs-corpus family (PQ-ADC, IVF-PQ, int8 SDC,
  binary Hamming, Hamming->exact rerank) runs against the DISJOINT
  corpus (the other 1,900 vectors) so self-matches cannot inflate
  recall; ground truth is the exact :func:`cosine_topk` over the same
  split;
- the all-pairs self-join family (LSH, IVF) runs on the FULL table
  (that is its contract) with results filtered to the query ids;
  ground truth is the exact :func:`cosine_topk` of the queries
  against the full table (both sides exclude self-pairs);
- recall@5 = mean over queries of |exact top-5 ∩ retrieved top-5| / 5
  (for a query with fewer than 5 retrieved neighbors, the missing
  slots count as misses);
- chance level = 5 / corpus ≈ 0.003 — the "far above chance" floor.

Wall-clock is min-of-2 noop-sink runs, same convention as bench.py.
Usage: ``python recall_check.py [noise|clustered|both]`` (default
both).  Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: clustered-corpus shape: 2000 vectors in 40 planted clusters of 50,
#: spread 0.35 of the unit center scale — tight enough that a vector's
#: true neighbors are overwhelmingly its cluster-mates, loose enough
#: that within-cluster ranking still exercises the scorers
CLUSTERED_N = 2_000
CLUSTERED_DIM = 64
CLUSTERED_K = 40
CLUSTERED_SPREAD = 0.35
CLUSTERED_SEED = 20260815


def make_clustered_embeddings(dst_path: str) -> None:
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(CLUSTERED_SEED)
    centers = rng.standard_normal((CLUSTERED_K, CLUSTERED_DIM))
    cluster = np.arange(CLUSTERED_N) % CLUSTERED_K
    vecs = centers[cluster] + CLUSTERED_SPREAD * rng.standard_normal(
        (CLUSTERED_N, CLUSTERED_DIM)
    )
    pd.DataFrame(
        {
            "vec_id": np.arange(CLUSTERED_N, dtype="int64"),
            "embedding": [row.tolist() for row in vecs],
        }
    ).to_parquet(dst_path, index=False)


def _topk_sets(df, k: int) -> dict[int, frozenset[int]]:
    rows = df.select("query_id", "neighbor_id").collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return {q: frozenset(s) for q, s in out.items()}


def _recall(gt: dict[int, frozenset[int]], got: dict[int, frozenset[int]], k: int) -> float:
    hits = sum(len(gt[q] & got.get(q, frozenset())) for q in gt)
    return round(hits / (len(gt) * k), 3)


def _timed(make_df) -> tuple[float, object]:
    best, df = float("inf"), None
    for _ in range(2):
        t0 = time.monotonic()
        df = make_df()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 2), df


def run_points(spark, e, K: int = 5) -> dict:
    """The full operating-point battery over one embeddings frame
    ``e`` (vec_id, embedding) — returns the points dict."""
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import similarity

    queries = e.filter(F.col("vec_id") % 20 == 7)
    corpus = e.filter(F.col("vec_id") % 20 != 7)
    points: dict = {}

    def point(name: str, make_df, gt_sets) -> None:
        sec, df = _timed(make_df)
        got = _topk_sets(df.filter(F.col("query_id") % 20 == 7), K)
        points[name] = {"recall_at_5": _recall(gt_sets, got, K), "sec": sec}

    # --- query-vs-disjoint-corpus family (quantized scorers) ---
    gt_split = _topk_sets(similarity.cosine_topk(queries, corpus, k=K), K)
    books44 = similarity.build_pq_codebooks(
        corpus, "embedding", "vec_id", n_sub=4, k=16, iterations=2
    )
    point(
        "pq_adc_sub4_k16",
        lambda: similarity.pq_adc_topk(
            corpus, queries, "vec_id", "embedding", books44, k_top=K
        ),
        gt_split,
    )
    books8 = similarity.build_pq_codebooks(
        corpus, "embedding", "vec_id", n_sub=8, k=16, iterations=2
    )
    point(
        "pq_adc_sub8_k16",
        lambda: similarity.pq_adc_topk(
            corpus, queries, "vec_id", "embedding", books8, k_top=K
        ),
        gt_split,
    )
    # higher-rate codebooks (64 centroids/subspace): on clustered
    # corpora the k=16 points collapse (within-cluster ordering is
    # finer than the quantization cell), so this is the point that
    # shows recall is a RATE knob, not a family defect
    books864 = similarity.build_pq_codebooks(
        corpus, "embedding", "vec_id", n_sub=8, k=64, iterations=2
    )
    point(
        "pq_adc_sub8_k64",
        lambda: similarity.pq_adc_topk(
            corpus, queries, "vec_id", "embedding", books864, k_top=K
        ),
        gt_split,
    )
    point(
        "ivf_pq_c8_p2_sub4",
        lambda: similarity.ivf_pq_adc_topk(
            corpus,
            queries,
            "vec_id",
            "embedding",
            n_clusters=8,
            nprobe=2,
            n_sub=4,
            k_codes=16,
            k_top=K,
        ),
        gt_split,
    )
    point(
        "int8_sdc",
        lambda: similarity.int8_sdc_topk(
            corpus, queries, "vec_id", "embedding", k_top=K
        ),
        gt_split,
    )
    point(
        "binary_hamming_64bit",
        lambda: similarity.binary_hamming_topk(
            queries, corpus, "vec_id", "embedding", dim=64, k=K
        ),
        gt_split,
    )

    # --- two-stage composition, now the first-class q126 operator ---
    for mult in (4, 16):
        point(
            f"hamming_shortlist{mult * K}_exact_rerank",
            lambda m=mult: similarity.hamming_rerank_topk(
                queries, corpus, "vec_id", "embedding",
                dim=64, shortlist=m * K, k=K,
            ),
            gt_split,
        )

    # --- all-pairs self-join family (bucketed candidate generation) ---
    gt_full = _topk_sets(similarity.cosine_topk(queries, e, k=K), K)
    for planes, tables in ((8, 2), (8, 4), (8, 8), (6, 4)):
        point(
            f"lsh_p{planes}_t{tables}",
            lambda p=planes, t=tables: similarity.lsh_bucket_topk(
                e, k=K, n_planes=p, n_tables=t
            ),
            gt_full,
        )
    for n_clusters, nprobe in ((8, 1), (8, 2), (8, 4), (16, 2)):
        point(
            f"ivf_c{n_clusters}_p{nprobe}",
            lambda c=n_clusters, p=nprobe: similarity.ivf_topk(
                e, k=K, n_clusters=c, nprobe=p
            ),
            gt_full,
        )
    return points


def main() -> None:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="recall-check",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    K = 5
    out: dict = {"sf_dir": SF_DIR, "k": K, "corpora": {}}
    if mode in ("noise", "both"):
        e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        out["corpora"]["noise"] = {
            "n": e.count(),
            "points": run_points(spark, e, K),
        }
    if mode in ("clustered", "both"):
        path = f"/tmp/recall_clustered_{os.getpid()}.parquet"
        make_clustered_embeddings(path)
        try:
            e = spark.read.parquet(path)
            out["corpora"]["clustered"] = {
                "n": e.count(),
                "n_clusters": CLUSTERED_K,
                "spread": CLUSTERED_SPREAD,
                "seed": CLUSTERED_SEED,
                "points": run_points(spark, e, K),
            }
        finally:
            os.remove(path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

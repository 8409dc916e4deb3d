"""Measured recall@5 operating points for the approximate ANN family.

Every approximate neighbor operator in the catalog trades recall for
candidate volume; the per-operator tests assert "far above chance"
(the synthetic embeddings are near-uniform noise, so absolute recall
is structurally capped), but the *operating curve* — recall vs
wall-clock as the knobs move — is a measurement.  This script
produces it at sf0.1 so BASELINE.md can carry the table next to the
10x growth numbers.

Protocol (all deterministic):

- query set = ``vec_id % 20 == 7`` (100 of the 2,000 sf0.1 vectors);
- the quantized query-vs-corpus family (PQ-ADC, IVF-PQ, int8 SDC,
  binary Hamming) runs against the DISJOINT corpus (the other 1,900
  vectors) so self-matches cannot inflate recall; ground truth is the
  exact :func:`cosine_topk` over the same split;
- the all-pairs self-join family (LSH, IVF) runs on the FULL table
  (that is its contract) with results filtered to the query ids;
  ground truth is the exact :func:`cosine_topk` of the queries
  against the full table (both sides exclude self-pairs);
- recall@5 = mean over queries of |exact top-5 ∩ retrieved top-5| / 5
  (for a query with fewer than 5 retrieved neighbors, the missing
  slots count as misses);
- chance level = 5 / corpus ≈ 0.003 — the "far above chance" floor.

Wall-clock is min-of-2 noop-sink runs, same convention as bench.py.
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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


def main() -> None:
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import similarity
    from hospital_data_engineering_pipeline_end_to_end_project_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="recall-check",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    K = 5
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = e.filter(F.col("vec_id") % 20 == 7)
    corpus = e.filter(F.col("vec_id") % 20 != 7)
    n_queries = queries.count()
    out: dict = {
        "sf_dir": SF_DIR,
        "k": K,
        "n_queries": n_queries,
        "chance_recall": round(K / corpus.count(), 4),
        "points": {},
    }

    def point(name: str, make_df, gt_sets) -> None:
        sec, df = _timed(make_df)
        got = _topk_sets(df.filter(F.col("query_id") % 20 == 7), K)
        out["points"][name] = {
            "recall_at_5": _recall(gt_sets, got, K),
            "sec": sec,
        }

    # --- query-vs-disjoint-corpus family (quantized scorers) ---
    gt_split = _topk_sets(
        similarity.cosine_topk(queries, corpus, k=K), K
    )
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

    # --- two-stage composition: Hamming shortlist -> exact rerank ---
    # the production shape q118's docstring promises (1-bit codes cut
    # the exact-scoring volume to shortlist/corpus); built from the
    # two existing gated operators, no new code path.  Recall is
    # bounded by the shortlist's coverage of the true top-5; cost is
    # the packed XOR scan + an exact pass over only q x shortlist
    # pairs instead of q x corpus.
    for mult in (4, 16):
        def two_stage(m=mult):
            shortlist = similarity.binary_hamming_topk(
                queries, corpus, "vec_id", "embedding", dim=64, k=m * K
            ).select("query_id", "neighbor_id")
            cand = shortlist.join(
                corpus.withColumnRenamed("vec_id", "neighbor_id"),
                "neighbor_id",
            ).join(
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_emb"),
                ),
                "query_id",
            )
            from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.skew import salted_grouped_topk

            dot = F.aggregate(
                F.zip_with(
                    "q_emb", "embedding", lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            qn = F.sqrt(F.aggregate(F.zip_with("q_emb", "q_emb", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x))
            cn = F.sqrt(F.aggregate(F.zip_with("embedding", "embedding", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x))
            scored = cand.select(
                "query_id",
                "neighbor_id",
                F.round(dot / F.nullif(qn * cn, F.lit(0.0)), 6).alias(
                    "cos_sim"
                ),
            )
            return salted_grouped_topk(
                scored, ["query_id"], "cos_sim", "neighbor_id", k=K,
                descending=True,
            )

        point(f"hamming_shortlist{mult * K}_exact_rerank", two_stage, gt_split)

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

    print(json.dumps(out))


if __name__ == "__main__":
    main()

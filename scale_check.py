"""Scaling spot-check for the heavy dedup family (q25/q26/q61).

COVERAGE.md argues these are sub-quadratic from plan shape (banded
LSH self-joins, co-occurrence pruning, hot-shingle caps); this script
turns the argument into a measurement: it synthesizes a 10x version
of the sf0.1 ``documents`` table and reports wall-clock growth
ratios.  A quadratic operator would grow ~100x; the banded/pruned
plans should grow roughly with corpus size (x bucket-occupancy
growth), i.e. tens at most.

The 10x corpus preserves the distribution that matters:

- copy 0 is sf0.1 verbatim, so the original near-dup clusters exist
  unchanged in every copy-universe;
- copy c > 0 replaces every 5th token with a copy-salted token
  (position-keyed, not doc-keyed), so within a copy near-dup pairs
  stay near-dups, while the same doc across two copies loses most of
  its shingle overlap — clusters multiply ~10x instead of merging
  into giant cross-copy components.  Cluster size stays O(1), count
  grows O(n): the shape a real 10x crawl has.

Usage: ``python scale_check.py [copies]`` (default 10).  Prints one
JSON line; paste the ratios into BASELINE.md.  Data goes to a
pid-scoped scratch dir (removed at exit), never into /root/testdata.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ("q25_minhash_bands", "q26_jaccard_pairs", "q61_dup_clusters")


def make_scaled_documents(src_dir: str, dst_dir: str, copies: int) -> None:
    base = pd.read_parquet(os.path.join(src_dir, "documents.parquet"))
    out = []
    for c in range(copies):
        cp = base.copy()
        cp["doc_id"] = cp["doc_id"] + c * 10_000_000
        if c > 0:
            salt = f"w{c}x"
            cp["text"] = cp["text"].map(
                lambda t: " ".join(
                    f"{salt}{j}" if j % 5 == 0 else w
                    for j, w in enumerate(t.split(" "))
                )
            )
            cp["n_chars"] = cp["text"].str.len()
        out.append(cp)
    os.makedirs(dst_dir, exist_ok=True)
    pd.concat(out, ignore_index=True).to_parquet(
        os.path.join(dst_dir, "documents.parquet"), index=False
    )


def time_queries(spark, sf_dir: str, runs: int = 2) -> dict[str, float]:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import registry

    qs = registry.queries()
    out = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from hospital_data_engineering_pipeline_end_to_end_project_spark.scratch import scratch_path
    from hospital_data_engineering_pipeline_end_to_end_project_spark.session import get_spark

    scaled_dir = scratch_path("scale_check", "documents.parquet")
    scaled_dir = os.path.dirname(scaled_dir)
    make_scaled_documents(SF_DIR, scaled_dir, copies)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="scale-check",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = time_queries(spark, SF_DIR)
    scaled = time_queries(spark, scaled_dir)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "copies": copies,
                "base_sec": base,
                "scaled_sec": scaled,
                "growth_ratio": {
                    q: round(scaled[q] / base[q], 2) for q in QUERIES
                },
            }
        )
    )
    shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

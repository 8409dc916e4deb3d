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

Usage: ``python scale_check.py [copies]
[docs|ann|tpch|events|stream|stream10|streamcompact|deep|deepann|all]``
(default 10, all).  ``deepann`` measures the default-routed LSH/IVF
rows plus the quantized tier (8-bit PQ / residual IVF-PQ / int8 SDC /
binary Hamming, training attributed separately) at ``copies=100``
tuning (past the hierarchical/blocked auto-route thresholds).
``streamcompact`` drives ``copies`` micro-batches through the novelty
gate with and without index compaction and reports the per-batch
lifetime curve.  All scaled fixtures are written as per-copy part
FILES inside ``{t}.parquet/`` directories (real scan splits; one-copy
synthesis memory).
The ``deep`` family is meant to be run at ``copies=100``: it times
only the scan-bound/bounded-state operators (two-orders-of-magnitude
claim).  ``stream10`` replays the streaming throughput smoke at base
AND at ``copies``-times the rows per micro-batch and reports the
rows/sec ratio.  Both are excluded from ``all``.  Prints one JSON line; paste the ratios into BASELINE.md.
Data goes to a pid-scoped scratch dir (removed at exit), never into
/root/testdata.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = (
    "q25_minhash_bands",
    "q26_jaccard_pairs",
    "q61_dup_clusters",
    "q86_simhash_near_dups",
    # round-8 additions — the text family registered in round 7:
    # lexical retrieval, the quality cascade, and the composed
    # multi-signal clustering (LSH + SimHash + CC end-to-end)
    "q87_bm25_topk",
    "q89_quality_filter",
    "q93_multi_signal_clusters",
    # per-lang vocab rank, salted two-level since round 9 — growth
    # should track the token scan, not the vocab sort
    "q46_top_words_per_lang",
    # round-8 corpus-curation wave (q94 is a trivial broadcast join
    # and is left out)
    "q95_boilerplate_stats",
    "q96_source_divergence",
    "q97_novelty_filter",
    # round-9 additions — the wave tail: media decode walks, the
    # triangle diagnostic, and the mergeable sketches (where the
    # two-level KMV construction proves itself at 10x)
    "q98_audio_frame_energy",
    "q99_triangle_counts",
    "q102_video_frame_sample",
    "q103_mergeable_sketches",
    # round-9 additions: positional passage coverage, asymmetric
    # containment, sketch-only cross-source overlap
    "q104_passage_dup_coverage",
    "q105_containment_pairs",
    "q106_sketch_overlap",
    "q107_contamination_scrub",
    # round-9 closing addition: the shuffled training-data export
    # (one hash exchange + bounded per-bucket sorts + write + audit)
    "q108_shuffled_export",
    # round-9 third wave (documents axis): count-min heavy hitters
    # (bounded counter state — growth should track the token scan)
    # and fixed-point PageRank on the banded near-dup graph (edges
    # multiply ~10x, 3 fixed join+agg rounds)
    "q122_countmin_heavy",
    "q123_pagerank",
    # token-budgeted mix: the two-phase quota cut's per-doc ordered
    # work is bounded to one boundary bucket per source — growth
    # should track the token-count scan
    "q124_token_budget_mix",
    # round-10 wave (documents axis): corpus-conditioned bigram
    # fluency (combinable count groupBys + two equi-joins — growth
    # should track the bigram scan), bounded-round label propagation
    # (edges multiply ~10x, fixed join+agg rounds), the per-group
    # reservoir draw (salted two-level rank), and URL canonicalization
    # + dedup (scan-speed string ops + one combinable groupBy)
    "q127_bigram_fluency",
    "q128_label_propagation",
    "q129_reservoir_sample",
    "q130_url_dedup",
    # round-10 late wave: exact prefix-filtered Jaccard join (copies
    # are salted every 5th token, so 5-shingle sets are disjoint
    # across copies -> postings and output grow linearly, the honest
    # within-copy structure-preserving axis for an exact join),
    # value-domain CDF calibration and token Gini (combinable
    # groupBys; growth should track the token scan)
    "q133_prefix_jaccard_join",
    "q134_source_calibration",
    "q135_token_gini",
    # keeper selection: q128's banded-graph labels + salted top-1
    "q136_cluster_keepers",
    # winnowing: per-doc array selection on the scan + two combinable
    # groupBys + a semi-join — growth should track the k-gram scan
    "q137_winnowing_fingerprints",
    # round-11: pair-level winnowing — postings self-join; cross-copy
    # fingerprints are disjoint (salted tokens), so pairs grow
    # linearly with copies, the honest axis for a pair join
    "q138_winnowing_pairs",
    # round-11: incremental LSH join (batch bands broadcast against
    # the corpus band scan) and the trigram-TF cosine join (postings
    # join; cross-copy trigrams disjoint under the salt)
    "q139_lsh_incremental_join",
    "q140_tf_cosine_join",
    # round-11 capstone: star-collapsed labels + batch edges,
    # re-propagated — per-batch cost tracks the label table + new
    # edges, not the accumulated graph
    "q141_incremental_labels",
)

#: Two-orders-of-magnitude family (``python scale_check.py 100 deep``):
#: the operators whose 100 TB claim is "bounded state / no hot key, so
#: growth tracks the scan" — run at copies=100 to test that claim two
#: orders up instead of one.  Curated to the scan-bound shapes (the
#: banded self-join family's Σ bucket² growth is already measured at
#: 10x and is super-linear by design, so it is not in this set).
DEEP_DOC_QUERIES = (
    # salted two-level vocab rank: window partitions bounded ~vocab/64
    "q46_top_words_per_lang",
    # two-level (shingle, salt) partial counts: the hot-key defense
    "q95_boilerplate_stats",
    # integer-exact TVD over a once-materialized count frame
    "q96_source_divergence",
    # two-level KMV bottom-k: sketch windows bounded by buckets x k
    "q103_mergeable_sketches",
    # count-min: fixed counter state regardless of corpus size
    "q122_countmin_heavy",
    # two-phase quota cut: ordered work bounded to boundary buckets
    "q124_token_budget_mix",
    # value-domain CDF: running total over the DISTINCT value domain,
    # which does not grow with the corpus
    "q134_source_calibration",
    # combinable groupBys keyed by doc id; state bounded by doc length
    "q135_token_gini",
)
DEEP_EVENT_QUERIES = (
    # salt-bucket sketch partials then <= buckets x k merges
    "q112_quantile_sketches",
    # one lead window + map-side-combined agg
    "q113_time_weighted_avg",
    # six accumulators per group; cost is the scan
    "q115_ols_trend",
)

#: Embedding-table queries timed against the scaled embeddings in the
#: ann family: PQ is corpus-size-INDEPENDENT in its tuning (the
#: codebook is n_sub x k regardless of n — bounded-sample training,
#: linear encode, table-lookup scoring), so the 10x row runs the same
#: parameters and should grow ~linearly.
EMB_QUERIES = (
    "q109_pq_adc_topk",
    "q110_ivf_pq_topk",
    # int8 SDC: linear encode + integer-gemm scoring — corpus-size-
    # independent tuning like PQ, should grow ~linearly
    "q111_int8_sdc_topk",
    # power-iteration PC: one batched covariance scan + a driver-side
    # dim x dim iteration + one projection scan — the driver step is
    # corpus-size-free, so growth should track the two scans
    "q114_power_iteration_pc",
    # 2-component deflated projection: same two scans as q114 (the
    # extra component is driver-side only)
    "q116_pca_project",
    # round-9 third wave: sign-pack + Hamming top-k (packed integer
    # scan past a broadcast probe set — should grow ~linearly) and
    # the JL projection (pure per-row map: the purest linear-growth
    # shape in the catalog)
    "q118_binary_hamming_topk",
    "q119_jl_projection",
    # round-10 wave (embeddings axis): the two-stage rerank (packed
    # scan grows linearly; the exact stage stays nq x shortlist —
    # corpus-size-FREE by construction) and the recall evaluator
    # (two top-k paths + an integer intersection)
    "q126_hamming_rerank_topk",
    "q131_ann_recall_eval",
)

#: Events-table queries timed against the scaled events in their own
#: family: q112's sketch windows are bounded by construction
#: (salt-bucket partials then a <= buckets x k merge) and q113 is one
#: lead window + a map-side-combined agg — both should grow
#: ~linearly with rows.
EVENTS_QUERIES = (
    "q112_quantile_sketches",
    "q113_time_weighted_avg",
    # OLS trend: one scan + six accumulators per group — should be
    # near-flat (the regression cost is the scan)
    "q115_ols_trend",
    # robust outliers: sketch (bounded windows) + one broadcast-join
    # flagging scan — growth should track the scan
    "q117_robust_outliers",
    # round-10: CUSUM drift — two integer windows over per-user
    # histories (partitions multiply with users, sizes stay bounded)
    "q132_cusum_drift",
)

#: TPC-H-style correlated subqueries scale on the FACT tables: the
#: 10x corpus multiplies lineitem/orders (new order keys over the
#: same part/supplier catalog — more transactions, same dims), which
#: is the axis that grows at 100 TB.
TPCH_QUERIES = (
    "q100_cheapest_regional_supplier",
    "q101_sole_late_supplier",
    # round-9 third wave (fact-table axis): Bloom-prefiltered semi
    # join (bitmap build is dim-sized and fixed; probe scan grows
    # 10x) and capped co-purchase lift (baskets multiply over the
    # same supplier catalog — pair space fixed, counts grow)
    "q120_bloom_semi_join",
    "q121_copurchase_lift",
    # salted two-level grouped top-k: window partitions bounded to
    # ~group/64 — growth should track the scan even with 10x-sized
    # groups (the one-level form would sort each group in one task)
    "q125_salted_topk",
    # sampled order statistics on the (flag, price) aggregate since
    # round 9 — the cumulative window is bounded by the price DOMAIN,
    # so growth should track the scan, not the sample sort
    "q49_sketch_stats",
)


def make_scaled_documents(src_dir: str, dst_dir: str, copies: int) -> None:
    """Per-copy part files inside a ``documents.parquet/`` DIRECTORY
    (the ``make_scaled_tpch_dir`` layout, since round 10 for every
    axis): synthesis memory stays at one-copy size and the scan gets
    ``copies`` real splits — a single concatenated file serializes
    map-side work into one task and understates parallel growth (the
    r09 q115 measurement caveat)."""
    base = pd.read_parquet(os.path.join(src_dir, "documents.parquet"))
    tdir = os.path.join(dst_dir, "documents.parquet")
    os.makedirs(tdir, exist_ok=True)
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
        cp.to_parquet(
            os.path.join(tdir, f"part-{c:05d}.parquet"), index=False
        )


def make_scaled_embeddings(src_dir: str, dst_dir: str, copies: int) -> None:
    """10x ``embeddings``: copy c rotates each vector's dims by c
    positions (np.roll) — every within-copy pairwise cosine is
    preserved EXACTLY (rotation is a permutation), while cross-copy
    pairs decorrelate, so neighborhood structure multiplies ~10x
    instead of collapsing onto the originals."""
    import numpy as np

    base = pd.read_parquet(os.path.join(src_dir, "embeddings.parquet"))
    tdir = os.path.join(dst_dir, "embeddings.parquet")
    os.makedirs(tdir, exist_ok=True)
    for c in range(copies):
        cp = base.copy()
        cp["vec_id"] = cp["vec_id"] + c * 10_000_000
        # every copy through the SAME float64 conversion: the source
        # column is float32, np.roll produces float64 — mixed dtypes
        # across part files break Spark's schema inference (copy 0
        # must not stay float32 while the rest become DOUBLE)
        cp["embedding"] = cp["embedding"].map(
            lambda v, c=c: np.roll(
                np.asarray(v, dtype=np.float64), c
            ).tolist()
        )
        cp.to_parquet(
            os.path.join(tdir, f"part-{c:05d}.parquet"), index=False
        )


def make_scaled_tpch(src_dir: str, dst_dir: str, copies: int) -> None:
    """10x fact tables for q100/q101: copy c offsets the order keys
    (consistently across lineitem and orders, so the q101 per-order
    EXISTS logic sees each copy as genuinely new orders) while part /
    supplier / nation / region stay fixed — the more-transactions-
    over-the-same-catalog shape a growing warehouse has.  Dim tables
    are symlinked in unchanged."""
    os.makedirs(dst_dir, exist_ok=True)
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        base = pd.read_parquet(os.path.join(src_dir, f"{t}.parquet"))
        out = []
        for c in range(copies):
            cp = base.copy()
            cp[key] = cp[key] + c * 10_000_000_000
            out.append(cp)
        pd.concat(out, ignore_index=True).to_parquet(
            os.path.join(dst_dir, f"{t}.parquet"), index=False
        )
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, f"{t}.parquet"), dst)


def make_scaled_tpch_dir(src_dir: str, dst_dir: str, copies: int) -> None:
    """100x-capable variant of :func:`make_scaled_tpch`: each copy is
    written as its own part file inside a ``{t}.parquet/`` DIRECTORY
    (Spark reads it transparently) instead of one concatenated
    in-memory frame — 100x lineitem is ~60M rows, which a single
    pandas concat would hold resident and a single output file would
    serialize into one scan task.  Per-copy files keep synthesis
    memory at one-copy size and give the scan ``copies`` splits, the
    layout a real warehouse has."""
    os.makedirs(dst_dir, exist_ok=True)
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        base = pd.read_parquet(os.path.join(src_dir, f"{t}.parquet"))
        tdir = os.path.join(dst_dir, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        for c in range(copies):
            cp = base.copy()
            cp[key] = cp[key] + c * 10_000_000_000
            cp.to_parquet(
                os.path.join(tdir, f"part-{c:05d}.parquet"), index=False
            )
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, f"{t}.parquet"), dst)


def make_scaled_events(src_dir: str, dst_dir: str, copies: int) -> None:
    """10x ``events``: copy c offsets user_id (and event_id for
    uniqueness) over the SAME time range — more users emitting at the
    same rate, the axis an event stream actually grows on.  Window
    partitions (per-user histories) multiply in count but keep their
    size, and per-type value distributions are preserved exactly."""
    base = pd.read_parquet(os.path.join(src_dir, "events.parquet"))
    tdir = os.path.join(dst_dir, "events.parquet")
    os.makedirs(tdir, exist_ok=True)
    for c in range(copies):
        cp = base.copy()
        cp["event_id"] = cp["event_id"] + c * 10_000_000_000
        cp["user_id"] = cp["user_id"] + c * 10_000_000
        cp.to_parquet(
            os.path.join(tdir, f"part-{c:05d}.parquet"), index=False
        )


def time_ann_family(spark, sf_dir: str, scaled_dir: str, copies: int) -> dict:
    """The ANN operators scale by RE-TUNING with corpus size, not by
    running fixed parameters on more data (with fixed buckets, LSH
    candidate volume is ~n^2/2^planes — quadratic):

    - LSH: planes ~ log2(n / target_bucket) keeps bucket occupancy
      constant, so candidate volume grows ~linearly; extra tables buy
      back the per-pair recall lost to the added planes.
    - IVF: n_clusters proportional to n keeps candidates-per-query
      (n * nprobe / n_clusters) constant.

    This measures both at base-tuned vs 10x-tuned settings, so the
    growth ratio reflects the documented operating curve.
    """
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import similarity

    def run(fn, runs: int = 2) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    base_e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    big_e = spark.read.parquet(os.path.join(scaled_dir, "embeddings.parquet"))
    extra_planes = max(1, int(round(__import__("math").log2(copies))))
    out = {
        "lsh_base": run(
            lambda: similarity.lsh_bucket_topk(
                base_e, k=5, n_planes=8, n_tables=4
            )
        ),
        # +log2(copies) planes holds occupancy; tables x2 compensates
        # the per-pair recall the extra planes cost
        "lsh_scaled_tuned": run(
            lambda: similarity.lsh_bucket_topk(
                big_e, k=5, n_planes=8 + extra_planes, n_tables=8
            )
        ),
        "ivf_base": run(
            lambda: similarity.ivf_topk(base_e, k=5, n_clusters=8, nprobe=2)
        ),
        # NO flags: at 10x-tuned K=80 the DEFAULT auto-routes the
        # BLOCKED scorer (similarity.SCORER_AUTO_MIN_K); assignment
        # stays flat below HIER_AUTO_MIN_K=256 (measured crossover) —
        # this row is the what-a-caller-gets measurement the round-7
        # verdict asked for
        "ivf_scaled_tuned": run(
            lambda: similarity.ivf_topk(
                big_e, k=5, n_clusters=8 * copies, nprobe=2
            )
        ),
        # explicit flat for the flat-vs-routed comparison
        "ivf_scaled_flat": run(
            lambda: similarity.ivf_topk(
                big_e, k=5, n_clusters=8 * copies, nprobe=2,
                hierarchical=False,
            )
        ),
        # blocked BLAS scorer on top of the default routing — the
        # candidate-scoring throughput path
        "ivf_scaled_blocked": run(
            lambda: similarity.ivf_topk(
                big_e, k=5, n_clusters=8 * copies, nprobe=2,
                scorer="blocked",
            )
        ),
    }
    out["lsh_growth"] = round(out["lsh_scaled_tuned"] / out["lsh_base"], 2)
    out["ivf_growth"] = round(out["ivf_scaled_tuned"] / out["ivf_base"], 2)
    out["ivf_blocked_growth"] = round(
        out["ivf_scaled_blocked"] / out["ivf_base"], 2
    )

    # semantic dedup at the K ~ n curve: the flat assignment is an
    # n x K pass (quadratic in total along the curve); the two-level
    # hierarchical assignment routes via ~sqrt(K) super-clusters.
    # The DEFAULT (no flags) row auto-routes at 10x-tuned K — it
    # should track the hier row, not the flat one.
    out["semdedup_base_flat"] = run(
        lambda: similarity.semantic_dedup(base_e, n_clusters=8)
    )
    out["semdedup_scaled_flat"] = run(
        lambda: similarity.semantic_dedup(
            big_e, n_clusters=8 * copies, hierarchical=False
        )
    )
    out["semdedup_scaled_hier"] = run(
        lambda: similarity.semantic_dedup(
            big_e, n_clusters=8 * copies, hierarchical=True
        )
    )
    out["semdedup_scaled_default"] = run(
        lambda: similarity.semantic_dedup(big_e, n_clusters=8 * copies)
    )
    out["semdedup_flat_growth"] = round(
        out["semdedup_scaled_flat"] / out["semdedup_base_flat"], 2
    )
    out["semdedup_hier_growth"] = round(
        out["semdedup_scaled_hier"] / out["semdedup_base_flat"], 2
    )
    out["semdedup_default_growth"] = round(
        out["semdedup_scaled_default"] / out["semdedup_base_flat"], 2
    )
    return out


def time_streaming(spark, sf_dir: str, scratch_dir: str) -> dict:
    """Streaming throughput smoke: the sf events table is re-played as
    a file-backed micro-batch stream (20 NDJSON files, 4 files per
    trigger — deterministic batch boundaries, unlike the wall-clock
    rate source) through the three streaming building blocks, each run
    to completion with ``trigger(availableNow=True)``:

    - watermarked tumbling-window aggregate (``windowed_event_counts``)
    - bounded-state streaming dedup (``dedupe_event_stream``)
    - ``foreachBatch`` SCD2 sink (every micro-batch through the full
      batch merge engine into parquet Silver state)

    Plus the corpus-ingestion loop on the ``documents`` table (10
    NDJSON files, 2 per trigger): every micro-batch through the
    SimHash novelty gate against the growing fingerprint index
    (``streaming/corpus_ingest.py``) — reported separately since its
    unit is documents, not events.

    Reported as rows/sec over end-to-end wall clock (source listing +
    all micro-batches + sink commits included) — the regression line
    BASELINE.md tracks per round.
    """
    import glob

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ingest

    src = os.path.join(scratch_dir, "stream_src")
    events = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    n_rows = events.count()
    events.repartition(20).write.mode("overwrite").json(src)
    n_files = len(glob.glob(os.path.join(src, "part-*")))

    def run_stream(make_query) -> float:
        stream = ingest.read_event_stream(spark, src, max_files_per_trigger=4)
        t0 = time.monotonic()
        q = make_query(stream)
        q.awaitTermination()
        return time.monotonic() - t0

    win_sec = run_stream(
        lambda s: ingest.windowed_event_counts(s)
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    dedup_sec = run_stream(
        lambda s: ingest.dedupe_event_stream(s)
        .writeStream.format("noop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    store = SilverStore(spark, os.path.join(scratch_dir, "stream_silver"))
    spec = scd2.Scd2Spec(keys=["user_id"], order_by=["event_id"])
    scd2_sec = run_stream(
        lambda s: ingest.scd2_sink(
            s.drop("ts"),
            store,
            "user_state",
            spec,
            checkpoint_dir=os.path.join(scratch_dir, "stream_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest, monitor

    sk_dir = os.path.join(scratch_dir, "stream_sketches")
    sk_sec = run_stream(
        lambda s: monitor.sketch_monitor_sink(
            s.select("event_id", "event_type", "value"),
            sk_dir,
            ["event_type"],
            "event_id",
            "value",
            checkpoint_dir=os.path.join(scratch_dir, "sk_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )

    cm_dir = os.path.join(scratch_dir, "stream_countmin")
    cm_sec = run_stream(
        lambda s: monitor.countmin_monitor_sink(
            s.select("event_id", "event_type"),
            cm_dir,
            "event_type",
            checkpoint_dir=os.path.join(scratch_dir, "cm_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )

    cu_dir = os.path.join(scratch_dir, "stream_cusum")
    cu_sec = run_stream(
        lambda s: monitor.cusum_monitor_sink(
            s.select("event_id", "user_id", "value"),
            cu_dir,
            "user_id",
            "event_id",
            "value",
            k_scaled=1000,
            checkpoint_dir=os.path.join(scratch_dir, "cu_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )

    doc_src = os.path.join(scratch_dir, "doc_stream_src")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    docs.repartition(10).write.mode("overwrite").json(doc_src)
    nov_store = SilverStore(spark, os.path.join(scratch_dir, "corpus_state"))
    doc_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(doc_src)
    )
    t0 = time.monotonic()
    q = corpus_ingest.novelty_ingest_sink(
        doc_stream,
        nov_store,
        checkpoint_dir=os.path.join(scratch_dir, "doc_ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    nov_sec = time.monotonic() - t0
    n_admitted = corpus_ingest.read_index(spark, nov_store.root).count()

    # LSH band index maintenance over the same doc-stream layout
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ann_index, lsh_index

    lsh_dir = os.path.join(scratch_dir, "lsh_index")
    lsh_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(doc_src)
    )
    t0 = time.monotonic()
    q = lsh_index.lsh_index_sink(
        lsh_stream, lsh_dir,
        checkpoint_dir=os.path.join(scratch_dir, "lsh_ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    lsh_sec = time.monotonic() - t0

    # winnowing fingerprint index maintenance (the span-dedup leg)
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import span_index

    span_dir = os.path.join(scratch_dir, "span_index")
    span_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(doc_src)
    )
    t0 = time.monotonic()
    q = span_index.span_index_sink(
        span_stream, span_dir,
        checkpoint_dir=os.path.join(scratch_dir, "span_ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    span_sec = time.monotonic() - t0

    # dHash fingerprint index maintenance (the perceptual image leg):
    # docs stream in, each micro-batch is synthesized to thumbnails
    # and decoded+hashed inside the writer (fan_out below the
    # synthesis — the span sink's single-file-scan lesson)
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import dhash_index

    dh_dir = os.path.join(scratch_dir, "dhash_index")
    dh_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(doc_src)
    )
    t0 = time.monotonic()
    q = dhash_index.dhash_doc_index_sink(
        dh_stream, dh_dir,
        checkpoint_dir=os.path.join(scratch_dir, "dh_ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    dh_sec = time.monotonic() - t0

    # word-frequency vocab index maintenance (the tokenizer-training
    # leg): each micro-batch collapses to its partial (word, freq)
    # shard — the cheapest sink in the family (one partial aggregate)
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import vocab_index

    vx_dir = os.path.join(scratch_dir, "vocab_index")
    vx_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .json(doc_src)
    )
    t0 = time.monotonic()
    q = vocab_index.vocab_index_sink(
        vx_stream, vx_dir,
        checkpoint_dir=os.path.join(scratch_dir, "vx_ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    vx_sec = time.monotonic() - t0

    # IVF posting index maintenance over a vector stream (embeddings
    # replayed as 10 NDJSON files, 2 per trigger; quantizer trained
    # once on the base table — the frozen-quantizer contract)
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.similarity import build_ivf_centroids

    vec_src = os.path.join(scratch_dir, "vec_stream_src")
    vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_vecs = vecs.count()
    vecs.repartition(10).write.mode("overwrite").json(vec_src)
    cents = build_ivf_centroids(vecs, "embedding", "vec_id", k=8)
    ivf_dir = os.path.join(scratch_dir, "ivf_index")
    vec_stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 2)
        .json(vec_src)
    )
    t0 = time.monotonic()
    q = ann_index.ivf_index_sink(
        vec_stream, ivf_dir, cents,
        checkpoint_dir=os.path.join(scratch_dir, "ivf_ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    ivf_sec = time.monotonic() - t0

    return {
        "rows": n_rows,
        "files": n_files,
        "windowed_agg_sec": round(win_sec, 2),
        "windowed_agg_rows_per_sec": int(n_rows / win_sec),
        "dedup_sec": round(dedup_sec, 2),
        "dedup_rows_per_sec": int(n_rows / dedup_sec),
        "scd2_sink_sec": round(scd2_sec, 2),
        "sketch_monitor_sec": round(sk_sec, 2),
        "sketch_monitor_rows_per_sec": int(n_rows / sk_sec),
        "countmin_monitor_sec": round(cm_sec, 2),
        "countmin_monitor_rows_per_sec": int(n_rows / cm_sec),
        "cusum_monitor_sec": round(cu_sec, 2),
        "cusum_monitor_rows_per_sec": int(n_rows / cu_sec),
        "scd2_sink_rows_per_sec": int(n_rows / scd2_sec),
        "novelty_ingest_docs": n_docs,
        "novelty_ingest_admitted": n_admitted,
        "novelty_ingest_sec": round(nov_sec, 2),
        "novelty_ingest_docs_per_sec": int(n_docs / nov_sec),
        "lsh_index_sec": round(lsh_sec, 2),
        "lsh_index_docs_per_sec": int(n_docs / lsh_sec),
        "span_index_sec": round(span_sec, 2),
        "span_index_docs_per_sec": int(n_docs / span_sec),
        "dhash_index_sec": round(dh_sec, 2),
        "dhash_index_docs_per_sec": int(n_docs / dh_sec),
        "vocab_index_sec": round(vx_sec, 2),
        "vocab_index_docs_per_sec": int(n_docs / vx_sec),
        "ivf_index_vecs": n_vecs,
        "ivf_index_sec": round(ivf_sec, 2),
        "ivf_index_vecs_per_sec": int(n_vecs / ivf_sec),
    }


def time_queries(
    spark, sf_dir: str, runs: int = 2, names=QUERIES
) -> dict[str, float]:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import registry

    qs = registry.queries()
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    family = sys.argv[2] if len(sys.argv) > 2 else "all"
    from hospital_data_engineering_pipeline_end_to_end_project_spark.scratch import scratch_path
    from hospital_data_engineering_pipeline_end_to_end_project_spark.session import get_spark

    scaled_dir = scratch_path("scale_check", "documents.parquet")
    scaled_dir = os.path.dirname(scaled_dir)
    if family in ("docs", "all"):
        make_scaled_documents(SF_DIR, scaled_dir, copies)
    if family in ("ann", "all"):
        make_scaled_embeddings(SF_DIR, scaled_dir, copies)
    if family in ("tpch", "all"):
        make_scaled_tpch(SF_DIR, scaled_dir, copies)
    if family in ("events", "all"):
        make_scaled_events(SF_DIR, scaled_dir, copies)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="scale-check",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": SF_DIR, "copies": copies}
    if family in ("docs", "all"):
        base = time_queries(spark, SF_DIR)
        scaled = time_queries(spark, scaled_dir)
        out["base_sec"] = base
        out["scaled_sec"] = scaled
        out["growth_ratio"] = {
            q: round(scaled[q] / base[q], 2) for q in QUERIES
        }
    if family in ("tpch", "all"):
        t_base = time_queries(spark, SF_DIR, names=TPCH_QUERIES)
        t_scaled = time_queries(spark, scaled_dir, names=TPCH_QUERIES)
        out["tpch_base_sec"] = t_base
        out["tpch_scaled_sec"] = t_scaled
        out["tpch_growth_ratio"] = {
            q: round(t_scaled[q] / t_base[q], 2) for q in TPCH_QUERIES
        }
    if family in ("ann", "all"):
        out["ann_family"] = time_ann_family(spark, SF_DIR, scaled_dir, copies)
        e_base = time_queries(spark, SF_DIR, names=EMB_QUERIES)
        e_scaled = time_queries(spark, scaled_dir, names=EMB_QUERIES)
        out["emb_base_sec"] = e_base
        out["emb_scaled_sec"] = e_scaled
        out["emb_growth_ratio"] = {
            q: round(e_scaled[q] / e_base[q], 2) for q in EMB_QUERIES
        }
    if family in ("events", "all"):
        ev_base = time_queries(spark, SF_DIR, names=EVENTS_QUERIES)
        ev_scaled = time_queries(spark, scaled_dir, names=EVENTS_QUERIES)
        out["events_base_sec"] = ev_base
        out["events_scaled_sec"] = ev_scaled
        out["events_growth_ratio"] = {
            q: round(ev_scaled[q] / ev_base[q], 2) for q in EVENTS_QUERIES
        }
    if family == "shardfiles":
        # r15 (VERDICT item 8): prove the shard-write REBALANCE is
        # scale-adaptive, not a local[32] constant — AQE must coalesce
        # a bench-scale batch to ~1 file AND re-expand the file count
        # data-proportionally as the shard grows toward the 64 MB
        # advisory target.  Synthesizes posting-shaped rows (long id,
        # 32-hex hash, long pos) at 1x / `copies`x / `copies`²x and
        # reports files + bytes/file per scale.
        from pyspark.sql import functions as F

        base_rows = 200_000  # ~ a sf0.1 index batch
        out["shardfiles"] = {}
        for label, rows in (
            ("1x", base_rows),
            (f"{copies}x", base_rows * copies),
            (f"{copies * copies}x", base_rows * copies * copies),
        ):
            frame = (
                spark.range(rows)
                .select(
                    F.col("id"),
                    F.md5(F.col("id").cast("string")).alias("__h"),
                    (F.col("id") % 1000).alias("__pos"),
                )
                # a compute-parallel upstream, as the index writers have
                .repartition(int(cpus))
            )
            dest = os.path.join(scaled_dir, f"shardfiles_{label}")
            from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming.shardstore import write_shard

            write_shard(frame, dest)
            files = [
                os.path.join(dest, f)
                for f in os.listdir(dest)
                if f.endswith(".parquet")
            ]
            total = sum(os.path.getsize(f) for f in files)
            out["shardfiles"][label] = {
                "rows": rows,
                "files": len(files),
                "mb_per_file": round(total / max(1, len(files)) / 2**20, 2),
            }
            shutil.rmtree(dest, ignore_errors=True)
    if family == "deep":
        # two-orders-of-magnitude check: base min-of-2, scaled single
        # run (runs are long enough that co-tenant noise is a small
        # fraction; labeled single-run in BASELINE.md)
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        make_scaled_events(SF_DIR, scaled_dir, copies)
        d_base = time_queries(spark, SF_DIR, names=DEEP_DOC_QUERIES)
        d_scaled = time_queries(
            spark, scaled_dir, runs=1, names=DEEP_DOC_QUERIES
        )
        ev_base = time_queries(spark, SF_DIR, names=DEEP_EVENT_QUERIES)
        ev_scaled = time_queries(
            spark, scaled_dir, runs=1, names=DEEP_EVENT_QUERIES
        )
        out["deep_base_sec"] = {**d_base, **ev_base}
        out["deep_scaled_sec"] = {**d_scaled, **ev_scaled}
        out["deep_growth_ratio"] = {
            q: round(out["deep_scaled_sec"][q] / out["deep_base_sec"][q], 2)
            for q in DEEP_DOC_QUERIES + DEEP_EVENT_QUERIES
        }
    if family in ("stream", "all"):
        out["streaming"] = time_streaming(spark, SF_DIR, scaled_dir)
    if family == "curve":
        # growth-curve point for the banded near-dup family: run at a
        # single ``copies`` and collect three points (e.g. 3/10/30)
        # across invocations to check the documented growth MODEL
        # (corpus x bucket-occupancy, hot keys capped) as a slope
        # rather than a single ratio.
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        names = (
            "q26_jaccard_pairs",
            "q105_containment_pairs",
            "q93_multi_signal_clusters",
        )
        c_base = time_queries(spark, SF_DIR, names=names)
        c_scaled = time_queries(spark, scaled_dir, names=names)
        out["curve_base_sec"] = c_base
        out["curve_scaled_sec"] = c_scaled
        out["curve_growth_ratio"] = {
            q: round(c_scaled[q] / c_base[q], 2) for q in names
        }
    if family == "deepdocs":
        # composition-heavy newcomers two orders up on the docs axis
        # (r10 verdict item 7): label propagation (edges ~100x),
        # keeper selection (labels + salted top-1) and the two
        # winnowing forms.  Base min-of-2, scaled single-run — the
        # deep-family protocol.
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        names = (
            "q128_label_propagation",
            "q136_cluster_keepers",
            "q137_winnowing_fingerprints",
            "q138_winnowing_pairs",
        )
        d_base = time_queries(spark, SF_DIR, names=names)
        d_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["deepdocs_base_sec"] = d_base
        out["deepdocs_scaled_sec"] = d_scaled
        out["deepdocs_growth_ratio"] = {
            q: round(d_scaled[q] / d_base[q], 2) for q in names
        }
    if family == "deepdocs2":
        # r11 late newcomers two orders up on the docs axis:
        # incremental LSH join + incremental labels, the
        # leakage-free cluster split and the repeated-span extractor.
        # (The CAPPED q140/q133 regimes live in the separate
        # "deepcapped" family below — fresh-process isolation, see
        # its comment.)  Base min-of-2, scaled single-run.
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        names = (
            "q139_lsh_incremental_join",
            "q141_incremental_labels",
            "q142_leakage_free_split",
            "q143_repeated_spans",
        )
        d_base = time_queries(spark, SF_DIR, names=names)
        d_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["deepdocs2_base_sec"] = d_base
        out["deepdocs2_scaled_sec"] = d_scaled
        out["deepdocs2_growth_ratio"] = {
            q: round(d_scaled[q] / d_base[q], 2) for q in names
        }
    if family in ("deepcapped", "deepcapped140", "deepcapped133"):
        # the two CAPPED exact-join regimes (q140 max_df / q133
        # max_df) at two orders — run as their OWN family/process:
        # in one long session the earlier 100x queries' shuffle files
        # and checkpoint blocks accumulate for the app lifetime, and
        # the saturated-vocabulary pair sort here then hits the disk
        # ceiling (measured: the combined family died SPILL_OUT_OF_
        # MEMORY/no-space at 100x while each half fits comfortably
        # alone)
        #
        # r13: scale the shuffle DOP with the data — the capped
        # verification shuffles candidate docs' FULL postings (~56 GB
        # observed at 100x), and 32 partitions make ~1.75 GB per task
        # x 32 concurrent tasks = measured JVM heap OOM in the
        # shuffle-read stage.  A cluster operator sizes
        # spark.sql.shuffle.partitions with the data (the session
        # docstring's own advice).  r13 review fix: the bump is
        # applied ONLY to the scaled run — fan_out()'s explicit
        # repartition is not AQE-coalescible, so a bumped base run
        # pays hundreds of near-empty tasks of scheduling overhead
        # and understates the growth ratio (the r13-recorded q140
        # base rise 8.2 -> 14.6 was exactly this).
        scaled_dop = str(max(int(cpus), 8 * copies))
        make_scaled_documents(SF_DIR, scaled_dir, copies)

        def _with_dop(dop: str, fn, dirpath: str) -> float:
            spark.conf.set("spark.sql.shuffle.partitions", dop)
            try:
                return fn(dirpath)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", str(cpus))

        def _run140(dirpath: str) -> float:
            from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
            from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

            t0 = time.monotonic()
            dedupe.tf_cosine_join(
                load_table(spark, dirpath, "documents"),
                "doc_id",
                "text",
                term_n=3,
                t_num=8,
                t_den=10,
                max_df=64,
            ).write.format("noop").mode("overwrite").save()
            return round(time.monotonic() - t0, 3)

        if family == "deepcapped133":
            b140 = s140 = None
        else:
            b140 = min(
                _with_dop(str(cpus), _run140, SF_DIR) for _ in range(2)
            )
            s140 = _with_dop(scaled_dop, _run140, scaled_dir)
        if b140 is not None:
            out["q140_capped_base_sec"] = b140
            out["q140_capped_scaled_sec"] = s140
            out["q140_capped_growth_ratio"] = round(s140 / b140, 2)

        # q133 with the cap ENGAGED (the r11 verdict's missing 100x
        # regime): above-cap shingles leave candidate generation only,
        # verification stays exact — same recall statement as q140's
        def _run133(dirpath: str) -> float:
            from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
            from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

            t0 = time.monotonic()
            dedupe.prefix_jaccard_join(
                load_table(spark, dirpath, "documents"),
                "doc_id",
                "text",
                shingle_n=5,
                t_num=4,
                t_den=5,
                max_df=64,
            ).write.format("noop").mode("overwrite").save()
            return round(time.monotonic() - t0, 3)

        if family != "deepcapped140":
            b133 = min(
                _with_dop(str(cpus), _run133, SF_DIR) for _ in range(2)
            )
            s133 = _with_dop(scaled_dop, _run133, scaled_dir)
            out["q133_capped_base_sec"] = b133
            out["q133_capped_scaled_sec"] = s133
            out["q133_capped_growth_ratio"] = round(s133 / b133, 2)
    if family == "mediaattr":
        # r13 attribution for the capped media matchers: how much of
        # q147's scaled time is the LINEAR synthesis+decode term
        # (WAV render -> RIFF walk -> frame energies, Arrow
        # mapInPandas) vs the capped gram-match stages?  Runs the
        # decode-only prefix and the full query on the same fixture.
        make_scaled_documents(SF_DIR, scaled_dir, copies)

        def _decode_only(dirpath: str) -> float:
            from pyspark.sql import functions as F

            from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal
            from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.parallelism import fan_out
            from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

            t0 = time.monotonic()
            d = load_table(spark, dirpath, "documents").select("doc_id", "text")
            media = multimodal.synthesize_speech_wav(fan_out(d), "doc_id", "text")
            multimodal.audio_frame_energy(media).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.monotonic() - t0, 3)

        out["q147_decode_base_sec"] = min(_decode_only(SF_DIR) for _ in range(2))
        out["q147_decode_scaled_sec"] = _decode_only(scaled_dir)
        full = time_queries(
            spark, SF_DIR, names=("q147_audio_segment_pairs",)
        )
        full_s = time_queries(
            spark, scaled_dir, runs=1, names=("q147_audio_segment_pairs",)
        )
        out["q147_full_base_sec"] = full["q147_audio_segment_pairs"]
        out["q147_full_scaled_sec"] = full_s["q147_audio_segment_pairs"]
    if family == "deepdocs3":
        # r12 arrivals on the docs axis: the two index-served gated
        # lifecycles (q144 LSH bands, q145 winnowing span postings —
        # the timed query INCLUDES the index build + compaction, so
        # the ratio prices the whole build-once-probe-once path) and
        # the two cross-modality dedup legs (q146 image dHash, q147
        # shared audio segments — synthesis + Arrow decode + banded /
        # postings join).  Base min-of-2, scaled single-run.
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        names = (
            "q144_lsh_index_served_join",
            "q145_span_index_served_join",
            "q146_image_dhash_pairs",
            "q147_audio_segment_pairs",
            "q148_video_scene_pairs",
            "q149_dhash_index_served_join",
            "q150_boundary_stitch",
            "q151_stitch_repair",
        )
        d_base = time_queries(spark, SF_DIR, names=names)
        d_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["deepdocs3_base_sec"] = d_base
        out["deepdocs3_scaled_sec"] = d_scaled
        out["deepdocs3_growth_ratio"] = {
            q: round(d_scaled[q] / d_base[q], 2) for q in names
        }
    if family == "wave13ops":
        # r13 wave-2 arrivals on both axes.  Docs axis: q154 (BPE —
        # the corpus pass grows linearly; the vocabulary grows too,
        # but only by the copy-salted replacement tokens
        # make_scaled_documents injects (every 5th token), so the
        # per-step pair aggregates grow with VOCAB, far below corpus
        # growth — the measured ratio prices corpus collapse + that
        # sub-linear vocab term) and
        # q156 (weighted sampling — the ticket explode is the linear
        # term, the top-k cut is constant).  TPC-H axis: q153 (DQ
        # report — two wide agg passes + two anti-joins, all linear),
        # q155 (snapshot diff — one full-outer join on the key) and
        # q157 (HITS — the row multiset grows but the DISTINCT
        # supplier->part edge set is copy-invariant, so growth prices
        # scan+distinct, the iterations run on the same graph).
        # Base min-of-2, scaled single-run — the deep-family protocol.
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        make_scaled_tpch_dir(SF_DIR, scaled_dir, copies)
        names = (
            "q153_dq_report",
            "q154_bpe_merge_steps",
            "q155_snapshot_diff",
            "q156_weighted_sample",
            "q157_hits_supplier_part",
        )
        d_base = time_queries(spark, SF_DIR, names=names)
        d_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["wave13ops_base_sec"] = d_base
        out["wave13ops_scaled_sec"] = d_scaled
        out["wave13ops_growth_ratio"] = {
            q: round(d_scaled[q] / d_base[q], 2) for q in names
        }
    if family == "wave13tok":
        # the tokenizer tail on the docs axis: q158 (encode join —
        # the per-source compression aggregate; the corpus pass and
        # the group-word collapse are the linear terms, the encode
        # join is vocab-sized) and q159 (vocab-index-served train —
        # build 3+1 shards, compact, train FROM the store; growth
        # prices shard builds ∝ corpus, iterations ∝ vocab).
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        names = (
            "q158_bpe_compression",
            "q159_bpe_from_vocab_index",
        )
        d_base = time_queries(spark, SF_DIR, names=names)
        d_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["wave13tok_base_sec"] = d_base
        out["wave13tok_scaled_sec"] = d_scaled
        out["wave13tok_growth_ratio"] = {
            q: round(d_scaled[q] / d_base[q], 2) for q in names
        }
    if family == "spanknobs":
        # the min_span knob users will reach for: the gated operating
        # point (k=8, w=9 -> spans >= 16 tokens) vs a tighter window
        # (k=8, w=4 -> spans >= 11).  Smaller w doubles fingerprint
        # density (2/(w+1): 0.2 -> 0.4), growing candidates and the
        # stage-2 positional volume — this family prices that curve.
        make_scaled_documents(SF_DIR, scaled_dir, copies)

        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
        from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

        def _spans(dirpath: str, w: int) -> tuple[float, int]:
            t0 = time.monotonic()
            df = dedupe.repeated_span_pairs(
                load_table(spark, dirpath, "documents"),
                "doc_id",
                "text",
                k=8,
                w=w,
                min_span=8 + w - 1,
            )
            n = df.count()
            return round(time.monotonic() - t0, 3), int(n)

        for w in (9, 4):
            b = min(_spans(SF_DIR, w)[0] for _ in range(2))
            s, n_s = _spans(scaled_dir, w)
            out[f"spans_w{w}_base_sec"] = b
            out[f"spans_w{w}_scaled_sec"] = s
            out[f"spans_w{w}_scaled_rows"] = n_s
            out[f"spans_w{w}_growth_ratio"] = round(s / b, 2)
    if family == "stitchadv":
        # adversarial boilerplate fixture for the boundary-stitch
        # operator: every doc OPENS and CLOSES with the same 20-token
        # header, so every ordered pair is a true 20-token stitch —
        # the TRUE answer is n*(n-1), quadratic by construction (the
        # q143-style regime where reporting it is the honest cost),
        # and the max_df anchor cap is the documented escape.
        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

        n = 200 * copies
        head = " ".join(f"h{j}" for j in range(20))
        pdf = pd.DataFrame(
            {
                "doc_id": range(n),
                "text": [
                    head
                    + " "
                    + " ".join(f"u{i}_{j}" for j in range(30))
                    + " "
                    + head
                    for i in range(n)
                ],
            }
        )
        adv_path = scratch_path("stitchadv", "documents.parquet")
        pdf.to_parquet(adv_path)
        adv = spark.read.parquet(adv_path)

        t0 = time.monotonic()
        n_full = dedupe.boundary_stitch_pairs(
            adv, "doc_id", "text", k=4, min_overlap=8
        ).count()
        t_full = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        n_capped = dedupe.boundary_stitch_pairs(
            adv, "doc_id", "text", k=4, min_overlap=8, max_df=64
        ).count()
        t_capped = round(time.monotonic() - t0, 3)
        out["stitchadv_docs"] = int(n)
        out["stitchadv_true_pairs"] = int(n_full)
        out["stitchadv_full_sec"] = t_full
        out["stitchadv_capped_pairs"] = int(n_capped)
        out["stitchadv_capped_sec"] = t_capped
    if family == "lifecycle":
        # the COMPOSED incremental path, per-batch wall-clock: novelty
        # gate -> index-served incremental LSH join -> incremental
        # label maintenance -> leakage-free split refresh, over 4
        # arriving batches (tests/test_lifecycle_e2e.py pins the
        # composition row-equal to the from-scratch derivation; this
        # family measures what a nightly run of it costs).  Per-batch
        # cost ∝ batch + label table + candidates — never the
        # accumulated corpus text, which is exactly the claim being
        # measured.
        make_scaled_documents(SF_DIR, scaled_dir, copies)

        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import text as TX
        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import (
            components,
            dataprep,
            dedupe,
            multimodal,
        )
        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.parallelism import fan_out
        from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import (
            corpus_ingest,
            dhash_index,
            lsh_index,
            vocab_index,
        )

        # the q150 sharded fetch-record rendering, applied to one
        # arriving batch — the SAME helper the gated queries run, so
        # knob changes to q150/q151 can't silently diverge from what
        # this lifecycle measures
        from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.wave12 import fetch_records_from_docs as _fetch_records

        def run_lifecycle(dirpath: str, tag: str) -> dict:
            root = scratch_path("lifecycle", tag, "store")
            shutil.rmtree(root, ignore_errors=True)
            d = spark.read.parquet(
                os.path.join(dirpath, "documents.parquet")
            ).select("doc_id", "text")
            store = SilverStore(spark, os.path.join(root, "corpus"))
            ingest = corpus_ingest.make_novelty_batch_ingestor(store)
            lsh_dir = os.path.join(root, "lsh_idx")
            writer = lsh_index.make_lsh_batch_writer(lsh_dir)
            dh_dir = os.path.join(root, "dhash_idx")
            dh_writer = dhash_index.make_dhash_batch_writer(dh_dir)
            vx_dir = os.path.join(root, "vocab_idx")
            vx_writer = vocab_index.make_vocab_batch_writer(vx_dir)
            labels = spark.createDataFrame([], "node long, label long")
            accepted = []
            per_batch = []
            n_batches = 4
            for b in range(n_batches):
                t0 = time.monotonic()
                batch = d.filter(F.col("doc_id") % n_batches == b)
                ingest(batch, b)
                adm = spark.read.parquet(
                    corpus_ingest.accepted_batch_path(store.root, b)
                ).select("doc_id", "text")
                edges = (
                    dedupe.lsh_incremental_join(adm, adm, "doc_id", "text")
                    .filter(F.col("batch_doc") < F.col("corpus_doc"))
                    .select(
                        F.col("batch_doc").alias("id_a"),
                        F.col("corpus_doc").alias("id_b"),
                    )
                )
                if accepted:
                    corpus_texts = accepted[0]
                    for a in accepted[1:]:
                        corpus_texts = corpus_texts.union(a)
                    cross = lsh_index.incremental_join_against_index(
                        spark, lsh_dir, corpus_texts, adm
                    ).select(
                        F.col("batch_doc").alias("id_a"),
                        F.col("corpus_doc").alias("id_b"),
                    )
                    edges = edges.union(cross)
                labels = components.incremental_labels(
                    labels, edges, rounds=8
                ).localCheckpoint()
                writer(adm, b)
                accepted.append(adm)
                corpus = accepted[0]
                for a in accepted[1:]:
                    corpus = corpus.union(a)
                dataprep.leakage_free_split(corpus, labels, "doc_id").write.format(
                    "noop"
                ).mode("overwrite").save()
                # r13 multimodal legs of the nightly:
                # (a) stitch REPAIR on the arriving batch's fetch
                #     records before they enter the corpus — cost ∝
                #     batch (the record synthesis, anchor probe and
                #     merge never touch accumulated state);
                dedupe.stitch_merge(
                    _fetch_records(batch), "doc_id", "text",
                    k=4, min_overlap=8, max_df=32,
                ).write.format("noop").mode("overwrite").save()
                # (b) the dHash image leg: decode+hash the admitted
                #     batch ONCE; answer its near-dup images FROM the
                #     stored fingerprints (zero payload re-reads),
                #     then extend the index with this batch's shard
                media = multimodal.synthesize_minhash_pgm(
                    fan_out(adm), "doc_id", "text"
                )
                if b > 0:
                    dhash_index.incremental_image_join_against_index(
                        spark, dh_dir, media, max_hamming=3
                    ).write.format("noop").mode("overwrite").save()
                dh_writer(media, b)
                # (c) the vocab leg: the admitted batch's partial word
                #     counts extend the tokenizer-training index —
                #     cost ∝ batch distinct words, never accumulated
                #     corpus text
                vx_writer(adm, b)
                per_batch.append(round(time.monotonic() - t0, 2))
            # the nightly tokenizer refresh: compact the vocab shards
            # and train the first merges entirely FROM the store
            t0 = time.monotonic()
            vocab_index.compact_vocab_shards(spark, vx_dir)
            vocab_index.bpe_merges_from_index(
                spark, vx_dir, steps=3, top=5
            ).write.format("noop").mode("overwrite").save()
            vocab_train_sec = round(time.monotonic() - t0, 2)
            n_acc = sum(a.count() for a in accepted)
            return {
                "per_batch_sec": per_batch,
                "total_sec": round(sum(per_batch) + vocab_train_sec, 2),
                "vocab_train_sec": vocab_train_sec,
                "admitted_docs": int(n_acc),
            }

        base = run_lifecycle(SF_DIR, "base")
        scaled = run_lifecycle(scaled_dir, "scaled")
        out["lifecycle_base"] = base
        out["lifecycle_scaled"] = scaled
        out["lifecycle_growth_ratio"] = round(
            scaled["total_sec"] / base["total_sec"], 2
        )
    if family == "tpchtrio":
        # the r13 TPC-H join-pipeline trio on the fact axis: the only
        # shuffle that grows is the lineitem<->orders sort-merge join
        # (every dimension chain broadcasts), so growth should track
        # the fact scan + one co-partitioned join.  Base min-of-2,
        # scaled single-run.
        make_scaled_tpch_dir(SF_DIR, scaled_dir, copies)
        names = (
            "q160_volume_shipping",
            "q161_market_share",
            "q162_product_profit",
            "q165_local_supplier_volume",
            "q166_promo_revenue_share",
            "q167_large_volume_customers",
        )
        t_base = time_queries(spark, SF_DIR, names=names)
        t_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["tpchtrio_base_sec"] = t_base
        out["tpchtrio_scaled_sec"] = t_scaled
        out["tpchtrio_growth_ratio"] = {
            q: round(t_scaled[q] / t_base[q], 2) for q in names
        }
    if family == "deeptpch":
        # fact-table axis two orders up: 100x lineitem (~60M rows) /
        # orders (~15M) over the fixed dim catalog — the axis that
        # grows at 100 TB.  Base min-of-2, scaled single-run.
        make_scaled_tpch_dir(SF_DIR, scaled_dir, copies)
        names = (
            "q49_sketch_stats",
            "q100_cheapest_regional_supplier",
            "q101_sole_late_supplier",
            "q120_bloom_semi_join",
            "q121_copurchase_lift",
            "q125_salted_topk",
        )
        t_base = time_queries(spark, SF_DIR, names=names)
        t_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["deeptpch_base_sec"] = t_base
        out["deeptpch_scaled_sec"] = t_scaled
        out["deeptpch_growth_ratio"] = {
            q: round(t_scaled[q] / t_base[q], 2) for q in names
        }
    if family == "deepann":
        # ANN operating curve two orders up: at copies=100 the tuned
        # knobs are n_clusters=800 (past HIER_AUTO_MIN_K=256, so the
        # DEFAULT auto-routes two-level assignment + blocked scoring)
        # and LSH planes 8+log2(100)~15 / 8 tables.  Lean on purpose:
        # only the what-a-caller-gets default rows, base vs scaled.
        import math

        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import similarity

        make_scaled_embeddings(SF_DIR, scaled_dir, copies)

        def run2(fn, runs=2):
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            return round(best, 2)

        base_e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        big_e = spark.read.parquet(
            os.path.join(scaled_dir, "embeddings.parquet")
        )
        extra = max(1, int(round(math.log2(copies))))
        da = {
            "lsh_base": run2(
                lambda: similarity.lsh_bucket_topk(
                    base_e, k=5, n_planes=8, n_tables=4
                )
            ),
            "lsh_scaled_tuned": run2(
                lambda: similarity.lsh_bucket_topk(
                    big_e, k=5, n_planes=8 + extra, n_tables=8
                ),
                runs=1,
            ),
            "ivf_base": run2(
                lambda: similarity.ivf_topk(base_e, k=5, n_clusters=8, nprobe=2)
            ),
            "ivf_scaled_tuned_default": run2(
                lambda: similarity.ivf_topk(
                    big_e, k=5, n_clusters=8 * copies, nprobe=2
                ),
                runs=1,
            ),
        }
        da["lsh_growth"] = round(da["lsh_scaled_tuned"] / da["lsh_base"], 2)
        da["ivf_growth"] = round(
            da["ivf_scaled_tuned_default"] / da["ivf_base"], 2
        )

        # --- quantized tier at production knobs (round-10 addition):
        # 8-bit PQ (n_sub=8, k=256 — past PQ_ENCODER_AUTO_MIN_K, so
        # the default routes the BLAS encoder), residual IVF-PQ at
        # n_clusters=8*copies, int8 SDC and binary Hamming.  Training
        # is timed SEPARATELY from search (the attribution the IVF row
        # got in r08): the PQ codebook sample is bounded
        # (train_per_centroid * k rows) regardless of corpus size, so
        # train time should be ~flat while search grows ~linearly.
        nq = 100
        q_base = base_e.filter(base_e["vec_id"] < nq)
        q_big = big_e.filter(big_e["vec_id"] < nq)

        def t_train(fn):
            t0 = time.time()
            model = fn()
            return round(time.time() - t0, 2), model

        da["pq_train_base_sec"], books_b = t_train(
            lambda: similarity.build_pq_codebooks(
                base_e, "embedding", "vec_id", n_sub=8, k=256
            )
        )
        da["pq_train_scaled_sec"], books_s = t_train(
            lambda: similarity.build_pq_codebooks(
                big_e, "embedding", "vec_id", n_sub=8, k=256
            )
        )
        da["pq_base"] = run2(
            lambda: similarity.pq_adc_topk(
                base_e, q_base, "vec_id", "embedding", books_b, k_top=5
            )
        )
        da["pq_scaled"] = run2(
            lambda: similarity.pq_adc_topk(
                big_e, q_big, "vec_id", "embedding", books_s, k_top=5
            ),
            runs=1,
        )
        da["ivfpq_train_base_sec"], model_b = t_train(
            lambda: similarity.build_ivf_pq(
                base_e, "vec_id", "embedding",
                n_clusters=8, n_sub=8, k_codes=256,
            )
        )
        da["ivfpq_train_scaled_sec"], model_s = t_train(
            lambda: similarity.build_ivf_pq(
                big_e, "vec_id", "embedding",
                n_clusters=8 * copies, n_sub=8, k_codes=256,
            )
        )
        da["ivfpq_base"] = run2(
            lambda: similarity.ivf_pq_adc_topk(
                base_e, q_base, "vec_id", "embedding",
                n_clusters=8, nprobe=2, n_sub=8, k_codes=256,
                model=model_b,
            )
        )
        da["ivfpq_scaled"] = run2(
            lambda: similarity.ivf_pq_adc_topk(
                big_e, q_big, "vec_id", "embedding",
                n_clusters=8 * copies, nprobe=2, n_sub=8, k_codes=256,
                model=model_s,
            ),
            runs=1,
        )
        da["int8_base"] = run2(
            lambda: similarity.int8_sdc_topk(
                base_e, q_base, "vec_id", "embedding", k_top=5
            )
        )
        da["int8_scaled"] = run2(
            lambda: similarity.int8_sdc_topk(
                big_e, q_big, "vec_id", "embedding", k_top=5
            ),
            runs=1,
        )
        da["hamming_base"] = run2(
            lambda: similarity.binary_hamming_topk(
                q_base, base_e, dim=64, k=5
            )
        )
        da["hamming_scaled"] = run2(
            lambda: similarity.binary_hamming_topk(
                q_big, big_e, dim=64, k=5
            ),
            runs=1,
        )
        for key in ("pq", "ivfpq", "int8", "hamming"):
            da[f"{key}_growth"] = round(
                da[f"{key}_scaled"] / da[f"{key}_base"], 2
            )
        out["deepann"] = da
    if family == "streamcompact":
        # novelty-index lifetime curve (round-10): drive ``copies``
        # micro-batches of documents through the novelty gate twice —
        # shard-per-batch with NO compaction vs compact_every=8 — and
        # record per-batch ingest seconds.  Without compaction the
        # probe reads a shard count growing linearly with batch index
        # (the r09 "next quadratic-ish term"); with it the committed
        # dir count is bounded, so per-batch time should stay ~flat.
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.medallion import SilverStore
        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import corpus_ingest

        n_batches = copies
        docs = spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        ).select("doc_id", "text")
        per_batch = max(1, docs.count() // n_batches)

        def lifetime(compact_every):
            root = os.path.join(
                scaled_dir, f"nov_{compact_every or 'off'}"
            )
            store = SilverStore(spark, root)
            ingest = corpus_ingest.make_novelty_batch_ingestor(
                store, compact_every=compact_every
            )
            times = []
            for b in range(n_batches):
                batch = docs.filter(
                    (F.col("doc_id") % n_batches) == b
                ).limit(per_batch)
                t0 = time.time()
                ingest(batch, b)
                times.append(round(time.time() - t0, 2))
            dirs = len(
                os.listdir(os.path.join(store.root, corpus_ingest.INDEX_DIR))
            )
            admitted = corpus_ingest.read_index(spark, store.root).count()
            return times, dirs, admitted

        t_off, d_off, n_off = lifetime(None)
        t_on, d_on, n_on = lifetime(8)
        h = max(1, n_batches // 5)
        out["streamcompact"] = {
            "n_batches": n_batches,
            "per_batch_rows": per_batch,
            # identical admissions either way — compaction must be
            # membership-neutral
            "admitted_off": n_off,
            "admitted_on": n_on,
            "index_dirs_off": d_off,
            "index_dirs_on": d_on,
            "batch_sec_off": t_off,
            "batch_sec_on": t_on,
            # head/tail means: the lifetime slope in two numbers
            "head_mean_off": round(sum(t_off[:h]) / h, 2),
            "tail_mean_off": round(sum(t_off[-h:]) / h, 2),
            "head_mean_on": round(sum(t_on[:h]) / h, 2),
            "tail_mean_on": round(sum(t_on[-h:]) / h, 2),
        }
    if family == "moncompact":
        # monitor-sink probe-cost-vs-shard-count (round-11): write
        # ``copies`` CUSUM batch shards, timing the merged read at
        # checkpoints along the way (the lifetime curve), then
        # compact via the segment-monoid fold and re-time.  The
        # merged statistic must be bit-identical across the
        # compaction (also pinned by tests/test_stream_monitor.py).
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import monitor

        n_batches = copies
        events = (
            spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
            .select("event_id", "event_type", F.col("value").cast("double"))
        )
        mon_dir = os.path.join(scaled_dir, "cusum_mon")
        handle = monitor.make_cusum_batch_writer(
            mon_dir, "event_type", "event_id", "value", k_scaled=1000
        )

        def t_read():
            t0 = time.time()
            monitor.read_merged_cusum(spark, mon_dir, "event_type").collect()
            return round(time.time() - t0, 3)

        curve = []
        h = max(1, n_batches // 5)
        for b in range(n_batches):
            handle(
                events.filter((F.col("event_id") % n_batches) == b), b
            )
            if (b + 1) % h == 0 or b == n_batches - 1:
                curve.append({"shards": b + 1, "read_sec": min(t_read(), t_read())})
        before = sorted(
            map(
                tuple,
                monitor.read_merged_cusum(spark, mon_dir, "event_type").collect(),
            )
        )
        stats = monitor.compact_cusum_shards(spark, mon_dir, "event_type")
        after = sorted(
            map(
                tuple,
                monitor.read_merged_cusum(spark, mon_dir, "event_type").collect(),
            )
        )
        out["moncompact"] = {
            "n_batches": n_batches,
            "probe_curve": curve,
            "dirs_before": stats["dirs_before"],
            "dirs_after": stats["dirs_after"],
            "read_sec_compacted": min(t_read(), t_read()),
            "bit_identical": before == after,
        }
    if family == "spancompact":
        # winnowing-span-index probe-cost-vs-shard-count: the
        # moncompact protocol on the fourth index leg — write
        # ``copies`` fingerprint shards, time the INDEX-SERVED
        # incremental span join along the way (the probe a daily
        # dedup batch actually pays), compact (plain-union fold),
        # re-time; served rows must be identical across compaction.
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import span_index

        n_batches = copies
        docs = (
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text")
        )
        corpus = docs.filter(F.col("doc_id") % 17 != 0)
        batch = docs.filter(F.col("doc_id") % 17 == 0)
        span_dir = os.path.join(scaled_dir, "span_idx")
        handle = span_index.make_span_batch_writer(span_dir)

        def t_probe():
            t0 = time.time()
            span_index.incremental_spans_against_index(
                spark, span_dir, corpus, batch
            ).collect()
            return round(time.time() - t0, 3)

        curve = []
        h = max(1, n_batches // 5)
        for b in range(n_batches):
            handle(
                corpus.filter((F.col("doc_id") % n_batches) == b), b
            )
            if (b + 1) % h == 0 or b == n_batches - 1:
                curve.append({"shards": b + 1, "probe_sec": min(t_probe(), t_probe())})
        before = sorted(
            map(
                tuple,
                span_index.incremental_spans_against_index(
                    spark, span_dir, corpus, batch
                ).collect(),
            )
        )
        stats = span_index.compact_span_shards(spark, span_dir)
        after = sorted(
            map(
                tuple,
                span_index.incremental_spans_against_index(
                    spark, span_dir, corpus, batch
                ).collect(),
            )
        )
        out["spancompact"] = {
            "n_batches": n_batches,
            "probe_curve": curve,
            "dirs_before": stats["dirs_before"],
            "dirs_after": stats["dirs_after"],
            "probe_sec_compacted": min(t_probe(), t_probe()),
            "row_identical": before == after,
        }
    if family == "stream10":
        # streaming throughput at 10x input: same file/trigger layout
        # (20 event files, 4 per trigger — 5 micro-batches either way)
        # so each batch carries 10x the rows.  Bounded-state operators
        # should IMPROVE rows/sec (per-batch fixed overhead amortizes);
        # a state-accumulating operator would degrade instead.
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        make_scaled_events(SF_DIR, scaled_dir, copies)
        make_scaled_embeddings(SF_DIR, scaled_dir, copies)
        out["streaming_base"] = time_streaming(
            spark, SF_DIR, os.path.join(scaled_dir, "stream_base")
        )
        out["streaming_scaled"] = time_streaming(
            spark, scaled_dir, os.path.join(scaled_dir, "stream_big")
        )
        out["throughput_ratio"] = {
            k: round(out["streaming_scaled"][k] / out["streaming_base"][k], 2)
            for k in out["streaming_base"]
            if k.endswith("_per_sec")
        }
    if family == "tpch14":
        # the round-14 decorrelation tail + the DQ anomaly gate on
        # the fact axis (100x lineitem/orders over the fixed dim
        # catalog).  Base min-of-2, scaled single-run — the tpchtrio
        # protocol.
        make_scaled_tpch_dir(SF_DIR, scaled_dir, copies)
        names = (
            "q168_custdist",
            "q169_small_quantity_revenue",
            "q170_excess_shippers",
            "q171_dormant_balances",
            "q172_dq_anomaly_gate",
        )
        t_base = time_queries(spark, SF_DIR, names=names)
        t_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["tpch14_base_sec"] = t_base
        out["tpch14_scaled_sec"] = t_scaled
        out["tpch14_growth_ratio"] = {
            q: round(t_scaled[q] / t_base[q], 2) for q in names
        }
    if family == "tpch14b":
        # round-14 wave 2: the eight TPC-H shapes completing the
        # 22-query grammar, on the fact axis (100x lineitem/orders
        # over the fixed dim catalog) — the tpchtrio protocol.
        make_scaled_tpch_dir(SF_DIR, scaled_dir, copies)
        names = (
            "q175_priority_returns",
            "q176_forecast_revenue",
            "q177_returned_item_customers",
            "q178_important_part_values",
            "q179_priority_by_status",
            "q180_top_supplier",
            "q181_part_supplier_counts",
            "q182_disjunctive_revenue",
        )
        t_base = time_queries(spark, SF_DIR, names=names)
        t_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["tpch14b_base_sec"] = t_base
        out["tpch14b_scaled_sec"] = t_scaled
        out["tpch14b_growth_ratio"] = {
            q: round(t_scaled[q] / t_base[q], 2) for q in names
        }
    if family == "cdc":
        # q183: content-defined chunking dedup on the document axis —
        # the chunker is per-row codegen (no shuffle, no UDF), so
        # growth must track the scan + the single chunk-hash
        # aggregate
        make_scaled_documents(SF_DIR, scaled_dir, copies)
        names = ("q183_cdc_chunk_dedup",)
        t_base = time_queries(spark, SF_DIR, names=names)
        t_scaled = time_queries(spark, scaled_dir, runs=1, names=names)
        out["cdc_base_sec"] = t_base
        out["cdc_scaled_sec"] = t_scaled
        out["cdc_growth_ratio"] = {
            q: round(t_scaled[q] / t_base[q], 2) for q in names
        }
    if family == "chunkstore":
        # the CDC chunk store's amortization: at ``copies``x docs the
        # store build (chunk ONCE) is the linear term; the SERVED dup
        # report reads stored hashes only, and the FIXED batch's
        # incremental probe re-chunks nothing but the batch.
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe as DD
        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import chunk_index, shardstore

        make_scaled_documents(SF_DIR, scaled_dir, copies)
        batch = (
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text")
            .filter(F.col("doc_id") % 19 == 0)
        )

        def _measure(dirpath: str, tag: str) -> None:
            docs = spark.read.parquet(
                os.path.join(dirpath, "documents.parquet")
            ).select("doc_id", "text")
            root = os.path.join(scaled_dir, f"chunk_idx_{tag}")
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.time()
            writer = chunk_index.make_chunk_batch_writer(root)
            shardstore.build_shards_concurrently(
                writer,
                [(b, docs.filter(F.col("doc_id") % 3 == b)) for b in range(3)],
            )
            chunk_index.compact_chunk_shards(spark, root)
            t_build = round(time.time() - t0, 3)
            t0 = time.time()
            chunk_index.dup_chunks_from_index(spark, root).write.format(
                "noop"
            ).mode("overwrite").save()
            t_serve = round(time.time() - t0, 3)
            t0 = time.time()
            chunk_index.incremental_dup_chunks_against_index(
                spark, root, batch
            ).write.format("noop").mode("overwrite").save()
            t_probe = round(time.time() - t0, 3)
            t0 = time.time()
            DD.cdc_dup_chunks(docs, "doc_id", "text").write.format(
                "noop"
            ).mode("overwrite").save()
            t_recompute = round(time.time() - t0, 3)
            out[f"chunkstore_{tag}"] = {
                "build_sec": t_build,
                "serve_sec": t_serve,
                "probe_sec": t_probe,
                "recompute_sec": t_recompute,
            }

        _measure(SF_DIR, "base")
        _measure(scaled_dir, "scaled")
        b, s = out["chunkstore_base"], out["chunkstore_scaled"]
        out["chunkstore_probe_growth"] = round(
            s["probe_sec"] / b["probe_sec"], 2
        )
        out["chunkstore_serve_vs_recompute_scaled"] = round(
            s["serve_sec"] / s["recompute_sec"], 3
        )
    if family == "audioprobe":
        # q174's amortization claim, measured: a FIXED arriving batch
        # (the base corpus's doc_id % 13 == 0 slice) probed against
        # the stored postings of a ``copies``x corpus.  The probe
        # decodes only the batch and map-side joins the broadcast
        # batch postings past the posting scan, so its cost must grow
        # FAR slower than the corpus (the scan term is a payload-free
        # parquet read); the recomputing alternative re-decodes the
        # whole corpus per run.
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal
        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.parallelism import fan_out
        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import audio_index, shardstore

        make_scaled_documents(SF_DIR, scaled_dir, copies)
        batch = (
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text")
            .filter(F.col("doc_id") % 13 == 0)
        )
        media = multimodal.synthesize_speech_wav(
            fan_out(batch), "doc_id", "text"
        )

        def _measure(dirpath: str, tag: str) -> None:
            corpus = (
                spark.read.parquet(os.path.join(dirpath, "documents.parquet"))
                .select("doc_id", "text")
                .filter(F.col("doc_id") % 13 != 0)
            )
            root = os.path.join(scaled_dir, f"audio_probe_{tag}")
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.time()
            writer = audio_index.make_audio_doc_batch_writer(root, k=4)
            shardstore.build_shards_concurrently(
                writer,
                [(b, corpus.filter(F.col("doc_id") % 3 == b)) for b in range(3)],
            )
            audio_index.compact_audio_shards(spark, root)
            t_build = round(time.time() - t0, 3)
            t0 = time.time()
            audio_index.incremental_segments_against_index(
                spark, root, media, k=4, min_frames=8, max_df=32
            ).write.format("noop").mode("overwrite").save()
            t_probe = round(time.time() - t0, 3)
            out[f"audioprobe_{tag}"] = {
                "build_sec": t_build,
                "probe_sec": t_probe,
            }

        _measure(SF_DIR, "base")
        _measure(scaled_dir, "scaled")
        out["audioprobe_probe_growth"] = round(
            out["audioprobe_scaled"]["probe_sec"]
            / out["audioprobe_base"]["probe_sec"],
            2,
        )
    if family == "audioidx":
        # the audio feature store's amortization claim, measured: at
        # ``copies``x documents, the store build (decode ONCE) is the
        # linear term, and the SERVED match stage must cost a small
        # fraction of the full recomputing operator (which re-decodes
        # every payload per run).  Store build at the scaled corpus =
        # 3 concurrent doc shards + compaction (the q173 lifecycle);
        # serve and recompute timed on the same session.
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal
        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.parallelism import fan_out
        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import audio_index, shardstore

        make_scaled_documents(SF_DIR, scaled_dir, copies)

        def _measure(dirpath: str, tag: str) -> None:
            docs = spark.read.parquet(
                os.path.join(dirpath, "documents.parquet")
            ).select("doc_id", "text")
            root = os.path.join(scaled_dir, f"audio_idx_{tag}")
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.time()
            writer = audio_index.make_audio_doc_batch_writer(root, k=4)
            shardstore.build_shards_concurrently(
                writer,
                [(b, docs.filter(F.col("doc_id") % 3 == b)) for b in range(3)],
            )
            t_build = round(time.time() - t0, 3)
            t0 = time.time()
            audio_index.compact_audio_shards(spark, root)
            t_compact = round(time.time() - t0, 3)
            t0 = time.time()
            audio_index.segments_from_index(
                spark, root, k=4, min_frames=8, max_df=32
            ).write.format("noop").mode("overwrite").save()
            t_serve = round(time.time() - t0, 3)
            t0 = time.time()
            multimodal.audio_segment_pairs(
                multimodal.synthesize_speech_wav(
                    fan_out(docs), "doc_id", "text"
                ),
                k=4,
                min_frames=8,
                max_df=32,
            ).write.format("noop").mode("overwrite").save()
            t_recompute = round(time.time() - t0, 3)
            out[f"audioidx_{tag}"] = {
                "build_sec": t_build,
                "compact_sec": t_compact,
                "serve_sec": t_serve,
                "recompute_sec": t_recompute,
            }

        _measure(SF_DIR, "base")
        _measure(scaled_dir, "scaled")
        b, s = out["audioidx_base"], out["audioidx_scaled"]
        out["audioidx_serve_growth"] = round(s["serve_sec"] / b["serve_sec"], 2)
        out["audioidx_serve_vs_recompute_scaled"] = round(
            s["serve_sec"] / s["recompute_sec"], 3
        )
    if family == "ratesource":
        # non-file streaming source (r13 verdict "missing" #3): the
        # deterministic rate-micro-batch source (rowsPerBatch pinned,
        # no wall-clock dependence in batch CONTENT) drives the two
        # stateful building blocks the file-backed stream10 table
        # measures, so the throughput rows become portable beyond
        # this sandbox's filesystem.  ``copies`` scales rows/batch;
        # reported as rows/sec over the drained-batch wall clock.
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ingest

        rows_per_batch = 100_000 * copies
        n_batches = 10

        def _rate_events():
            # shape the rate rows like the events table: value is the
            # monotonically increasing row id, all columns derive
            # deterministically from it
            raw = (
                spark.readStream.format("rate-micro-batch")
                .option("rowsPerBatch", rows_per_batch)
                .option("numPartitions", int(cpus))
                .load()
            )
            return raw.select(
                F.col("value").alias("event_id"),
                F.concat(F.lit("type_"), (F.col("value") % 8)).alias(
                    "event_type"
                ),
                (F.col("value") % 1000).cast("double").alias("value"),
                F.col("timestamp").alias("ts"),
            )

        def _drain(df, tag: str) -> None:
            sink = os.path.join(scaled_dir, f"rate_{tag}")
            q = (
                df.writeStream.format("noop")
                .option("checkpointLocation", os.path.join(sink, "ckpt"))
                .outputMode("update")
                .trigger(processingTime="0 seconds")
                .start()
            )
            t0 = time.time()
            done = 0
            while done < n_batches and time.time() - t0 < 300:
                time.sleep(0.2)
                done = len([p for p in q.recentProgress if p["numInputRows"] > 0])
            q.stop()
            q.awaitTermination()
            wall = time.time() - t0
            rows = sum(p["numInputRows"] for p in q.recentProgress)
            out[f"rate_{tag}_rows"] = rows
            out[f"rate_{tag}_rows_per_sec"] = round(rows / wall, 1)

        _drain(ingest.windowed_event_counts(_rate_events()), "window")
        _drain(ingest.dedupe_event_stream(_rate_events()), "dedup")
    if family == "q149attr":
        # q145-style lifecycle attribution for q149 (the r13 verdict's
        # item: the headline was dominated by store wipe + PGM
        # synthesis, i.e. harness cost).  Stages at SF_DIR: corpus
        # synthesis+hash (the decode term), shard build (3 concurrent
        # writers, includes synthesis), compaction, and the SERVED
        # probe (batch synthesis + banded join against the stored
        # fingerprints) — the operator the headline should reflect.
        from pyspark.sql import functions as F

        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal
        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.parallelism import fan_out
        from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import dhash_index, shardstore

        docs = spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        ).select("doc_id", "text")
        corpus = docs.filter(F.col("doc_id") % 13 != 0)
        batch = docs.filter(F.col("doc_id") % 13 == 0)
        root = os.path.join(scaled_dir, "q149_idx")

        def _run() -> dict:
            shutil.rmtree(root, ignore_errors=True)
            r: dict = {}
            t0 = time.time()
            multimodal.dhash_bands_from_pgm(
                multimodal.synthesize_minhash_pgm(
                    fan_out(corpus), "doc_id", "text"
                )
            ).write.format("noop").mode("overwrite").save()
            r["synthesis_hash_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            writer = dhash_index.make_dhash_batch_writer(root)
            shardstore.build_shards_concurrently(
                writer,
                [
                    (
                        b,
                        multimodal.synthesize_minhash_pgm(
                            fan_out(corpus.filter(F.col("doc_id") % 3 == b)),
                            "doc_id",
                            "text",
                        ),
                    )
                    for b in range(3)
                ],
            )
            r["build_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            dhash_index.compact_dhash_shards(spark, root)
            r["compact_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            dhash_index.incremental_image_join_against_index(
                spark,
                root,
                multimodal.synthesize_minhash_pgm(
                    fan_out(batch), "doc_id", "text"
                ),
            ).write.format("noop").mode("overwrite").save()
            r["probe_sec"] = round(time.time() - t0, 3)
            return r

        a, b2 = _run(), _run()  # min-of-2 per stage
        out["q149attr"] = {
            k: min(a[k], b2[k]) for k in a
        }
    print(json.dumps(out))
    shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

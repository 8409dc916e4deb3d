"""Round-13 query wave (q152).

- q152 index-served IVF ANN top-k — the SIXTH index-served lifecycle,
  closing the r12 verdict's gap: ``streaming/ann_index.py`` maintained
  IVF postings (per-batch shards, compaction, retrain/epoch-swap) but
  no registry query SERVED top-k from the stored index.  The query
  trains the coarse quantizer on the corpus split
  (``operators/similarity.build_ivf_centroids`` — bounded lowest-md5
  sample, dyadic-snapped Lloyd means), initializes an EPOCH-MANAGED
  store, backfills the corpus as three concurrent per-batch posting
  shards, compacts them, and answers the arriving batch's top-k FROM
  the stored postings via
  ``streaming/ann_index.ivf_topk_against_index`` — one K x dim
  distance pass over the batch, a ``cluster``-key join against the
  postings, zero corpus re-reads.  The oracle replays the RECOMPUTING
  construction (the q48 quantizer prefix restricted to the corpus
  split + batch-vs-corpus probe/score/rank), so the hash gate pins
  index-served ≡ recomputed ``ivf_topk`` under the same frozen
  quantizer.

Uses the q144/q149 ``% 13`` batch split on ``vec_id`` (embeddings
table) and the same exact flat small-K configuration as q48
(K=8, nprobe=2, k=5) so every arithmetic step stays on the
bit-replayable path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import similarity
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.llm_ops import (
    _UNIT,
    _q48_quantizer_prefix,
    _q48_ranked,
    Q48_ITERS,
)
from hospital_data_engineering_pipeline_end_to_end_project_spark.scratch import scratch_path
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table
from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import ann_index, shardstore

QUERIES: dict = {}
ORACLES: dict = {}

#: batch split (matches the wave12 index-served queries)
_BATCH_MOD = 13

#: the corpus backfill arrives as this many per-batch shards
_N_INDEX_BATCHES = 3

#: q48's exact flat configuration — small-K keeps the quantizer and
#: the scorer on the bit-replayable path the oracle re-derives
_Q152_CLUSTERS = 8
_Q152_NPROBE = 2
_Q152_K = 5


def _fresh_store(tag: str, sf_dir: str) -> str:
    root = scratch_path(tag, os.path.basename(os.path.normpath(sf_dir)), "idx")
    shutil.rmtree(root, ignore_errors=True)
    return root


def q152_ivf_index_served_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % _BATCH_MOD != 0)
    batch = e.filter(F.col("vec_id") % _BATCH_MOD == 0)
    root = _fresh_store("q152", sf_dir)
    cents = similarity.build_ivf_centroids(
        corpus, "embedding", "vec_id", _Q152_CLUSTERS
    )
    ann_index.init_ivf_store(root, cents)
    writer = ann_index.make_ivf_batch_writer(root)
    shardstore.build_shards_concurrently(
        writer,
        [
            (b, corpus.filter(F.col("vec_id") % _N_INDEX_BATCHES == b))
            for b in range(_N_INDEX_BATCHES)
        ],
    )
    ann_index.compact_ivf_shards(spark, root)
    out = ann_index.ivf_topk_against_index(
        spark, root, batch, k=_Q152_K, nprobe=_Q152_NPROBE
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


#: the oracle replays the recompute: quantizer trained/assigned on the
#: corpus split, batch vectors ranked against the SAME final centroids
#: for their probe cells, cosine over unit vectors, dense rank cut
Q152_SQL = f"""
WITH {_q48_quantizer_prefix(f" WHERE vec_id % {_BATCH_MOD} <> 0")},
bv AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings
       WHERE vec_id % {_BATCH_MOD} = 0),
bnv AS (SELECT vec_id, {_UNIT.format(v='dv')} AS nv FROM bv),
rb AS ({_q48_ranked(f"c{Q48_ITERS}l", src="bv")}),
probes AS (SELECT vec_id, c AS probe_cluster FROM rb WHERE rn <= {_Q152_NPROBE}),
cand AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(qn.nv, cn.nv), 6) AS cos_sim
  FROM probes p
  JOIN assigned c ON p.probe_cluster = c.cluster AND p.vec_id <> c.vec_id
  JOIN bnv qn ON qn.vec_id = p.vec_id
  JOIN nv cn ON cn.vec_id = c.vec_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {_Q152_K}
"""

QUERIES["q152_ivf_index_served_topk"] = q152_ivf_index_served_topk
ORACLES["q152_ivf_index_served_topk"] = Q152_SQL

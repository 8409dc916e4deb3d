"""Round-13 query wave (q152-q159, q163, q164).

- q163 per-batch DQ constraint history — the q153 report per
  arriving batch through the monitor store
  (streaming/monitor.py:dq_monitor_sink); the oracle replays each
  batch's aggregates, pinning stored reports ≡ recomputed.

- q153 Deequ-shaped DQ constraint report (operators/profiling.py) —
  every intra-table check in ONE wide aggregate pass per table, FK
  containment as AQE-broadcast anti-join counts.
- q154 distributed BPE merge training (operators/tokenizer.py) — one
  corpus->vocab collapse, then vocab-sized integer pair aggregates +
  an exact greedy left-to-right merge fold; the oracle replays every
  step via list_reduce.
- q155 snapshot diff / CDC reconciliation (operators/reconcile.py) —
  one full-outer join, null-safe change flags, O(columns) summary.
- q156 weight-proportional sampling without replacement
  (operators/dataprep.py:weighted_minhash_sample) — bottom-k minwise
  hashing over unit copies, md5-hex string order.
- q157 bipartite HITS in integer fixed point
  (operators/components.py:hits_bipartite_fixed) — per-half-step L1
  normalization at scale 1e9 bounds every product under 2^63.
- q158 BPE encode/compression by source — the learned merges applied
  through a vocab-sized join, never a per-occurrence re-fold.
- q159 BPE served FROM the incremental word-frequency index
  (streaming/vocab_index.py) — the SEVENTH index-served lifecycle;
  steps=4 so its gated rows are not a copy of q154's.
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


# ---------------------------------------------------------------------------
# Round-13 wave 2 (q153+): pipeline-gate + tokenizer-training ops
# ---------------------------------------------------------------------------

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import (  # noqa: E402
    components,
    dataprep,
    profiling,
    reconcile,
    tokenizer,
)
from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.wave11 import TOKS_SQL  # noqa: E402


def q153_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-shaped data-quality gate over orders + lineitem: all
    intra-table checks in one wide aggregate pass per table, FK
    containment as anti-join counts (see operators/profiling.py)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    rep_o = profiling.profile_report(
        o,
        "orders",
        complete_cols=["o_custkey", "o_orderdate"],
        unique_cols=["o_orderkey"],
        compliance=[
            ("o_orderstatus", "domain", F.col("o_orderstatus").isin("O", "F", "P")),
            ("o_totalprice", "positive", F.col("o_totalprice") > 0),
        ],
    )
    rep_l = profiling.profile_report(
        li,
        "lineitem",
        complete_cols=["l_quantity"],
        compliance=[
            ("l_discount", "range", F.col("l_discount").between(0.0, 0.1)),
            ("l_quantity", "range", F.col("l_quantity").between(1.0, 50.0)),
            ("l_extendedprice", "positive", F.col("l_extendedprice") > 0),
        ],
    )
    fk_l = profiling.fk_containment_report(li, "lineitem", "l_orderkey", o, "o_orderkey")
    fk_o = profiling.fk_containment_report(o, "orders", "o_custkey", cust, "c_custkey")
    return rep_o.unionByName(rep_l).unionByName(fk_l).unionByName(fk_o)


Q153_SQL = """
WITH o AS (
  SELECT count(*) AS n, count(o_custkey) AS nn_ck, count(o_orderdate) AS nn_od,
         count(DISTINCT o_orderkey) AS nd_ok,
         sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS c1
  FROM orders
),
l AS (
  SELECT count(*) AS n, count(l_quantity) AS nn_q,
         sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) AS c2
  FROM lineitem
),
fk_l AS (SELECT count(*) AS orphans FROM lineitem li
         WHERE NOT EXISTS (SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey)),
fk_o AS (SELECT count(*) AS orphans FROM orders oo
         WHERE NOT EXISTS (SELECT 1 FROM customer cc WHERE cc.c_custkey = oo.o_custkey))
SELECT 'orders' AS tbl, '*' AS col, 'row_count' AS chk, n::BIGINT AS value, n > 0 AS ok FROM o
UNION ALL SELECT 'orders', 'o_custkey', 'completeness', ((nn_ck * 1000000) // n)::BIGINT, coalesce(n > 0 AND nn_ck = n, false) FROM o
UNION ALL SELECT 'orders', 'o_orderdate', 'completeness', ((nn_od * 1000000) // n)::BIGINT, coalesce(n > 0 AND nn_od = n, false) FROM o
UNION ALL SELECT 'orders', 'o_orderkey', 'uniqueness', ((nd_ok * 1000000) // n)::BIGINT, coalesce(n > 0 AND nd_ok = n, false) FROM o
UNION ALL SELECT 'orders', 'o_orderstatus', 'domain', ((c0 * 1000000) // n)::BIGINT, coalesce(n > 0 AND c0 = n, false) FROM o
UNION ALL SELECT 'orders', 'o_totalprice', 'positive', ((c1 * 1000000) // n)::BIGINT, coalesce(n > 0 AND c1 = n, false) FROM o
UNION ALL SELECT 'lineitem', '*', 'row_count', n::BIGINT, n > 0 FROM l
UNION ALL SELECT 'lineitem', 'l_quantity', 'completeness', ((nn_q * 1000000) // n)::BIGINT, coalesce(n > 0 AND nn_q = n, false) FROM l
UNION ALL SELECT 'lineitem', 'l_discount', 'range', ((c0 * 1000000) // n)::BIGINT, coalesce(n > 0 AND c0 = n, false) FROM l
UNION ALL SELECT 'lineitem', 'l_quantity', 'range', ((c1 * 1000000) // n)::BIGINT, coalesce(n > 0 AND c1 = n, false) FROM l
UNION ALL SELECT 'lineitem', 'l_extendedprice', 'positive', ((c2 * 1000000) // n)::BIGINT, coalesce(n > 0 AND c2 = n, false) FROM l
UNION ALL SELECT 'lineitem', 'l_orderkey', 'fk_containment', orphans::BIGINT, orphans = 0 FROM fk_l
UNION ALL SELECT 'orders', 'o_custkey', 'fk_containment', orphans::BIGINT, orphans = 0 FROM fk_o
"""


def q154_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merges trained distributed over the documents
    corpus: one corpus pass collapses to the (word, freq) vocab, each
    step is a vocab-sized pair-count aggregate + an in-plan one-row
    winner join + a pure-Column greedy merge fold (see
    operators/tokenizer.py)."""
    d = load_table(spark, sf_dir, "documents")
    return tokenizer.bpe_train_steps(d, "text", steps=3, top=5)


def _bpe_pair_cte(words: str, tag: str) -> str:
    return f"""
sy_{tag} AS (SELECT freq, list_filter(string_split(sym, ' '), x -> x <> '') AS s FROM {words}),
pr_{tag} AS (SELECT freq, unnest([{{'a': s[i], 'b': s[i + 1]}} FOR i IN range(1, len(s))], recursive := true)
             FROM sy_{tag} WHERE len(s) >= 2),
ct_{tag} AS (SELECT a, b, sum(freq)::BIGINT AS cnt FROM pr_{tag} GROUP BY a, b),
rk_{tag} AS (SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC) AS rn FROM ct_{tag})"""


def _bpe_merge_cte(words: str, tag: str, out: str) -> str:
    # LEFT JOIN ON true, not a cross join — mirrors the Spark side's
    # c9930fe fix: a step with no pairs has an EMPTY winner, and a
    # cross join would silently empty the oracle's vocabulary; null
    # t.a/t.b make the CASE condition null, i.e. a no-op merge
    return f"""
{out} AS (
  SELECT w.word, w.freq,
         list_reduce(
           list_prepend('', list_filter(string_split(w.sym, ' '), x -> x <> '')),
           (acc, x) -> CASE WHEN x = t.b AND ends_with(acc, ' ' || t.a)
                       THEN substr(acc, 1, len(acc) - len(t.a) - 1) || ' ' || t.a || t.b
                       ELSE acc || ' ' || x END) AS sym
  FROM {words} w LEFT JOIN (SELECT a, b FROM rk_{tag} WHERE rn = 1) t ON true
)"""


def _bpe_chain_ctes(steps: int) -> str:
    """The shared train chain: corpus -> (word, freq) -> spaced
    symbols, then per step a pair-count/rank CTE and a merge CTE —
    ``rk_1..rk_steps`` rank each step's pairs, ``w_{steps+1}`` is the
    vocab with all merges applied (unreferenced CTEs cost nothing)."""
    parts = [
        f"tok AS (SELECT unnest({TOKS_SQL}) AS word FROM documents)",
        "wf AS (SELECT word AS w, count(*)::BIGINT AS freq FROM tok GROUP BY word)",
        # [\s\S], not '.': mirrors operators/tokenizer.py's
        # _spaced_symbols — Java-dot vs RE2-dot disagree on \r and the
        # unicode line separators, and the two classes must match
        "w_1 AS (SELECT w AS word, freq,"
        " regexp_replace(w, '([\\s\\S])', ' \\1', 'g') AS sym FROM wf)",
    ]
    for i in range(1, steps + 1):
        parts.append(_bpe_pair_cte(f"w_{i}", str(i)))
        parts.append(_bpe_merge_cte(f"w_{i}", str(i), f"w_{i + 1}"))
    return ",\n".join(parts)


def _bpe_steps_sql(steps: int, top: int = 5) -> str:
    selects = [
        f"SELECT {i} AS step, a, b, cnt, (rn = 1) AS merged FROM rk_{i} WHERE rn <= {top}"
        for i in range(1, steps + 1)
    ]
    return (
        f"WITH {_bpe_chain_ctes(steps)}\n"
        "SELECT step, a, b, cnt, merged FROM (\n"
        + "\nUNION ALL ".join(selects)
        + "\n)"
    )


Q154_SQL = _bpe_steps_sql(3, top=5)


#: q155 snapshot synthesis: old = orders minus the %11 keys; new =
#: orders minus the %13 keys with two deterministic column mutations
#: (+10.0 price on %7 keys, re-prefixed priority on %5 keys) — every
#: diff status arises and the mutations are exact float/string ops
#: (no cross-engine rounding surface)
_Q155_COMPARE = [
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def q155_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 11 != 0)
    new = (
        o.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(10.0)
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") % 5 == 0,
                F.concat(F.lit("X-"), F.col("o_orderpriority")),
            ).otherwise(F.col("o_orderpriority")),
        )
    )
    diff = reconcile.snapshot_diff(old, new, ["o_orderkey"], _Q155_COMPARE)
    return reconcile.diff_summary(diff, _Q155_COMPARE)


Q155_SQL = """
WITH old AS (SELECT * FROM orders WHERE o_orderkey % 11 <> 0),
new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
         o_orderdate,
         CASE WHEN o_orderkey % 5 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 13 <> 0
),
j AS (
  SELECT o.o_orderkey AS ko, n.o_orderkey AS kn,
         (o.o_custkey IS DISTINCT FROM n.o_custkey) AS d_ck,
         (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus) AS d_os,
         (o.o_totalprice IS DISTINCT FROM n.o_totalprice) AS d_tp,
         (o.o_orderdate IS DISTINCT FROM n.o_orderdate) AS d_od,
         (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority) AS d_op
  FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
),
s AS (
  SELECT CASE WHEN ko IS NULL THEN 'added'
              WHEN kn IS NULL THEN 'removed'
              WHEN d_ck OR d_os OR d_tp OR d_od OR d_op THEN 'changed'
              ELSE 'unchanged' END AS status,
         (ko IS NOT NULL AND kn IS NOT NULL) AS both_sides,
         d_ck, d_os, d_tp, d_od, d_op
  FROM j
)
SELECT 'added' AS metric, sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT AS n FROM s
UNION ALL SELECT 'removed', sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT FROM s
UNION ALL SELECT 'changed', sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT FROM s
UNION ALL SELECT 'unchanged', sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT FROM s
UNION ALL SELECT 'changed:o_custkey', sum(CASE WHEN both_sides AND d_ck THEN 1 ELSE 0 END)::BIGINT FROM s
UNION ALL SELECT 'changed:o_orderstatus', sum(CASE WHEN both_sides AND d_os THEN 1 ELSE 0 END)::BIGINT FROM s
UNION ALL SELECT 'changed:o_totalprice', sum(CASE WHEN both_sides AND d_tp THEN 1 ELSE 0 END)::BIGINT FROM s
UNION ALL SELECT 'changed:o_orderdate', sum(CASE WHEN both_sides AND d_od THEN 1 ELSE 0 END)::BIGINT FROM s
UNION ALL SELECT 'changed:o_orderpriority', sum(CASE WHEN both_sides AND d_op THEN 1 ELSE 0 END)::BIGINT FROM s
"""


_Q156_K = 100
_Q156_UNIT = 8
_Q156_SALT = "ws1"


def q156_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement over documents,
    weight = n_chars (longer docs proportionally likelier) — exact
    bottom-k minwise hashing over unit copies, md5-hex string order
    (see operators/dataprep.py:weighted_minhash_sample)."""
    d = load_table(spark, sf_dir, "documents")
    return dataprep.weighted_minhash_sample(
        d, "doc_id", "n_chars", k=_Q156_K, unit=_Q156_UNIT, salt=_Q156_SALT
    )


Q156_SQL = f"""
WITH c AS (SELECT doc_id, greatest(1, 1 + n_chars // {_Q156_UNIT}) AS copies FROM documents),
tk AS (SELECT doc_id, unnest(range(copies)) AS j FROM c),
k AS (SELECT doc_id,
             min(md5('{_Q156_SALT}' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))) AS wkey
      FROM tk GROUP BY doc_id)
SELECT doc_id, wkey FROM k ORDER BY wkey ASC, doc_id ASC LIMIT {_Q156_K}
"""


_Q157_SCALE = 10**9
_Q157_ITER = 3


def q157_hits_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the supplier->part supply graph
    (distinct lineitem pairs): hubs = suppliers anchoring the popular
    parts, authorities = parts backed by strong suppliers.  Integer
    fixed-point like q123's PageRank (see
    operators/components.py:hits_bipartite_fixed)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_suppkey", "l_partkey")
    return components.hits_bipartite_fixed(
        edges,
        "l_suppkey",
        "l_partkey",
        iterations=_Q157_ITER,
        scale=_Q157_SCALE,
    )


def _q157_step(i: int) -> str:
    prev_h = f"h{i - 1}n"
    return f"""
a{i} AS MATERIALIZED (SELECT p, sum(h)::BIGINT AS a FROM ed JOIN {prev_h} USING (s) GROUP BY p),
a{i}n AS MATERIALIZED (SELECT p, ((a * {_Q157_SCALE}) // (SELECT sum(a) FROM a{i}))::BIGINT AS a FROM a{i}),
h{i} AS MATERIALIZED (SELECT s, sum(a)::BIGINT AS h FROM ed JOIN a{i}n USING (p) GROUP BY s),
h{i}n AS MATERIALIZED (SELECT s, ((h * {_Q157_SCALE}) // (SELECT sum(h) FROM h{i}))::BIGINT AS h FROM h{i})"""


Q157_SQL = f"""
WITH ed AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
h0 AS (SELECT s, {_Q157_SCALE}::BIGINT AS h FROM (SELECT DISTINCT s FROM ed)),
h0n AS MATERIALIZED (SELECT s, ((h * {_Q157_SCALE}) // (SELECT sum(h) FROM h0))::BIGINT AS h FROM h0),
{",".join(_q157_step(i) for i in range(1, _Q157_ITER + 1))}
SELECT 'hub' AS side, s AS id, h AS score FROM h{_Q157_ITER}n
UNION ALL
SELECT 'auth' AS side, p AS id, a AS score FROM a{_Q157_ITER}n
"""


QUERIES["q153_dq_report"] = q153_dq_report
ORACLES["q153_dq_report"] = Q153_SQL
QUERIES["q154_bpe_merge_steps"] = q154_bpe_merge_steps
ORACLES["q154_bpe_merge_steps"] = Q154_SQL
QUERIES["q155_snapshot_diff"] = q155_snapshot_diff
ORACLES["q155_snapshot_diff"] = Q155_SQL
QUERIES["q156_weighted_sample"] = q156_weighted_sample
ORACLES["q156_weighted_sample"] = Q156_SQL
QUERIES["q157_hits_supplier_part"] = q157_hits_supplier_part
ORACLES["q157_hits_supplier_part"] = Q157_SQL


def q158_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode-side payoff of q154's merges: per SOURCE character ->
    BPE-symbol compression after the 3 learned merges.  The encode is
    a join against the vocab-sized final merge table — corpus text is
    folded exactly once per DISTINCT word at train time, never
    re-folded per occurrence (see
    operators/tokenizer.py:bpe_compression_by_group)."""
    d = load_table(spark, sf_dir, "documents")
    _steps, vocab = tokenizer.bpe_train_from_vocab(
        tokenizer.word_freqs(d, "text"), steps=3, top=5
    )
    return tokenizer.bpe_compression_by_group(d, "source", "text", vocab)


Q158_SQL = f"""
WITH {_bpe_chain_ctes(3)},
swf AS (
  SELECT source, word, count(*)::BIGINT AS f
  FROM (SELECT source, unnest({TOKS_SQL}) AS word FROM documents)
  GROUP BY source, word
),
enc AS (
  SELECT word,
         len(word)::BIGINT AS nc,
         len(list_filter(string_split(sym, ' '), x -> x <> ''))::BIGINT AS ns
  FROM w_4
)
SELECT source,
       sum(swf.f * enc.nc)::BIGINT AS chars,
       sum(swf.f * enc.ns)::BIGINT AS tokens,
       round((sum(swf.f * enc.nc)::DOUBLE) / (sum(swf.f * enc.ns)::DOUBLE), 6) AS ratio
FROM swf JOIN enc USING (word)
GROUP BY source
"""


#: q159: the corpus split arrives as three per-batch vocab shards,
#: the probe batch as a fourth; training runs FROM the compacted
#: store.  steps=4 differentiates the gated row set from q154's
#: (the wave12 rule: an index-served query must not emit a copy of
#: its recomputing sibling's rows).
_Q159_STEPS = 4


def q159_bpe_from_vocab_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-4 BPE merges served entirely FROM the stored vocabulary
    index — the SEVENTH index-served lifecycle (build 3 corpus shards
    concurrently -> ingest the arriving batch as a 4th -> compact ->
    train with zero corpus re-reads).  The oracle replays the
    recomputing 4-step train over the full corpus, so the hash gate
    pins index-served ≡ recomputed."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import vocab_index

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % _BATCH_MOD != 0)
    batch = d.filter(F.col("doc_id") % _BATCH_MOD == 0)
    root = _fresh_store("q159", sf_dir)
    writer = vocab_index.make_vocab_batch_writer(root)
    shardstore.build_shards_concurrently(
        writer,
        [
            (b, corpus.filter(F.col("doc_id") % 3 == b))
            for b in range(3)
        ],
    )
    writer(batch, 3)
    vocab_index.compact_vocab_shards(spark, root)
    return vocab_index.bpe_merges_from_index(
        spark, root, steps=_Q159_STEPS, top=5
    )


Q159_SQL = _bpe_steps_sql(_Q159_STEPS, top=5)


QUERIES["q158_bpe_compression"] = q158_bpe_compression
ORACLES["q158_bpe_compression"] = Q158_SQL
QUERIES["q159_bpe_from_vocab_index"] = q159_bpe_from_vocab_index
ORACLES["q159_bpe_from_vocab_index"] = Q159_SQL


#: q163: per-batch DQ constraint history — orders arrives as 4
#: batches (o_orderkey % 4), each through the q153-shaped report into
#: the monitor store; the query reads the accumulated series.  The
#: oracle replays each batch's aggregates, so the hash gate pins the
#: stored per-batch reports ≡ recomputed batch-mode reports.
_Q163_BATCHES = 4


def q163_dq_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality over TIME: the q153 constraint report per arriving
    batch, served from the monitor store
    (streaming/monitor.py:dq_monitor_sink) — the completeness
    regression tonight's load introduces is a hard step in this
    series while staying invisible to a whole-table fraction."""
    from hospital_data_engineering_pipeline_end_to_end_project_spark.streaming import monitor

    o = load_table(spark, sf_dir, "orders")
    root = _fresh_store("q163", sf_dir)

    def report(batch_df: DataFrame) -> DataFrame:
        return profiling.profile_report(
            batch_df,
            "orders",
            complete_cols=["o_custkey"],
            unique_cols=["o_orderkey"],
            compliance=[
                ("o_totalprice", "positive", F.col("o_totalprice") > 0),
            ],
        )

    writer = monitor.make_dq_batch_writer(root, report)
    shardstore.build_shards_concurrently(
        writer,
        [
            (b, o.filter(F.col("o_orderkey") % _Q163_BATCHES == b))
            for b in range(_Q163_BATCHES)
        ],
    )
    return monitor.read_dq_history(spark, root)


def _q163_batch_sql(b: int) -> str:
    return f"""
SELECT * FROM (
  WITH t AS (
    SELECT count(*) AS n, count(o_custkey) AS nn,
           count(DISTINCT o_orderkey) AS nd,
           sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS c0
    FROM orders WHERE o_orderkey % {_Q163_BATCHES} = {b}
  )
  SELECT 'orders' AS tbl, '*' AS col, 'row_count' AS chk,
         n::BIGINT AS value, n > 0 AS ok, {b}::BIGINT AS batch_id FROM t
  UNION ALL SELECT 'orders', 'o_custkey', 'completeness', ((nn * 1000000) // n)::BIGINT, coalesce(n > 0 AND nn = n, false), {b} FROM t
  UNION ALL SELECT 'orders', 'o_orderkey', 'uniqueness', ((nd * 1000000) // n)::BIGINT, coalesce(n > 0 AND nd = n, false), {b} FROM t
  UNION ALL SELECT 'orders', 'o_totalprice', 'positive', ((c0 * 1000000) // n)::BIGINT, coalesce(n > 0 AND c0 = n, false), {b} FROM t
)"""


Q163_SQL = "\nUNION ALL\n".join(
    _q163_batch_sql(b) for b in range(_Q163_BATCHES)
)


QUERIES["q163_dq_history"] = q163_dq_history
ORACLES["q163_dq_history"] = Q163_SQL


# ---------------------------------------------------------------------------
# q164 — cross-source duplication matrix
#
# The curation diagnostic behind "which sources copy from each
# other": LSH-banded candidate pairs (the q25/q61 construction),
# exact trigram-Jaccard verification via INTEGER set sizes, rolled up
# per unordered source pair.  Every output cell is integers/strings —
# the similarity threshold is a cross-multiplication
# (n_inter * 5 >= n_union * 3, i.e. J >= 0.6), so the whole query has
# ZERO float surface and the oracle equality is arithmetic identity,
# not rounding luck.  Scale shape: the banded self-join bounds pair
# fan-out per bucket (never all-pairs), verification touches only
# candidate pairs, and the matrix aggregate is |sources|^2-sized.
# ---------------------------------------------------------------------------

#: verification threshold J >= 3/5 as an integer cross-multiplication
_Q164_NUM = 3
_Q164_DEN = 5


def q164_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe

    d = load_table(spark, sf_dir, "documents")
    bands = dedupe.minhash_bands(
        d, "doc_id", "text", num_hashes=8, bands=4, shingle_n=5
    )
    pairs = dedupe.near_dup_candidates(bands, "doc_id")
    counts = dedupe.jaccard_pair_counts(d, pairs, "doc_id", "text", shingle_n=3)
    src = d.select("doc_id", "source")
    j = (
        counts.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")
            ),
            "id_b",
        )
    )
    strong = (
        F.col("n_inter") * _Q164_DEN >= F.col("n_union") * _Q164_NUM
    )
    return (
        j.groupBy(
            F.least("_sa", "_sb").alias("src_a"),
            F.greatest("_sa", "_sb").alias("src_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(strong, 1).otherwise(0)).cast("long").alias("n_strong"),
        )
    )


Q164_SQL = f"""
WITH bands AS ({{Q25_SQL}}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
sh AS (
  SELECT doc_id, source,
         list_distinct([array_to_string(t[i+1:i+3], ' ') FOR i IN range(len(t) - 2)]) AS sh
  FROM (SELECT doc_id, source, {{TOKS_SQL}} AS t FROM documents)
  WHERE len(t) >= 3
),
px AS (
  SELECT least(x.source, y.source) AS src_a,
         greatest(x.source, y.source) AS src_b,
         len(list_intersect(x.sh, y.sh)) AS ni,
         len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS nu
  FROM pairs p
  JOIN sh x ON x.doc_id = p.id_a
  JOIN sh y ON y.doc_id = p.id_b
)
SELECT src_a, src_b, count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN ni * {_Q164_DEN} >= nu * {_Q164_NUM} THEN 1 ELSE 0 END)::BIGINT AS n_strong
FROM px GROUP BY src_a, src_b
"""


def _q164_sql() -> str:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.llm_ops import Q25_SQL

    return Q164_SQL.format(Q25_SQL=Q25_SQL, TOKS_SQL=TOKS_SQL)


QUERIES["q164_source_overlap_matrix"] = q164_source_overlap_matrix
ORACLES["q164_source_overlap_matrix"] = _q164_sql()

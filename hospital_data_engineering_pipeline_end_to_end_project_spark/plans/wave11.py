"""Round-11 query wave (q138-q141).

- q138 winnowing PAIR detection — the MOSS pipeline taken to where
  the use case actually ends: ranked document pairs sharing selected
  fingerprints, at production-class knobs (token k=8 grams, window
  w=9 → fingerprint density 2/(w+1) = 0.2, guarantee span w+k-1 = 16
  tokens), instead of q137's per-doc counts at toy k=w=4.
- q139 incremental (batch-vs-corpus) MinHash-LSH near-dup join — the
  shape production dedup runs daily: a small arriving shard's bands
  broadcast against the corpus band index, exact integer-thresholded
  Jaccard verification; the corpus is never shuffled.
- q140 exact integer-TF cosine self-join over token trigram terms —
  the weighted counterpart of q133's distinct-set Jaccard; the
  threshold is the cross-multiplied SQUARED cosine, all-integer.
- q141 incremental cluster-label maintenance — existing labels
  star-collapsed into edges, unioned with the arriving batch's new
  near-dup edges (q139's output shape), re-propagated with one round
  per hop of the worst single-bridge merge path; both propagations
  oracle-unrolled as CTEs.
- q142 leakage-free train/val/test split — the q50 md5-bucket split
  with the near-dup CLUSTER (q128's label) as the split unit, so a
  test document's near-twin can never sit in train; documents with
  no near-dup fall back to their own id.
- q143 exact repeated-span extraction — suffix-array substring dedup
  (Lee et al. 2022) as winnowing candidates (lossless >= w + k - 1)
  + per-pair positional k-gram match + maximal diagonal runs.

Exactness arguments live on the operators (``operators/dedupe.py``:
``winnowing_pairs`` / ``lsh_incremental_join`` / ``tf_cosine_join``):
selection/banding replay md5-derived integers on both engines, joins
and thresholds are integer end-to-end, and the only non-integer
output columns are round-6 display ratios (for q140 a division by a
correctly-rounded sqrt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dedupe
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# q138 — winnowing pair detection at production knobs
# ---------------------------------------------------------------------------

_Q138_K = 8
_Q138_W = 9


def q138_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedupe.winnowing_pairs(
        d, "doc_id", "text", k=_Q138_K, w=_Q138_W, min_shared=1
    )


Q138_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
hv AS (
  SELECT doc_id,
         [CAST('0x' || substr(md5(array_to_string(t[i:i+{_Q138_K - 1}], ' ')), 1, 15) AS BIGINT)
          FOR i IN range(1, len(t) - {_Q138_K - 1} + 1)] AS hs
  FROM toks WHERE len(t) >= {_Q138_K}
),
win AS (SELECT doc_id, hs, len(hs) AS nh FROM hv WHERE len(hs) >= {_Q138_W}),
sel AS (
  SELECT doc_id,
         list_distinct([hs[j + {_Q138_W} - list_position(list_reverse(hs[j:j+{_Q138_W - 1}]),
                                                         list_min(hs[j:j+{_Q138_W - 1}]))]
                        FOR j IN range(1, nh - {_Q138_W} + 2)]) AS fps
  FROM win
),
nf AS (SELECT doc_id, len(fps) AS nf FROM sel),
ex AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       CAST(p.n_shared AS BIGINT) AS n_shared_fps,
       CAST(na.nf AS BIGINT) AS n_fps_a,
       CAST(nb.nf AS BIGINT) AS n_fps_b,
       round(p.n_shared / least(na.nf, nb.nf), 6) AS overlap
FROM pairs p
JOIN nf na ON p.doc_a = na.doc_id
JOIN nf nb ON p.doc_b = nb.doc_id
WHERE p.n_shared >= 1
"""

QUERIES["q138_winnowing_pairs"] = q138_winnowing_pairs
ORACLES["q138_winnowing_pairs"] = Q138_SQL


# ---------------------------------------------------------------------------
# q139 — incremental (batch-vs-corpus) MinHash-LSH near-dup join
#
# The production shape: today's shard (doc_id % 17 == 0, ~6% of the
# corpus) probed against everything else.  The oracle replays the
# identical MinHash banding (Q25's construction) on both sides, the
# band equi-join, and the exact integer-thresholded verification.
# ---------------------------------------------------------------------------


def _minhash_sql_consts() -> tuple[str, str, int]:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.dedupe import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )

    return (
        "[" + ", ".join(map(str, MINHASH_A)) + "]",
        "[" + ", ".join(map(str, MINHASH_B)) + "]",
        MINHASH_P,
    )


_MA, _MB, _MP = _minhash_sql_consts()
_Q139_T = (7, 10)


def q139_lsh_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    batch = d.filter(F.col("doc_id") % 17 == 0)
    return dedupe.lsh_incremental_join(
        corpus, batch, "doc_id", "text",
        t_num=_Q139_T[0], t_den=_Q139_T[1],
    )


Q139_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
sh0 AS (
  SELECT doc_id, [array_to_string(t[i+1:i+5], ' ') FOR i IN range(len(t) - 4)] AS sh
  FROM toks WHERE len(t) >= 5
),
shd AS (SELECT doc_id, list_distinct(sh) AS sh FROM sh0),
hv AS (
  SELECT doc_id,
         [CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {_MP} FOR s IN sh] AS hs
  FROM shd
),
sigs AS (
  SELECT doc_id,
         [list_aggregate([({_MA}[j+1] * h + {_MB}[j+1]) % {_MP} FOR h IN hs],
                         'min') FOR j IN range(8)] AS sig
  FROM hv
),
bnd AS (
  SELECT doc_id, band_id,
         md5(CAST(band_id AS VARCHAR) || '|' || CAST(sig[2*band_id + 1] AS VARCHAR)
             || '|' || CAST(sig[2*band_id + 2] AS VARCHAR)) AS band_hash
  FROM sigs, (SELECT unnest(range(4)) AS band_id)
),
cand AS (
  SELECT DISTINCT b.doc_id AS batch_doc, c.doc_id AS corpus_doc
  FROM bnd b JOIN bnd c
    ON b.band_id = c.band_id AND b.band_hash = c.band_hash
  WHERE b.doc_id % 17 = 0 AND c.doc_id % 17 <> 0
),
ver AS (
  SELECT cand.batch_doc, cand.corpus_doc,
         len(list_intersect(sb.sh, sc.sh)) AS inter_size,
         len(sb.sh) AS nb, len(sc.sh) AS nc
  FROM cand
  JOIN shd sb ON sb.doc_id = cand.batch_doc
  JOIN shd sc ON sc.doc_id = cand.corpus_doc
)
SELECT batch_doc, corpus_doc,
       CAST(inter_size AS BIGINT) AS inter_size,
       CAST(nb + nc - inter_size AS BIGINT) AS union_size,
       round(CAST(inter_size AS DOUBLE) / (nb + nc - inter_size), 6) AS jaccard
FROM ver
WHERE ({_Q139_T[1]} + {_Q139_T[0]}) * inter_size >= {_Q139_T[0]} * (nb + nc)
"""

QUERIES["q139_lsh_incremental_join"] = q139_lsh_incremental_join
ORACLES["q139_lsh_incremental_join"] = Q139_SQL


# ---------------------------------------------------------------------------
# q140 — exact integer-TF cosine self-join over token trigram terms
#
# All-integer threshold (cross-multiplied SQUARED cosine); the only
# float is the round-6 display division by a correctly-rounded sqrt.
# ---------------------------------------------------------------------------

_Q140_T = (8, 10)
_Q140_N = 3


def q140_tf_cosine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedupe.tf_cosine_join(
        d, "doc_id", "text",
        term_n=_Q140_N, t_num=_Q140_T[0], t_den=_Q140_T[1],
    )


Q140_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
g AS (
  SELECT doc_id,
         unnest([array_to_string(t[i+1:i+{_Q140_N}], ' ')
                 FOR i IN range(len(t) - {_Q140_N - 1})]) AS tok
  FROM toks WHERE len(t) >= {_Q140_N}
),
c AS (SELECT doc_id, tok, count(*) AS c FROM g GROUP BY doc_id, tok),
n2 AS (SELECT doc_id, sum(c*c) AS n2 FROM c GROUP BY doc_id),
dot AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.c * b.c) AS s
  FROM c a JOIN c b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(s AS BIGINT) AS dot,
       CAST(na.n2 AS BIGINT) AS norm2_a,
       CAST(nb.n2 AS BIGINT) AS norm2_b,
       round(CAST(s AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 6) AS cosine
FROM dot
JOIN n2 na ON na.doc_id = doc_a
JOIN n2 nb ON nb.doc_id = doc_b
WHERE {_Q140_T[1] ** 2} * s * s >= {_Q140_T[0] ** 2} * na.n2 * nb.n2
"""

QUERIES["q140_tf_cosine_join"] = q140_tf_cosine_join
ORACLES["q140_tf_cosine_join"] = Q140_SQL


# ---------------------------------------------------------------------------
# q141 — incremental cluster-label maintenance
#
# The capstone of the incremental-dedup lifecycle: existing corpus
# labels (bounded min-label propagation over corpus near-dup edges)
# collapsed to star edges + the arriving batch's new edges (cross
# batch-corpus + intra-batch band pairs), re-propagated.  The oracle
# unrolls BOTH propagations as CTEs over the identical banding —
# round-for-round the same algorithm, so parity is exact by
# construction.
# ---------------------------------------------------------------------------

#: corpus-label rounds match q128's convention; the incremental fold
#: gets one round per hop of the worst single-bridge merge path
_Q141_ROUNDS = 3
_Q141_INC_ROUNDS = 4


def q141_incremental_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import components

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    batch = d.filter(F.col("doc_id") % 17 == 0)
    cb = dedupe.minhash_bands(corpus, "doc_id", "text")
    bb = dedupe.minhash_bands(batch, "doc_id", "text")
    # yesterday's state: labels over the corpus-only near-dup graph
    labels = components.label_propagation_min(
        dedupe.near_dup_candidates(cb, "doc_id"), rounds=_Q141_ROUNDS
    )
    # today's new edges: batch-vs-corpus band matches + intra-batch
    cross = (
        cb.alias("c")
        .join(
            F.broadcast(bb.alias("b")),
            (F.col("c.band_id") == F.col("b.band_id"))
            & (F.col("c.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col("b.doc_id").alias("id_a"), F.col("c.doc_id").alias("id_b")
        )
        .distinct()
    )
    intra = dedupe.near_dup_candidates(bb, "doc_id")
    return components.incremental_labels(
        labels, cross.union(intra), rounds=_Q141_INC_ROUNDS
    )


def _lp_step(sym: str, prev: str, out: str) -> str:
    # MATERIALIZED: each step reads `prev` twice, so DuckDB's default
    # CTE inlining re-evaluates the whole upstream chain per reference
    # — exponential in the round count (the q141 sf0.001 oracle took
    # ~170 s before the hint, ~1 s after; r15).  Result rows are
    # identical — materialization is an evaluation strategy, not a
    # semantic change.
    return f"""
{out} AS MATERIALIZED (
  SELECT node, min(label) AS label FROM (
    SELECT node, label FROM {prev}
    UNION ALL
    SELECT s.v AS node, l.label FROM {sym} s JOIN {prev} l ON s.u = l.node
  ) GROUP BY node
)"""


Q141_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
sh0 AS (
  SELECT doc_id, [array_to_string(t[i+1:i+5], ' ') FOR i IN range(len(t) - 4)] AS sh
  FROM toks WHERE len(t) >= 5
),
hv AS (
  SELECT doc_id,
         [CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {_MP}
          FOR s IN list_distinct(sh)] AS hs
  FROM sh0
),
sigs AS (
  SELECT doc_id,
         [list_aggregate([({_MA}[j+1] * h + {_MB}[j+1]) % {_MP} FOR h IN hs],
                         'min') FOR j IN range(8)] AS sig
  FROM hv
),
bands AS MATERIALIZED (
  SELECT doc_id, band_id,
         md5(CAST(band_id AS VARCHAR) || '|' || CAST(sig[2*band_id + 1] AS VARCHAR)
             || '|' || CAST(sig[2*band_id + 2] AS VARCHAR)) AS band_hash
  FROM sigs, (SELECT unnest(range(4)) AS band_id)
),
ce AS MATERIALIZED (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS u,
                  greatest(a.doc_id, b.doc_id) AS v
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  WHERE a.doc_id % 17 <> 0 AND b.doc_id % 17 <> 0
),
csym AS MATERIALIZED (SELECT u, v FROM ce UNION ALL SELECT v AS u, u AS v FROM ce),
c0 AS (SELECT DISTINCT u AS node, u AS label FROM csym),
{",".join(_lp_step("csym", f"c{i - 1}", f"c{i}") for i in range(1, _Q141_ROUNDS + 1))},
ne AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS u,
                  greatest(a.doc_id, b.doc_id) AS v
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  WHERE a.doc_id % 17 = 0 OR b.doc_id % 17 = 0
),
e2 AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM (
    SELECT node AS x, label AS y FROM c{_Q141_ROUNDS} WHERE node <> label
    UNION ALL
    SELECT u AS x, v AS y FROM ne
  ) WHERE x <> y
),
sym2 AS MATERIALIZED (SELECT u, v FROM e2 UNION ALL SELECT v AS u, u AS v FROM e2),
m0 AS (SELECT DISTINCT u AS node, u AS label FROM sym2),
{",".join(_lp_step("sym2", f"m{i - 1}", f"m{i}") for i in range(1, _Q141_INC_ROUNDS + 1))}
SELECT coalesce(m.node, c.node) AS node,
       coalesce(m.label, c.label) AS label
FROM m{_Q141_INC_ROUNDS} m
FULL OUTER JOIN c{_Q141_ROUNDS} c ON m.node = c.node
"""

QUERIES["q141_incremental_labels"] = q141_incremental_labels
ORACLES["q141_incremental_labels"] = Q141_SQL


# ---------------------------------------------------------------------------
# q142 — leakage-free (cluster-aware) train/val/test split
#
# Composition of two gated pipelines: the q128 label derivation
# (MinHash banding -> bounded min-label propagation) feeding
# ``dataprep.leakage_free_split`` — q50's md5-bucket assignment with
# the CLUSTER label as the hashed unit.  The oracle wraps Q128_SQL
# (the q136 idiom) and replays the left-join/coalesce plus the exact
# q50 bucket CASE; everything is string/integer, no arithmetic
# argument needed.
# ---------------------------------------------------------------------------


def q142_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import (
        components,
        dataprep,
    )
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.data_prep import (
        SPLIT_WEIGHTS,
    )

    d = load_table(spark, sf_dir, "documents")
    bands = dedupe.minhash_bands(
        d, "doc_id", "text", num_hashes=8, bands=4, shingle_n=5
    )
    pairs = dedupe.near_dup_candidates(bands, "doc_id")
    labels = components.label_propagation_min(pairs, rounds=3)
    return dataprep.leakage_free_split(
        d.select("doc_id"), labels, "doc_id", SPLIT_WEIGHTS
    )


def _q142_sql() -> str:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import dataprep
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.data_prep import (
        SPLIT_WEIGHTS,
        _split_case_sql,
    )
    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans.wave10 import Q128_SQL

    return f"""
WITH lp AS ({Q128_SQL}),
u AS (
  SELECT d.doc_id, CAST(coalesce(lp.label, d.doc_id) AS BIGINT) AS unit
  FROM documents d LEFT JOIN lp ON lp.node = d.doc_id
),
b AS (
  SELECT doc_id, unit,
         substr(md5(CAST(unit AS VARCHAR)), 1, {dataprep.SPLIT_PREFIX_LEN})
           AS bucket
  FROM u
)
SELECT doc_id, unit, bucket, {_split_case_sql()} AS split
FROM b
"""


Q142_SQL = _q142_sql()

QUERIES["q142_leakage_free_split"] = q142_leakage_free_split
ORACLES["q142_leakage_free_split"] = Q142_SQL


# ---------------------------------------------------------------------------
# q143 — exact cross-document repeated-span extraction
#
# Suffix-array substring dedup (Lee et al. 2022) as two relational
# stages: winnowing candidates (lossless for spans >= w + k - 1 by
# the winnowing guarantee) -> per-pair positional k-gram match ->
# maximal runs via the diagonal identity (matches of one contiguous
# span share pos_a - pos_b and consecutive pos_a).  Everything is
# md5-derived integers; the oracle replays the identical two stages.
# ---------------------------------------------------------------------------

_Q143_MIN_SPAN = _Q138_W + _Q138_K - 1  # the guarantee bound, 16 tokens


def q143_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedupe.repeated_span_pairs(
        d, "doc_id", "text", k=_Q138_K, w=_Q138_W, min_span=_Q143_MIN_SPAN
    )


Q143_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
hv AS (
  SELECT doc_id,
         [CAST('0x' || substr(md5(array_to_string(t[i:i+{_Q138_K - 1}], ' ')), 1, 15) AS BIGINT)
          FOR i IN range(1, len(t) - {_Q138_K - 1} + 1)] AS hs
  FROM toks WHERE len(t) >= {_Q138_K}
),
win AS (SELECT doc_id, hs, len(hs) AS nh FROM hv WHERE len(hs) >= {_Q138_W}),
sel AS (
  SELECT doc_id,
         list_distinct([hs[j + {_Q138_W} - list_position(list_reverse(hs[j:j+{_Q138_W - 1}]),
                                                         list_min(hs[j:j+{_Q138_W - 1}]))]
                        FOR j IN range(1, nh - {_Q138_W} + 2)]) AS fps
  FROM win
),
ex AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
p2 AS (
  SELECT doc_id, unnest([{{'p': i, 'h': hs[i]}} FOR i IN range(1, len(hs) + 1)]) AS ph
  FROM hv
),
pos AS (SELECT doc_id, ph.p AS pos, ph.h AS h FROM p2),
m AS (
  SELECT pr.doc_a, pr.doc_b, a.pos AS pa, b.pos AS pb
  FROM pairs pr
  JOIN pos a ON a.doc_id = pr.doc_a
  JOIN pos b ON b.doc_id = pr.doc_b AND b.h = a.h
),
r AS (
  SELECT doc_a, doc_b, pa - pb AS delta, pa, pb,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                 ORDER BY pa) AS isl
  FROM m
),
runs AS (
  SELECT doc_a, doc_b, min(pa) AS sa, min(pb) AS sb, count(*) AS len
  FROM r GROUP BY doc_a, doc_b, delta, isl
)
SELECT doc_a, doc_b,
       CAST(sa AS BIGINT) AS start_a,
       CAST(sb AS BIGINT) AS start_b,
       CAST(len + {_Q138_K - 1} AS BIGINT) AS span_tokens
FROM runs
WHERE len >= {_Q143_MIN_SPAN - _Q138_K + 1}
"""

QUERIES["q143_repeated_spans"] = q143_repeated_spans
ORACLES["q143_repeated_spans"] = Q143_SQL

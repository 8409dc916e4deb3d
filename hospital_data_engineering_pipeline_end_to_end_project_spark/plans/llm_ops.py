"""LLM-data-pipeline operator catalog (north-star extensions).

Dedup (exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embeddings (brute-force + LSH-bucketed),
text analysis (tokens, quality, language ID), and multimodal binary
plumbing — each as a driver-checkable query over the ``documents`` /
``embeddings`` test tables, with a DuckDB oracle wherever the
operator is SQL-expressible (all md5-derived hashing, so both engines
compute identical values).

Every approximate operator here carries a *deterministic replayed
oracle* — none settles for the weaker rows-only check: q29/q31
interpolate their seeded hyperplanes into the DuckDB SQL as literals;
q48 re-derives its k-means quantizer in chained CTEs (dyadic-snapped
means), and q109/q110 extend the same replay to product-quantization
codebooks (q110 over the coarse RESIDUALS, composing q48's quantizer
prefix verbatim); q49's sketches are md5-KMV + hash-sampled discrete
quantiles instead of engine-specific HLL/KLL.  Recall/accuracy vs the exact
counterparts (q28, q38/q39) is additionally tolerance-tested in
``tests/test_llm_ops.py`` / ``tests/test_metrics.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import text as TX
from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.parallelism import fan_out
from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import (
    dedupe,
    multimodal,
    similarity,
)
from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import load_table

TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


# ---------------------------------------------------------------------------
# q20 — exact deduplication (hash-groupBy over normalized text)
# ---------------------------------------------------------------------------

def q20_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # size-dispatched (r10 verdict): at bench scales the corpus bounds
    # every duplicate group, so the one-level window plan applies; the
    # skew-proof two-level rewrite takes over past the row threshold.
    # The probe is the parquet footer (driver-side ms), not a job.
    from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import parquet_row_count

    d = load_table(spark, sf_dir, "documents")
    return dedupe.exact_dup_groups_auto(
        d, "doc_id", "text", approx_rows=parquet_row_count(sf_dir, "documents")
    )


Q20_SQL = r"""
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_hash,
       count(*) OVER (
         PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
       ) AS n_copies
FROM documents
"""


# ---------------------------------------------------------------------------
# q21 — token counting / length stats
# ---------------------------------------------------------------------------

def q21_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    qf = TX.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        qf["n_chars"].cast("long").alias("n_chars"),
        qf["n_tokens"].cast("long").alias("n_tokens"),
        qf["avg_token_len"].alias("avg_token_len"),
    )


Q21_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       len({TOKS_SQL}) AS n_tokens,
       round(CAST(length(text) - len({TOKS_SQL}) + 1 AS DOUBLE)
             / len({TOKS_SQL}), 6) AS avg_token_len
FROM documents
"""


# ---------------------------------------------------------------------------
# q22 — quality scoring (length/punct/stopword ratios)
# ---------------------------------------------------------------------------

def q22_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the composite score is computed from UNROUNDED ratios: combining
    # already-rounded values lands exactly on round-half boundaries,
    # where Spark (exact BigDecimal) and DuckDB (scale-by-1e6 in
    # double) disagree
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    punct_raw = (
        n_chars - F.length(F.regexp_replace(F.col("text"), r"[\.,;:!\?]", ""))
    ).cast("double") / n_chars
    # bind the unrounded ratios as columns (r15): the one-projection
    # form re-split the text per `stop` reference (x2) and re-ran the
    # regexp per `punct` reference (x2)
    tk = F.col("__t")
    stop_raw = (
        F.size(F.filter(tk, lambda x: x.isin(*TX.LANG_STOPWORDS["en"])))
        .cast("double")
        / F.size(tk)
    )
    return (
        d.select("doc_id", TX.tokens(F.col("text")).alias("__t"), punct_raw.alias("__punct"))
        .select("doc_id", stop_raw.alias("__stop"), "__punct")
        .select(
            "doc_id",
            F.round("__punct", 6).alias("punct_ratio"),
            F.round("__stop", 6).alias("stopword_ratio"),
            F.round(
                F.col("__stop") * 0.5 + (1.0 - F.col("__punct")) * 0.5, 6
            ).alias("quality_score"),
        )
    )


_EN = ", ".join(f"'{w}'" for w in TX.LANG_STOPWORDS["en"])

Q22_SQL = rf"""
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS DOUBLE)
           / length(text) AS punct_raw,
         CAST(len(list_filter({TOKS_SQL}, x -> x IN ({_EN}))) AS DOUBLE)
           / len({TOKS_SQL}) AS stop_raw
  FROM documents
)
SELECT doc_id, round(punct_raw, 6) AS punct_ratio,
       round(stop_raw, 6) AS stopword_ratio,
       round(stop_raw * 0.5 + (1.0 - punct_raw) * 0.5, 6) AS quality_score
FROM feats
"""


# ---------------------------------------------------------------------------
# q23 — heuristic language ID (stopword n-gram hits, fixed precedence)
# ---------------------------------------------------------------------------

def q23_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenize ONCE, count each language's hits once from the bound
    # array, then derive the guess from the hit COLUMNS: the flat form
    # (4x lang_hits + lang_guess) re-split the text ~14x per row (r15)
    d = load_table(spark, sf_dir, "documents")
    tk = F.col("__t")

    def is_stopword(lang: str):
        # closure factory — a default-arg lambda would make PySpark
        # pass the array INDEX as the second parameter
        words = TX.LANG_STOPWORDS[lang]
        return lambda x: x.isin(*words)

    hit_cols = [
        F.size(F.filter(tk, is_stopword(L))).cast("long").alias(f"{L}_hits")
        for L in ("en", "es", "de", "fr")
    ]
    return (
        d.select("doc_id", "lang", TX.tokens("text").alias("__t"))
        .select("doc_id", "lang", *hit_cols)
        .select(
            "doc_id",
            "lang",
            "en_hits",
            "es_hits",
            "de_hits",
            "fr_hits",
            TX.lang_guess_from_hits(
                F.col("en_hits"),
                F.col("es_hits"),
                F.col("de_hits"),
                F.col("fr_hits"),
            ).alias("lang_guess"),
        )
    )


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.LANG_STOPWORDS[lang])
    return f"len(list_filter({TOKS_SQL}, x -> x IN ({words})))"


Q23_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         {_hits_sql('en')} AS en_hits,
         {_hits_sql('es')} AS es_hits,
         {_hits_sql('de')} AS de_hits,
         {_hits_sql('fr')} AS fr_hits
  FROM documents
)
SELECT doc_id, lang, en_hits, es_hits, de_hits, fr_hits,
       CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
            WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 THEN 'es'
            WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
            WHEN fr_hits > 0 THEN 'fr'
            ELSE 'und' END AS lang_guess
FROM h
"""


# ---------------------------------------------------------------------------
# q24 — document fingerprinting (md5 of sorted distinct token set)
# ---------------------------------------------------------------------------

def q24_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


Q24_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({TOKS_SQL})), ' ')) AS fp
FROM documents
"""


# ---------------------------------------------------------------------------
# q25 — MinHash + LSH banding (the near-dup index itself)
# ---------------------------------------------------------------------------

def q25_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = dedupe.minhash_bands(d, "doc_id", "text", num_hashes=8, bands=4, shingle_n=5)
    return out.withColumn("band_id", F.col("band_id").cast("long"))


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

Q25_SQL = f"""
WITH toks AS (
  SELECT doc_id, {TOKS_SQL} AS t FROM documents
),
sh AS (
  SELECT doc_id, [array_to_string(t[i+1:i+5], ' ') FOR i IN range(len(t) - 4)] AS sh
  FROM toks WHERE len(t) >= 5
),
hv AS (
  -- one md5 per shingle; 60 bits parsed as 0x-hex, reduced mod P
  SELECT doc_id,
         [CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {_MP}
          FOR s IN list_distinct(sh)] AS hs
  FROM sh
),
sigs AS (
  SELECT doc_id,
         [list_aggregate([({_MA}[j+1] * h + {_MB}[j+1]) % {_MP} FOR h IN hs],
                         'min') FOR j IN range(8)] AS sig
  FROM hv
)
SELECT doc_id, band_id,
       md5(CAST(band_id AS VARCHAR) || '|' || CAST(sig[2*band_id + 1] AS VARCHAR)
           || '|' || CAST(sig[2*band_id + 2] AS VARCHAR)) AS band_hash
FROM sigs, (SELECT unnest(range(4)) AS band_id)
"""


# ---------------------------------------------------------------------------
# q26 — n-gram Jaccard similarity (within-source blocking)
# ---------------------------------------------------------------------------

# per-key shingle document-frequency cap: a shingle shared by d docs
# fans out d^2/2 self-join rows, so hot boilerplate shingles are the
# quadratic failure mode at corpus scale.  The oracle applies the
# identical cap (sparse-intersection form, same QUALIFY bounds).
Q26_DF_MAX = 64


def q26_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedupe.jaccard_within_key(
        d, "doc_id", "text", "source", shingle_n=3, df_max=Q26_DF_MAX
    )


Q26_SQL = f"""
WITH sh AS (
  SELECT doc_id, source,
         list_distinct([array_to_string(t[i+1:i+3], ' ') FOR i IN range(len(t) - 2)]) AS sh
  FROM (SELECT doc_id, source, {TOKS_SQL} AS t FROM documents)
  WHERE len(t) >= 3
),
ex AS (SELECT doc_id, source, unnest(sh) AS s, len(sh) AS n_sh FROM sh),
kept AS (
  SELECT *, count(*) OVER (PARTITION BY source, s) AS df
  FROM ex QUALIFY df > 1 AND df <= {Q26_DF_MAX}
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter,
         min(a.n_sh) AS n_a, min(b.n_sh) AS n_b
  FROM kept a JOIN kept b
    ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6) AS jaccard
FROM inter
"""


# ---------------------------------------------------------------------------
# q27 — SimHash document fingerprints (64-bit, md5-nibble derived).
# Bit 63 is the long's sign bit: the oracle adds the min-BIGINT
# two's-complement constant instead of the overflowing 1 << 63,
# mirroring operators/dedupe.py:_TOP_BIT_63.
# ---------------------------------------------------------------------------

def q27_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedupe.simhash_agg(d, "doc_id", "text", bits=64)


Q27_SQL = f"""
WITH h AS (
  SELECT doc_id, md5(unnest({TOKS_SQL})) AS hx FROM documents
),
bits AS (
  SELECT doc_id, b.i AS bit,
         SUM(CASE WHEN ((strpos('0123456789abcdef', substr(hx, (b.i // 4) + 1, 1)) - 1)
                        & (1 << (b.i % 4))) <> 0 THEN 1 ELSE -1 END) AS bal
  FROM h, (SELECT unnest(range(64)) AS i) b
  GROUP BY doc_id, b.i
)
SELECT doc_id,
       CAST(SUM(CASE WHEN bal > 0
                     THEN CASE WHEN bit = 63 THEN -9223372036854775807 - 1
                               ELSE (1::BIGINT << bit) END
                     ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q28 — brute-force cosine top-k over embeddings (exact ANN baseline)
# ---------------------------------------------------------------------------

def q28_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.cosine_topk(
        e.filter(F.col("vec_id") < 20), e, id_col="vec_id", vec_col="embedding", k=5
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


#: unit-normalize a DOUBLE[] column — replays Spark's _with_unit
#: exactly (one correctly-rounded division per element by the same
#: sequential-fold norm, with the identical nullif zero-norm guard
#: — see operators/similarity.py:_with_unit), so pair scoring is a
#: bare dot product on both engines
_UNIT = "[x / nullif(sqrt(list_dot_product({v}, {v})), 0) FOR x IN {v}]"

Q28_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id,
         {_UNIT.format(v='embedding::DOUBLE[]')} AS qnv
  FROM embeddings WHERE vec_id < 20
),
c AS (
  SELECT vec_id AS neighbor_id,
         {_UNIT.format(v='embedding::DOUBLE[]')} AS cnv
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qnv, cnv), 6) AS cos_sim
  FROM q, c WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# q29 — LSH-bucketed approximate top-k (the scale path).  Like q31,
# the oracle REPLAYS the seeded hyperplanes as SQL literals, so the
# "approximate" operator is deterministic cross-engine and gets a full
# hash check (bucketing + candidate join + rank window), not the weaker
# rows-only check.
# ---------------------------------------------------------------------------

Q29_PLANES, Q29_TABLES, Q29_K = 8, 4, 5


def q29_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.lsh_bucket_topk(
        e,
        id_col="vec_id",
        vec_col="embedding",
        dim=64,
        k=Q29_K,
        n_planes=Q29_PLANES,
        n_tables=Q29_TABLES,
        # oracle-gated: pinned to the bit-replayable join path (same
        # reason as q31; the auto rule would pick it anyway at 4
        # tables, the pin keeps the gate independent of that rule)
        scorer="exact",
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def _lsh_tabled_sql(n_planes: int, n_tables: int) -> str:
    """UNION-ALL SQL replaying ``similarity._multi_table_buckets``
    plane-for-plane (same seeds, same bit order) over the CTE ``v``
    whose ``dv`` is the unit-normalized vector — matching the Spark
    side, which buckets and scores on the normalized copy.  DuckDB's
    ``list_dot_product`` is a sequential fold, bit-identical to
    Spark's ``aggregate(zip_with(...))`` fold, so the sign tests —
    and therefore the buckets — agree exactly across engines."""
    branches = []
    for t in range(n_tables):
        planes = similarity.hyperplanes(64, n_planes, seed=20260813 + 7919 * t)
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product(dv, {plane!r}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j, plane in enumerate(planes)
        )
        branches.append(
            f"SELECT vec_id, dv, {t} AS table_id, {bucket} AS bucket FROM v"
        )
    return "\nUNION ALL\n".join(branches)


#: normalized-vector CTE shared by the LSH oracles
_V_UNIT_CTE = (
    "rawv AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),\n"
    f"v AS (SELECT vec_id, {_UNIT.format(v='dv')} AS dv FROM rawv)"
)


def _q29_sql() -> str:
    return f"""
WITH {_V_UNIT_CTE},
tabled AS ({_lsh_tabled_sql(Q29_PLANES, Q29_TABLES)}),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(a.dv, b.dv), 6) AS cos_sim
  FROM tabled a JOIN tabled b
    ON a.table_id = b.table_id AND a.bucket = b.bucket
   AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {Q29_K}
"""


Q29_SQL = _q29_sql()


# ---------------------------------------------------------------------------
# q30 — multimodal binary plumbing (Arrow-batched mapInPandas feature
# extraction over a binary payload column)
# ---------------------------------------------------------------------------

def q30_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.documents_as_media(d))


Q30_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5,
       CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
FROM documents
"""


# ---------------------------------------------------------------------------
# q31 — embedding-cosine near-duplicate pairs via LSH candidates +
# exact-cosine verify.  The hyperplanes are seeded literals, so the
# oracle SQL below REPLAYS the identical bucketing in DuckDB: the
# approximate operator is deterministic cross-engine and hash-checks
# end-to-end (bucketing + candidate join + cosine verify), which is a
# stronger gate than the rows-only check approximate ops usually get.
# (3 planes, 24 tables) targets ~0.999 recall at the 0.4 threshold;
# the brute-force cartesian survives only as the recall-test oracle.
# ---------------------------------------------------------------------------

Q31_THRESHOLD, Q31_PLANES, Q31_TABLES = 0.4, 3, 24


def q31_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(
        e,
        id_col="vec_id",
        vec_col="embedding",
        threshold=Q31_THRESHOLD,
        n_planes=Q31_PLANES,
        n_tables=Q31_TABLES,
        # oracle-gated: the SQL oracle replays the sequential dot
        # fold bit-for-bit — blocked (BLAS) scoring can flip a pair
        # sitting exactly on a rounding boundary, so the gate stays
        # on the exact join path (the throughput default at this
        # table count is blocked; see the operator docstring)
        scorer="exact",
    )


def _q31_sql() -> str:
    """Oracle that mirrors the Spark LSH construction plane-for-plane.

    ``list_dot_product`` is a sequential fold, bit-identical to the
    Spark ``aggregate(zip_with(...))`` fold, so the sign tests (and
    therefore the buckets) agree exactly across engines.
    """
    tabled = _lsh_tabled_sql(Q31_PLANES, Q31_TABLES)
    return f"""
WITH {_V_UNIT_CTE},
tabled AS ({tabled}),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.dv, b.dv), 6) AS cos_sim
  FROM tabled a JOIN tabled b
    ON a.table_id = b.table_id AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id
)
SELECT DISTINCT id_a, id_b, cos_sim FROM cand WHERE cos_sim >= {Q31_THRESHOLD}
"""


Q31_SQL = _q31_sql()


# ---------------------------------------------------------------------------
# q46 — grouped top-k: most frequent words per language label
# (explode -> count -> rank window -> k per group)
# ---------------------------------------------------------------------------

def q46_top_words_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators.skew import salted_grouped_topk

    d = load_table(spark, sf_dir, "documents")
    # balance the compact scan before the token explode (serial on a
    # single-file input otherwise); round-robin — lang is a hot key
    # with ~5 values, and the (lang, word) aggregate map-side-combines
    # regardless of layout
    counts = (
        fan_out(d.select("lang", "text"))
        .select("lang", F.explode(TX.tokens("text")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the rank partition is the per-language VOCABULARY — it grows
    # with the corpus (noise tokens keep arriving) and there are only
    # ~5 languages, so a one-level window is one vocab-sized sort per
    # lang in one task.  The salted two-level top-k bounds every sort
    # to ~vocab/64; output identical by the subset identity under the
    # total (n DESC, word ASC) order, so the one-level oracle SQL
    # replays unchanged.
    return salted_grouped_topk(
        counts, ["lang"], "n", "word", k=5, descending=True
    )


Q46_SQL = f"""
WITH counts AS (
  SELECT lang, unnest({TOKS_SQL}) AS word FROM documents
),
agg AS (
  SELECT lang, word, count(*) AS n FROM counts GROUP BY lang, word
)
SELECT lang, word, n, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS rank
  FROM agg
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# q47 — JSON extraction via from_json (SURVEY 2.7 noted the reference
# has no from_json; this adds the explicit-schema JSON-column path)
# ---------------------------------------------------------------------------

def q47_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return (
        e.select("event_type", parsed.getField("k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("sum_k"),
        )
    )


Q47_SQL = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_parsed,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q49 — DETERMINISTIC sketch-based approximate aggregates.  Round 5
# shipped this as HLL (approx_count_distinct) + KLL
# (percentile_approx), which are engine-specific by construction and
# could only ever get a rows-only check.  Round 6 swaps in sketches
# with the same role (fixed-size state, tunable error, one logical
# pass) whose estimates are bit-identical across engines:
#
# - distinct count: md5-KMV bottom-k (functions/metrics.kmv_distinct)
#   — DV ~= (k-1)/h_(k), rse ~= 1/sqrt(k-2);
# - quantiles: discrete percentile over a deterministic md5 row
#   sample (the hex-prefix idiom from operators/dataprep) — classic
#   sample-quantile sketch, error O(1/sqrt(sample)).
#
# The exact counterparts remain oracle-checked as q38/q39; estimator
# accuracy vs exact is tested in tests/test_metrics.py.
# ---------------------------------------------------------------------------

Q49_KMV_K = 256
#: lexicographic bound on a 4-hex-char md5 prefix: '4000'/'10000' = 25%
Q49_SAMPLE_BOUND, Q49_SAMPLE_FRACTION = "4000", 0.25


def q49_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions.metrics import kmv_distinct

    l = load_table(spark, sf_dir, "lineitem")
    kmv = kmv_distinct(l, ["l_returnflag"], "l_partkey", k=Q49_KMV_K).withColumnRenamed(
        "approx_distinct", "approx_parts"
    )
    rowh = F.substring(
        F.md5(
            F.concat_ws(
                ",",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        4,
    )
    samp = l.filter(rowh < Q49_SAMPLE_BOUND)
    # discrete (no-interpolation) quantile: the ceil(q*n)-th order
    # statistic — an actual data value, so exact cross-engine; q*n is
    # a double product on both sides (oracle uses e-notation literals
    # to keep DuckDB out of DECIMAL arithmetic).
    #
    # The ORACLE replays this as a per-row rank over the sample
    # (row_number -> rn == ceil(q*n)), but the sample is a FIXED
    # FRACTION of lineitem, so that rank window's partition grows
    # linearly with the corpus — one task per returnflag sorting
    # fraction*n rows.  Here the t-th order statistic is computed on
    # the (flag, price) AGGREGATE instead: count per distinct price
    # (map-side combined), running total over the distinct-price
    # frame — a window bounded by the PRICE DOMAIN (decimal cents, a
    # constant w.r.t. corpus size), not by rows — then the answer is
    # the least price whose running total reaches t.  Identical
    # values: rank ties within a price all carry that price, so the
    # row at position t has price = min(price | cum_count >= t).
    pc = samp.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pc.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "n", F.sum("__c").over(Window.partitionBy("l_returnflag"))
    )
    qs = cum.groupBy("l_returnflag").agg(
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(0.5) * F.col("n")),
                F.col("l_extendedprice"),
            )
        ).alias("approx_p50"),
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(0.95) * F.col("n")),
                F.col("l_extendedprice"),
            )
        ).alias("approx_p95"),
    )
    counts = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    return kmv.join(qs, "l_returnflag").join(counts, "l_returnflag")


Q49_SQL = f"""
WITH dh AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
hashed AS (
  SELECT l_returnflag,
         CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13)) AS BIGINT)
           / 4503599627370496e0 AS h
  FROM dh
),
ranked AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM hashed
),
kmv AS (
  SELECT l_returnflag,
         CAST(CASE WHEN count(*) < {Q49_KMV_K} THEN count(*)
              ELSE floor({Q49_KMV_K - 1} / max(CASE WHEN rn = {Q49_KMV_K} THEN h END))
              END AS BIGINT) AS approx_parts
  FROM ranked GROUP BY l_returnflag
),
samp AS (
  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
  FROM lineitem
  WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ',' ||
               CAST(l_linenumber AS VARCHAR)), 1, 4) < '{Q49_SAMPLE_BOUND}'
),
r2 AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM samp
),
qs AS (
  SELECT l_returnflag,
         max(CASE WHEN rn = ceil(5e-1 * n) THEN l_extendedprice END) AS approx_p50,
         max(CASE WHEN rn = ceil(9.5e-1 * n) THEN l_extendedprice END) AS approx_p95
  FROM r2 GROUP BY l_returnflag
),
counts AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, approx_parts, approx_p50, approx_p95, n_rows
FROM kmv JOIN qs USING (l_returnflag) JOIN counts USING (l_returnflag)
"""


# ---------------------------------------------------------------------------
# q48 — IVF approximate nearest neighbors.  Like q29/q31, the oracle
# REPLAYS the whole construction in DuckDB — but here the quantizer is
# data-dependent, so the SQL re-derives it from scratch as chained
# CTEs: a bounded md5-ordered training sample (sv), seeds = the K
# lowest-md5 sample rows, then two unrolled Lloyd iterations over the
# SAMPLE (argmin assign -> per-(cluster,dim) mean), then the final
# full-corpus assign/probe/top-k.  Training on the bounded sample
# (operators/similarity.py:IVF_TRAIN_PER_CLUSTER rows per centroid)
# is what keeps quantizer training linear at corpus scale; the
# oracle selects the identical sample via
# ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT cap.  Two
# things make the replay cross-engine exact: distances are sequential
# list folds (bit-identical to Spark's aggregate(zip_with(...))), and
# centroid means are snapped to a dyadic grid
# (floor(avg*1024+0.5)/1024 — see
# operators/similarity.py:build_ivf_centroids), which absorbs the
# order-dependent last-ulp wobble of a distributed mean.  Recall vs
# the exact q28 baseline is tested in tests/test_llm_ops.py.
# ---------------------------------------------------------------------------

Q48_CLUSTERS, Q48_NPROBE, Q48_K, Q48_ITERS, Q48_DIM = 8, 2, 5, 2, 64
Q48_TRAIN_CAP = similarity.IVF_TRAIN_PER_CLUSTER * Q48_CLUSTERS
_Q48_ORD = "md5(CAST(vec_id AS VARCHAR)), vec_id"


def q48_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(
        e,
        id_col="vec_id",
        vec_col="embedding",
        k=Q48_K,
        n_clusters=Q48_CLUSTERS,
        nprobe=Q48_NPROBE,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q48_dist(vec: str, cent: str) -> str:
    """Squared L2 distance as the same sequential fold Spark runs:
    per-dim exact subtraction, then list_dot_product's in-order
    multiply-accumulate."""
    diffs = (
        f"list_transform(range(1, {Q48_DIM + 1}),"
        f" i -> ({vec})[i] - ({cent})[i])"
    )
    return f"list_dot_product({diffs}, {diffs})"


def _q48_ranked(cent_cte: str, src: str = "v") -> str:
    return (
        "SELECT v.vec_id, v.dv, cl.c, "
        f"{_q48_dist('v.dv', 'cl.cent')} AS dd, row_number() OVER ("
        f"PARTITION BY v.vec_id ORDER BY {_q48_dist('v.dv', 'cl.cent')},"
        f" cl.c) AS rn FROM {src} v CROSS JOIN {cent_cte} cl"
    )


def _q48_quantizer_prefix(where: str = "") -> str:
    """Shared WITH-body through the full-corpus rank ``rf`` and the
    ``assigned`` cluster map: raw/unit vectors, the bounded
    lowest-md5 training sample, seeds, ``Q48_ITERS`` Lloyd rounds
    with dyadic-snapped means, and the final K x n distance rank
    (``rn = 1`` is the assignment; ``dd`` the squared distance).
    Interpolated verbatim by BOTH the q48 IVF oracle and the q88
    semantic-dedup oracle so the two replay the identical quantizer;
    ``where`` (a leading-space ``" WHERE ..."`` clause, default none)
    restricts the trained/assigned population — the q152 index-served
    oracle trains on the CORPUS split only.
    """
    # one Lloyd iteration over the TRAINING SAMPLE sv: assign to cN-1,
    # mean per (cluster, dim) snapped to the dyadic grid, empty
    # clusters keep their previous coordinates (the LEFT JOIN +
    # coalesce)
    iters = []
    for it in range(1, Q48_ITERS + 1):
        prev_l = f"c{it - 1}l"
        iters.append(
            f"""r{it} AS MATERIALIZED ({_q48_ranked(prev_l, src="sv")}),
a{it} AS MATERIALIZED (SELECT vec_id, dv, c AS cluster FROM r{it} WHERE rn = 1),
u{it} AS MATERIALIZED (
  SELECT a.cluster, i.i AS dim,
         floor(avg(a.dv[i.i]) * 1024 + 0.5) / 1024 AS m
  FROM a{it} a CROSS JOIN idx i GROUP BY a.cluster, i.i
),
c{it} AS MATERIALIZED (
  SELECT s.c, s.dim, coalesce(u.m, s.val) AS val
  FROM c{it - 1} s LEFT JOIN u{it} u
    ON u.cluster = s.c AND u.dim = s.dim
),
c{it}l AS MATERIALIZED (SELECT c, list(val ORDER BY dim) AS cent FROM c{it} GROUP BY c)"""
        )
    iter_sql = ",\n".join(iters)
    return f"""v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings{where}),
nv AS MATERIALIZED (SELECT vec_id, {_UNIT.format(v='dv')} AS nv FROM v),
sv AS MATERIALIZED (SELECT vec_id, dv FROM v ORDER BY {_Q48_ORD} LIMIT {Q48_TRAIN_CAP}),
seeds AS (
  SELECT row_number() OVER (ORDER BY {_Q48_ORD}) - 1 AS c, dv AS cent
  FROM sv ORDER BY {_Q48_ORD} LIMIT {Q48_CLUSTERS}
),
idx AS (SELECT unnest(range(1, {Q48_DIM + 1})) AS i),
c0 AS (SELECT s.c, i.i AS dim, s.cent[i.i] AS val FROM seeds s CROSS JOIN idx i),
c0l AS MATERIALIZED (SELECT c, list(val ORDER BY dim) AS cent FROM c0 GROUP BY c),
{iter_sql},
rf AS MATERIALIZED ({_q48_ranked(f"c{Q48_ITERS}l")}),
assigned AS MATERIALIZED (SELECT vec_id, c AS cluster FROM rf WHERE rn = 1)"""


def _q48_sql() -> str:
    return f"""
WITH {_q48_quantizer_prefix()},
probes AS (SELECT vec_id, c AS probe_cluster FROM rf WHERE rn <= {Q48_NPROBE}),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(qn.nv, cn.nv), 6) AS cos_sim
  FROM probes p
  JOIN assigned c ON p.probe_cluster = c.cluster AND p.vec_id <> c.vec_id
  JOIN nv qn ON qn.vec_id = p.vec_id
  JOIN nv cn ON cn.vec_id = c.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {Q48_K}
"""


Q48_SQL = _q48_sql()


# ---------------------------------------------------------------------------
# q58 — embedding int8 quantization (the storage op for 100 TB
# embedding tables: 4x smaller at-rest than float32, 8x than float64)
#
# Per vector: L2 norm, absmax scale, and the int8 codes summarized as
# scalars (sum + md5 of the joined code string) because the driver
# canon can't hash array cells.  Every step is exact cross-engine:
# sqrt and single divisions are correctly-rounded IEEE, and rounding
# is floor(x/scale + 0.5) — half-away-up on both engines, avoiding
# round()'s banker's-vs-half-away divergence.
# ---------------------------------------------------------------------------

def q58_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import vectors as V

    e = load_table(spark, sf_dir, "embeddings")
    v = V.as_double("embedding")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # scale is BOUND as a projection column (r15): the code transform
    # references it as a cheap attribute instead of re-evaluating the
    # array_max chain per reference (the r14 dim²/duplicate-scan
    # class).  The pushed-down scale > 0 predicate still costs one
    # amax scan in the filter — accepted residual (2 scans, was 3).
    return (
        e.select(
            "vec_id",
            v.alias("__v"),
            (amax / F.lit(127.0)).alias("scale"),
        )
        .select(
            "vec_id",
            V.norm(F.col("__v")).alias("l2_norm"),
            "scale",
            F.transform(
                "__v", lambda x: F.floor(x / F.col("scale") + 0.5).cast("int")
            ).alias("qv"),
        )
        .filter(F.col("scale") > 0)  # zero vectors are unquantizable
        .select(
            "vec_id",
            "l2_norm",
            "scale",
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("q_sum"),
            F.md5(
                F.concat_ws(",", F.transform("qv", lambda x: x.cast("string")))
            ).alias("q_md5"),
        )
    )


Q58_SQL = """
WITH s AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS l2_norm,
         list_max([abs(x) FOR x IN embedding::DOUBLE[]]) / 127.0 AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id, l2_norm, scale,
         [CAST(floor(x / scale + 0.5) AS INT) FOR x IN v] AS qv
  FROM s WHERE scale > 0
)
SELECT vec_id, l2_norm, scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       md5(array_to_string(qv, ',')) AS q_md5
FROM q
"""


# ---------------------------------------------------------------------------
# q109 — product quantization + asymmetric-distance top-k (PQ-ADC)
#
# The memory half of the canonical 100 TB ANN layout (IVF partitions
# the search — q48; PQ compresses the residency): vectors are stored
# as n_sub small centroid codes (64-dim float32 256 B -> 2 B at
# n_sub=4, k=16), and queries score the codes through per-subspace
# distance TABLES — n_sub lookups + adds per corpus vector, the raw
# embeddings never read on the corpus side.  Like q48 the oracle
# re-derives the whole construction in SQL: the same bounded
# lowest-md5 sample, per-subspace seeded unrolled Lloyd with
# dyadic-snapped means, argmin codes (first-min ties), the query
# distance tables, and the fixed-order lookup-sum — every float op is
# a sequential fold or a left-to-right chain, so the replay is
# bit-exact (operators/similarity.py:build_pq_codebooks / pq_encode /
# pq_adc_topk).
# ---------------------------------------------------------------------------

Q109_SUB, Q109_K, Q109_ITERS, Q109_NQ, Q109_TOPK = 4, 16, 2, 4, 5
Q109_DS = Q48_DIM // Q109_SUB
Q109_TRAIN_CAP = similarity.PQ_TRAIN_PER_CENTROID * Q109_K


def q109_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    books = similarity.build_pq_codebooks(
        e,
        "embedding",
        "vec_id",
        n_sub=Q109_SUB,
        k=Q109_K,
        iterations=Q109_ITERS,
    )
    out = similarity.pq_adc_topk(
        e,
        e.filter(F.col("vec_id") < Q109_NQ),
        "vec_id",
        "embedding",
        books,
        k_top=Q109_TOPK,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q109_dist(vec: str, cent: str) -> str:
    """Squared L2 over ONE subspace slice — the same sequential fold
    as the Spark side (see ``_q48_dist``)."""
    diffs = (
        f"list_transform(range(1, {Q109_DS + 1}),"
        f" i -> ({vec})[i] - ({cent})[i])"
    )
    return f"list_dot_product({diffs}, {diffs})"


def _pq_train_ctes(m: int, sample: str, vcol: str) -> str:
    """Per-subspace PQ codebook training CTE chain (``s{m}v`` ..
    ``s{m}c{ITERS}l``): slice ``vcol`` of the ``sample`` CTE, seeds =
    first-k in (md5, id) order, unrolled Lloyd with dyadic-snapped
    means and empty-cluster carryover.  Interpolated by BOTH the q109
    (raw-vector PQ) and q110 (residual IVF-PQ) oracles — only the
    sample source differs."""
    lo = m * Q109_DS
    sl = f"{vcol}[{lo + 1}:{lo + Q109_DS}]"
    parts = [
        f"""s{m}v AS MATERIALIZED (SELECT vec_id, {sl} AS sdv FROM {sample}),
s{m}seeds AS (
  SELECT row_number() OVER (ORDER BY {_Q48_ORD}) - 1 AS c, sdv AS cent
  FROM s{m}v ORDER BY {_Q48_ORD} LIMIT {Q109_K}
),
s{m}c0 AS (
  SELECT s.c, i.i AS dim, s.cent[i.i] AS val
  FROM s{m}seeds s CROSS JOIN sidx i
),
s{m}c0l AS MATERIALIZED (SELECT c, list(val ORDER BY dim) AS cent FROM s{m}c0 GROUP BY c)"""
    ]
    for it in range(1, Q109_ITERS + 1):
        parts.append(
            f"""s{m}r{it} AS MATERIALIZED (
  SELECT v.vec_id, v.sdv, cl.c,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {_q109_dist('v.sdv', 'cl.cent')}, cl.c) AS rn
  FROM s{m}v v CROSS JOIN s{m}c{it - 1}l cl
),
s{m}a{it} AS MATERIALIZED (SELECT vec_id, sdv, c AS cluster FROM s{m}r{it} WHERE rn = 1),
s{m}u{it} AS MATERIALIZED (
  SELECT a.cluster, i.i AS dim,
         floor(avg(a.sdv[i.i]) * 1024 + 0.5) / 1024 AS mn
  FROM s{m}a{it} a CROSS JOIN sidx i GROUP BY a.cluster, i.i
),
s{m}c{it} AS MATERIALIZED (
  SELECT s.c, s.dim, coalesce(u.mn, s.val) AS val
  FROM s{m}c{it - 1} s LEFT JOIN s{m}u{it} u
    ON u.cluster = s.c AND u.dim = s.dim
),
s{m}c{it}l AS MATERIALIZED (SELECT c, list(val ORDER BY dim) AS cent FROM s{m}c{it} GROUP BY c)"""
        )
    return ",\n".join(parts)


def _q109_subspace(m: int) -> str:
    """q109's full chain for subspace ``m``: training over the raw
    sample ``sv``, then full-corpus codes and the query distance
    table over raw ``dv`` slices."""
    lo = m * Q109_DS
    sl = f"dv[{lo + 1}:{lo + Q109_DS}]"
    return ",\n".join(
        [
            _pq_train_ctes(m, "sv", "dv"),
            f"""s{m}all AS MATERIALIZED (
  SELECT v.vec_id, cl.c,
         row_number() OVER (PARTITION BY v.vec_id
           ORDER BY {_q109_dist(f'(v.{sl})', 'cl.cent')}, cl.c) AS rn
  FROM v CROSS JOIN s{m}c{Q109_ITERS}l cl
),
s{m}code AS MATERIALIZED (SELECT vec_id, c AS code FROM s{m}all WHERE rn = 1),
s{m}qt AS MATERIALIZED (
  SELECT q.vec_id, cl.c, {_q109_dist(f'(q.{sl})', 'cl.cent')} AS d
  FROM qv q CROSS JOIN s{m}c{Q109_ITERS}l cl
)""",
        ]
    )


def _q109_sql() -> str:
    subs = ",\n".join(_q109_subspace(m) for m in range(Q109_SUB))
    ksel = ", ".join(f"c{m}.code AS k{m}" for m in range(Q109_SUB))
    kjoin = " ".join(
        f"JOIN s{m}code c{m} USING (vec_id)" for m in range(1, Q109_SUB)
    )
    tjoin = "\n".join(
        f"  JOIN s{m}qt t{m} ON t{m}.vec_id = q.vec_id AND t{m}.c = s.k{m}"
        for m in range(Q109_SUB)
    )
    sumexpr = " + ".join(f"t{m}.d" for m in range(Q109_SUB))
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
sv AS MATERIALIZED (SELECT vec_id, dv FROM v ORDER BY {_Q48_ORD} LIMIT {Q109_TRAIN_CAP}),
sidx AS (SELECT unnest(range(1, {Q109_DS + 1})) AS i),
qv AS (SELECT vec_id, dv FROM v WHERE vec_id < {Q109_NQ}),
{subs},
codes AS (
  SELECT c0.vec_id, {ksel}
  FROM s0code c0 {kjoin}
),
scored AS (
  SELECT q.vec_id AS query_id, s.vec_id AS neighbor_id,
         round({sumexpr}, 6) AS adc_dist
  FROM codes s CROSS JOIN qv q
{tjoin}
  WHERE q.vec_id <> s.vec_id
)
SELECT query_id, neighbor_id, adc_dist, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {Q109_TOPK}
"""


Q109_SQL = _q109_sql()


# ---------------------------------------------------------------------------
# q110 — residual IVF-PQ search (the composed 100 TB ANN design)
#
# q48's IVF prunes the SEARCH (nprobe cells per query), q109's PQ
# compresses the RESIDENCY — and the canonical composition quantizes
# the coarse RESIDUAL x - c(x), so the same code budget spans only
# the within-cell displacement.  The oracle interpolates q48's
# quantizer prefix VERBATIM (same coarse centroids, same sample),
# derives residuals for the whole corpus, re-trains the per-subspace
# codebooks on the residual sample via the shared _pq_train_ctes
# chain, and scores candidates through per-(query, probed-cell)
# residual distance tables joined on the cell id — no cross join
# anywhere, matching the Spark plan's equi-join pruning
# (operators/similarity.py:build_ivf_pq / ivf_pq_adc_topk).
# ---------------------------------------------------------------------------


def q110_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.ivf_pq_adc_topk(
        e,
        e.filter(F.col("vec_id") < Q109_NQ),
        "vec_id",
        "embedding",
        n_clusters=Q48_CLUSTERS,
        nprobe=Q48_NPROBE,
        n_sub=Q109_SUB,
        k_codes=Q109_K,
        k_top=Q109_TOPK,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q110_subspace(m: int) -> str:
    """q110's chain for subspace ``m``: codebooks trained on the
    residual sample ``srv``, corpus codes over ``rv``, and the
    per-(query, probed-cell) residual distance table over ``qrv``."""
    lo = m * Q109_DS
    sl = f"rdv[{lo + 1}:{lo + Q109_DS}]"
    return ",\n".join(
        [
            _pq_train_ctes(m, "srv", "rdv"),
            f"""s{m}all AS MATERIALIZED (
  SELECT r.vec_id, cl.c,
         row_number() OVER (PARTITION BY r.vec_id
           ORDER BY {_q109_dist(f'(r.{sl})', 'cl.cent')}, cl.c) AS rn
  FROM rv r CROSS JOIN s{m}c{Q109_ITERS}l cl
),
s{m}code AS MATERIALIZED (SELECT vec_id, c AS code FROM s{m}all WHERE rn = 1),
s{m}qt AS MATERIALIZED (
  SELECT q.vec_id, q.cluster, cl.c,
         {_q109_dist(f'(q.{sl})', 'cl.cent')} AS d
  FROM qrv q CROSS JOIN s{m}c{Q109_ITERS}l cl
)""",
        ]
    )


def _q110_sql() -> str:
    subs = ",\n".join(_q110_subspace(m) for m in range(Q109_SUB))
    ksel = ", ".join(f"c{m}.code AS k{m}" for m in range(Q109_SUB))
    kjoin = " ".join(
        f"JOIN s{m}code c{m} ON c{m}.vec_id = a.vec_id"
        for m in range(1, Q109_SUB)
    )
    tjoin = "\n".join(
        f"  JOIN s{m}qt t{m} ON t{m}.vec_id = t0.vec_id"
        f" AND t{m}.cluster = s.cluster AND t{m}.c = s.k{m}"
        for m in range(1, Q109_SUB)
    )
    sumexpr = " + ".join(f"t{m}.d" for m in range(Q109_SUB))
    rdv64 = (
        "list_transform(range(1, 65), i -> v.dv[i] - cl.cent[i])"
    )
    return f"""
WITH {_q48_quantizer_prefix()},
sidx AS (SELECT unnest(range(1, {Q109_DS + 1})) AS i),
rv AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, {rdv64} AS rdv
  FROM assigned a JOIN v ON v.vec_id = a.vec_id
  JOIN c{Q48_ITERS}l cl ON cl.c = a.cluster
),
srv AS MATERIALIZED (
  SELECT vec_id, rdv FROM rv ORDER BY {_Q48_ORD} LIMIT {Q109_TRAIN_CAP}
),
probes AS (
  SELECT vec_id, c AS cluster FROM rf
  WHERE rn <= {Q48_NPROBE} AND vec_id < {Q109_NQ}
),
qrv AS MATERIALIZED (
  SELECT p.vec_id, p.cluster, {rdv64} AS rdv
  FROM probes p JOIN v ON v.vec_id = p.vec_id
  JOIN c{Q48_ITERS}l cl ON cl.c = p.cluster
),
{subs},
codesw AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, {ksel}
  FROM assigned a JOIN s0code c0 ON c0.vec_id = a.vec_id {kjoin}
),
scored AS (
  SELECT t0.vec_id AS query_id, s.vec_id AS neighbor_id,
         round({sumexpr}, 6) AS adc_dist
  FROM codesw s
  JOIN s0qt t0 ON t0.cluster = s.cluster AND t0.c = s.k0
{tjoin}
  WHERE t0.vec_id <> s.vec_id
)
SELECT query_id, neighbor_id, adc_dist, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {Q109_TOPK}
"""


Q110_SQL = _q110_sql()


# ---------------------------------------------------------------------------
# q111 — int8 symmetric-distance top-k (scalar-quantization search)
#
# The search half of q58's storage op and the third point on the
# ANN compression spectrum (flat float64 -> int8 SDC 4x -> PQ-ADC
# 128x): both sides carry q58's absmax int8 codes and the score is
# (s_q*s_c*<qv_q,qv_c>)/(n_q*n_c) — the dot product is EXACT integer
# arithmetic, so unlike every float fast path the BLAS route is
# bit-identical to the expression route, and the only error vs true
# cosine is the quantization itself.  The oracle replays the q58
# quantizer and the fixed float chain verbatim
# (operators/similarity.py:int8_sdc_topk).
# ---------------------------------------------------------------------------

Q111_NQ, Q111_TOPK = 4, 5


def q111_int8_sdc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.int8_sdc_topk(
        e,
        e.filter(F.col("vec_id") < Q111_NQ),
        "vec_id",
        "embedding",
        k_top=Q111_TOPK,
    )


Q111_SQL = f"""
WITH s AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS n,
         list_max([abs(x) FOR x IN embedding::DOUBLE[]]) / 127.0 AS s
  FROM embeddings
),
q8 AS (
  SELECT vec_id, n, s,
         [CAST(floor(x / s + 0.5) AS INT) FOR x IN v] AS qv
  FROM s WHERE s > 0
),
qq AS (SELECT * FROM q8 WHERE vec_id < {Q111_NQ}),
sc AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(q.s * c.s * list_dot_product(q.qv::DOUBLE[], c.qv::DOUBLE[])
               / (q.n * c.n), 6) AS cos_q8
  FROM qq q JOIN q8 c ON c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos_q8, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_q8 DESC, neighbor_id ASC) AS rank
  FROM sc
) WHERE rank <= {Q111_TOPK}
"""


# ---------------------------------------------------------------------------
# q114 — power-iteration principal component (distributed PCA projection)
#
# The covariance numerator needs only dim + dim(dim+1)/2 exact power
# sums — one scan, a few thousand map-side-combinable DECIMAL
# accumulators, no shuffle of vectors — then the tiny dim x dim
# matrix iterates on the driver in IEEE doubles (sequential folds ==
# DuckDB list_dot_product) and the corpus is scored once against the
# literal direction.  The oracle re-derives EVERYTHING in SQL:
# integer-grid snaps, HUGEINT covariance, three unrolled power steps
# as CTEs, projection, top-k (operators/similarity.py:
# power_iteration_pc — determinism argument there).
# ---------------------------------------------------------------------------

Q114_ITERS, Q114_TOPK, Q114_SCALE = 3, 20, 1_000_000


def q114_power_iteration_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.power_iteration_pc(
        e,
        "vec_id",
        "embedding",
        dim=Q48_DIM,
        iterations=Q114_ITERS,
        k_top=Q114_TOPK,
        quant_scale=Q114_SCALE,
    )


def _pca_cov_prefix() -> str:
    """Shared oracle prefix (q114/q116): grid-snapped X, HUGEINT
    power sums, covariance-numerator matrix ``M`` and the ``e_1``
    start vector ``v0``."""
    d = Q48_DIM
    return f"""X AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev,
         [CAST(floor(x * {Q114_SCALE} + 0.5) AS DECIMAL(19,0))
          FOR x IN embedding::DOUBLE[]] AS q
  FROM embeddings
),
cnt AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM X),
sij AS (
  SELECT a.i AS i, b.i AS j, CAST(sum(q[a.i+1] * q[b.i+1]) AS HUGEINT) AS s
  FROM X, range({d}) a(i), range({d}) b(i)
  GROUP BY a.i, b.i
),
si AS (
  SELECT a.i AS i, CAST(sum(q[a.i+1]) AS HUGEINT) AS s
  FROM X, range({d}) a(i) GROUP BY a.i
),
C AS (
  SELECT p.i, p.j, CAST(n * p.s - a.s * b.s AS DOUBLE) AS c
  FROM sij p
  JOIN si a ON a.i = p.i
  JOIN si b ON b.i = p.j
  CROSS JOIN cnt
),
cm AS (SELECT i, list(c ORDER BY j) AS r FROM C GROUP BY i),
M AS (SELECT list(r ORDER BY i) AS m FROM cm),
v0 AS (SELECT [CASE WHEN k = 0 THEN 1e0 ELSE 0e0 END
               FOR k IN range({d})] AS v)"""


def _pca_power_steps(mat: str, start: str, tag: str) -> tuple[str, str]:
    """CTE chain for Q114_ITERS power steps of matrix ``mat`` from
    vector CTE ``start``; returns (sql, final_vector_cte)."""
    d = Q48_DIM
    steps = []
    prev = start
    for t in range(1, Q114_ITERS + 1):
        steps.append(
            f"w{tag}{t} AS (SELECT [list_dot_product({mat}.m[i+1], "
            f"{prev}.v) FOR i IN range({d})] AS w FROM {mat}, {prev})"
        )
        steps.append(
            f"v{tag}{t} AS (SELECT [x / sqrt(list_dot_product(w, w)) "
            f"FOR x IN w] AS v FROM w{tag}{t})"
        )
        prev = f"v{tag}{t}"
    return ",\n".join(steps), prev


def _q114_sql() -> str:
    chain, final = _pca_power_steps("M", "v0", "a")
    return f"""
WITH {_pca_cov_prefix()},
{chain},
proj AS (
  SELECT vec_id, round(list_dot_product(ev, {final}.v), 6) AS pc1_proj
  FROM X, {final}
)
SELECT vec_id, pc1_proj, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    ORDER BY pc1_proj DESC, vec_id ASC) AS rank
  FROM proj
) WHERE rank <= {Q114_TOPK}
"""


Q114_SQL = _q114_sql()


# ---------------------------------------------------------------------------
# q116 — two-component PCA projection (Hotelling deflation)
#
# q114 extracts ONE direction and top-ks; q116 is the projection
# PRODUCT: every vector's coordinates on the top-2 principal
# directions (the 2-D spectral map used for embedding-space QA).
# Second component via deflation C <- C - lam*v v^T with the
# Rayleigh lam — every entry a fixed float chain, so the oracle
# unrolls the deflated matrix as one more CTE and re-runs the same
# power-step chain on it (operators/similarity.py:pca_project).
# ---------------------------------------------------------------------------


def q116_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.pca_project(
        e,
        "vec_id",
        "embedding",
        dim=Q48_DIM,
        n_components=2,
        iterations=Q114_ITERS,
        quant_scale=Q114_SCALE,
    )


def _q116_sql() -> str:
    d = Q48_DIM
    chain1, d0 = _pca_power_steps("M", "v0", "a")
    chain2, d1 = _pca_power_steps("M2", "v0", "b")
    return f"""
WITH {_pca_cov_prefix()},
{chain1},
lam0 AS (
  SELECT list_dot_product({d0}.v,
           [list_dot_product(M.m[i+1], {d0}.v) FOR i IN range({d})])
         AS lam
  FROM M, {d0}
),
M2 AS (
  SELECT [[M.m[i+1][j+1] - lam0.lam * {d0}.v[i+1] * {d0}.v[j+1]
           FOR j IN range({d})] FOR i IN range({d})] AS m
  FROM M, {d0}, lam0
),
{chain2}
SELECT vec_id,
       round(list_dot_product(ev, {d0}.v), 6) AS pc1_proj,
       round(list_dot_product(ev, {d1}.v), 6) AS pc2_proj
FROM X, {d0}, {d1}
"""


Q116_SQL = _q116_sql()


QUERIES = {
    "q20_exact_dup_groups": q20_exact_dup_groups,
    "q58_quantize_embeddings": q58_quantize_embeddings,
    "q46_top_words_per_lang": q46_top_words_per_lang,
    "q47_json_extract": q47_json_extract,
    # q29 stays early: its replayed oracle landed an official row in
    # r05 from this slot; q48/q49 follow it (oracles new in round 6,
    # inside the gate window under the round-6 rotation)
    "q29_ann_lsh": q29_ann_lsh,
    "q48_ivf_topk": q48_ivf_topk,
    "q49_sketch_stats": q49_sketch_stats,
    "q21_token_stats": q21_token_stats,
    "q22_quality_score": q22_quality_score,
    "q23_lang_id": q23_lang_id,
    "q24_fingerprint": q24_fingerprint,
    "q25_minhash_bands": q25_minhash_bands,
    "q26_jaccard_pairs": q26_jaccard_pairs,
    "q27_simhash": q27_simhash,
    "q28_cosine_topk": q28_cosine_topk,
    "q30_multimodal_features": q30_multimodal_features,
    "q31_embedding_near_dups": q31_embedding_near_dups,
    "q109_pq_adc_topk": q109_pq_adc_topk,
    "q110_ivf_pq_topk": q110_ivf_pq_topk,
    "q111_int8_sdc_topk": q111_int8_sdc_topk,
    "q114_power_iteration_pc": q114_power_iteration_pc,
    "q116_pca_project": q116_pca_project,
}

ORACLES = {
    "q20_exact_dup_groups": Q20_SQL,
    "q58_quantize_embeddings": Q58_SQL,
    "q46_top_words_per_lang": Q46_SQL,
    "q47_json_extract": Q47_SQL,
    "q29_ann_lsh": Q29_SQL,
    "q48_ivf_topk": Q48_SQL,
    "q21_token_stats": Q21_SQL,
    "q22_quality_score": Q22_SQL,
    "q23_lang_id": Q23_SQL,
    "q24_fingerprint": Q24_SQL,
    "q25_minhash_bands": Q25_SQL,
    "q26_jaccard_pairs": Q26_SQL,
    "q27_simhash": Q27_SQL,
    "q28_cosine_topk": Q28_SQL,
    "q30_multimodal_features": Q30_SQL,
    "q31_embedding_near_dups": Q31_SQL,
    "q49_sketch_stats": Q49_SQL,
    "q109_pq_adc_topk": Q109_SQL,
    "q110_ivf_pq_topk": Q110_SQL,
    "q111_int8_sdc_topk": Q111_SQL,
    "q114_power_iteration_pc": Q114_SQL,
    "q116_pca_project": Q116_SQL,
}

"""Deduplication operators for training-data pipelines.

Five strategies, cheapest to richest:

- exact: md5 over normalized text, hash-groupBy (one shuffle)
- fingerprint: md5 over the sorted distinct token set (order/dup
  insensitive)
- MinHash + LSH: shingle -> keyed-md5 min signature -> banding ->
  bucket self-join; candidate pairs only ever compare within a bucket,
  so cost is sum of bucket sizes squared, not n^2 — the 100 TB path
- SimHash: per-bit majority over token hashes; near-dups differ in
  few bits (Hamming ball lookup)
- n-gram Jaccard: exact set similarity, used to confirm LSH candidates

All hashing is md5-derived => deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.functions import text as TX


def normalize_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc content hash + copy count; ``n_copies > 1`` marks exact
    duplicate groups.  Window-count over the hash: one shuffle."""
    from pyspark.sql.window import Window

    h = F.md5(normalize_text(text_col)).alias("text_hash")
    return df.select(F.col(id_col), h).withColumn(
        "n_copies", F.count(F.lit(1)).over(Window.partitionBy("text_hash"))
    )


def keep_first_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative of each exact-dup group."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(normalize_text(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 5,
) -> DataFrame:
    """(id, band_id, band_hash) — the LSH index. Docs too short to
    shingle get no bands (cannot near-dup-match)."""
    rows_per_band = num_hashes // bands
    sig = TX.minhash_signature(text_col, num_hashes, shingle_n)
    # docs too short to shingle produce null signatures; concat_ws
    # would silently skip them and fabricate a band hash — exclude
    df = df.filter(F.size(TX.tokens(text_col)) >= shingle_n)
    banded = df.select(
        F.col(id_col),
        F.posexplode(TX.lsh_band_hashes(sig, bands, rows_per_band)).alias(
            "band_id", "band_hash"
        ),
    )
    return banded.filter(F.col("band_hash").isNotNull())


def near_dup_candidates(bands_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any LSH band.

    The self-join key is (band_id, band_hash): shuffle co-locates each
    bucket, pair fan-out is per-bucket — the property that keeps this
    sub-quadratic at corpus scale.
    """
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage
    after LSH).  Shingle sets are deduped before set math."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(TX.shingles(text_col, shingle_n)).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (
        pairs.join(a, pairs.id_a == F.col(f"a.{id_col}"))
        .join(b, pairs.id_b == F.col(f"b.{id_col}"))
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return joined.select(
        "id_a",
        "id_b",
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    )


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash from md5 nibbles, as a pure Column expression.

    For bit ``i``: nibble = hex digit ``i DIV 4`` of md5(token),
    bit = ``(nibble >> (i mod 4)) & 1``; the simhash bit is set when
    the (+1/-1) balance over all tokens is strictly positive.
    16 bits keeps the expression tree codegen-friendly; at scale the
    same construction widens via an explode-aggregate formulation.
    """
    t = TX.tokens(col)
    hexes = F.transform(t, lambda x: F.md5(x))

    def bit_fold(pos: int, shift: int):
        # closure factory: keeps the fold lambda strictly 2-arg
        def fold(acc, h):
            nib = (
                F.instr(F.lit("0123456789abcdef"), F.substring(h, pos + 1, 1)) - 1
            )
            return acc + F.when(
                nib.bitwiseAND(F.lit(1 << shift)) != 0, F.lit(1)
            ).otherwise(F.lit(-1))

        return fold

    bit_terms = []
    for i in range(16):
        balance = F.aggregate(hexes, F.lit(0), bit_fold(i // 4, i % 4))
        bit_terms.append(F.when(balance > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bit_terms[0]
    for term in bit_terms[1:]:
        out = out + term
    return out


def hamming16(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))

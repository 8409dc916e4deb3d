"""Broadcast Bloom-filter runtime prefilter for selective semi joins.

The classic big-data join accelerator (the hand-rolled form of
Spark's own ``spark.sql.optimizer.runtime.bloomFilter`` injection,
exposed as an explicit operator so a pipeline can build the filter
ONCE and reuse it across many probe-side scans): hash the build-side
keys into an ``m``-bit Bloom bitmap, push the membership test into
the probe-side SCAN (pure integer expressions inside whole-stage
codegen — ``xxhash64`` + shifts + masks, no UDF), and only the
surviving rows reach the exact join.

Correctness contract: a Bloom filter has NO false negatives, so
``prefilter -> exact semi join`` returns exactly the plain semi
join's rows — false positives are removed by the exact join.  The
result is therefore hash-independent (the oracle is the plain SQL
semi join) and the internal hash family never needs cross-engine
replay.

Scale shape: the build is one ``distinct`` over at most ``m_bits``
bit positions (the collect is bounded by the BITMAP size, never the
key count — 8192 bits collects <= 8192 ints no matter how many
build keys hashed into them), the bitmap rides in the plan as ONE
literal ``array<long>`` expression (m/64 words), and the probe side
never shuffles until after the prefilter has discarded the bulk of
it.  At 100 TB the win is shuffle bytes: with a 1% selective build
side, ~99% of probe rows die at scan speed instead of crossing the
wire into the join.  Size ``m_bits`` >= ~10x the expected distinct
build keys to keep the false-positive rate low single digits
(2.5k keys in 8k bits saturates the bitmap and prefilters nothing —
still correct, just no savings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 8192, n_hashes: int = 3
) -> list[int]:
    """The build side: distinct Bloom bit positions of ``keys``,
    packed into signed 64-bit words (Spark ``long`` literals).

    Distributed work is ONE explode + distinct over bit positions
    (bounded output: <= ``m_bits`` rows); the driver only packs the
    already-bounded position list into ``m_bits/64`` ints.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos_cols = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(m_bits)).alias("p")
        for s in range(n_hashes)
    ]
    rows = (
        keys.select(F.explode(F.array(*pos_cols)).alias("p")).distinct().collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement fold into the signed range of a Spark long
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    build_key: str,
    m_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """Exact semi join of ``fact`` against ``keys``, Bloom-prefiltered.

    The membership test is a scan-side conjunction of ``n_hashes``
    integer probes against the literal bitmap — evaluated before any
    exchange, so rows the filter rejects never shuffle.  Returns the
    same rows as ``fact SEMI JOIN keys ON fact_key = build_key``.
    """
    words = bloom_bitmap(keys, build_key, m_bits, n_hashes)
    warr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    probes = []
    for s in range(n_hashes):
        p = f"pmod(xxhash64({fact_key}, {s}), {m_bits})"
        probes.append(
            f"((shiftright(element_at({warr}, cast(({p}) div 64 AS INT) + 1),"
            f" cast(({p}) % 64 AS INT)) & 1) = 1)"
        )
    prefiltered = fact.filter(F.expr(" AND ".join(probes)))
    return prefiltered.join(
        keys.select(F.col(build_key).alias("__bk")).distinct(),
        F.col(fact_key) == F.col("__bk"),
        "left_semi",
    )

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
from pyspark.sql import types as T

#: Above this bitmap size :func:`bloom_semi_join` stops inlining the
#: bitmap and routes to the plain semi join.  The bitmap rides in the
#: plan as ``m_bits / 64`` literal longs, so plan size grows linearly
#: with ``m_bits``: the 8192-bit default is 128 literals (trivial),
#: 2^18 bits is 4096 literals (~100 KB of plan — the ceiling), and a
#: caller sizing ``m_bits`` for a 10^9-key build side (~10^10 bits)
#: would otherwise inline a multi-GB expression.  At that scale the
#: right tool is Spark's own ``spark.sql.optimizer.runtime.bloomFilter``
#: injection or a pre-bucketed join, not a literal bitmap.
MAX_LITERAL_BITS = 1 << 18

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _common_key_cast(build_t: T.DataType, fact_t: T.DataType) -> str | None:
    """The cast (``None`` = none needed) that makes ``xxhash64`` agree
    on both key columns.  Spark's hash functions are TYPE-sensitive —
    ``xxhash64(1 AS INT) != xxhash64(1 AS BIGINT)`` — so hashing two
    differently-typed but join-equal columns raw would produce Bloom
    FALSE NEGATIVES and silently break the semi-join contract.  Equal
    types hash as-is; integral families widen to ``bigint`` (value-
    preserving, so equal values hash equal); anything else is refused
    rather than guessed (fractional/string coercions change join
    semantics in ways a prefilter must not re-implement)."""
    if build_t == fact_t:
        return None
    if isinstance(build_t, _INTEGRAL) and isinstance(fact_t, _INTEGRAL):
        return "bigint"
    raise ValueError(
        f"bloom_semi_join key types differ ({build_t.simpleString()} vs "
        f"{fact_t.simpleString()}) and are not both integral — cast the "
        f"columns to a common type before calling"
    )


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    n_hashes: int = 3,
    cast_to: str | None = None,
) -> list[int]:
    """The build side: distinct Bloom bit positions of ``keys``,
    packed into signed 64-bit words (Spark ``long`` literals).

    Distributed work is ONE explode + distinct over bit positions
    (bounded output: <= ``m_bits`` rows); the driver only packs the
    already-bounded position list into ``m_bits/64`` ints.
    ``cast_to`` (when set) canonicalizes the key type before hashing —
    it must match the probe side's cast (see :func:`_common_key_cast`).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    if m_bits > MAX_LITERAL_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds MAX_LITERAL_BITS={MAX_LITERAL_BITS}: "
            f"the bitmap is inlined as m_bits/64 literal longs and the "
            f"plan would bloat; shrink m_bits or use the plain semi join"
        )
    key = F.col(key_col) if cast_to is None else F.col(key_col).cast(cast_to)
    pos_cols = [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)).alias("p")
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

    Differently-typed (but integral) key columns are widened to
    ``bigint`` on BOTH sides before hashing — Spark hash functions are
    type-sensitive, so hashing the raw columns would otherwise yield
    false negatives (see :func:`_common_key_cast`); non-integral type
    mismatches raise.  Above :data:`MAX_LITERAL_BITS` the literal
    bitmap would bloat the plan, so the call routes to the plain semi
    join (same rows, no prefilter) instead of failing.
    """
    if m_bits > MAX_LITERAL_BITS:
        return fact.join(
            keys.select(F.col(build_key).alias("__bk")).distinct(),
            F.col(fact_key) == F.col("__bk"),
            "left_semi",
        )
    cast_to = _common_key_cast(
        keys.schema[build_key].dataType, fact.schema[fact_key].dataType
    )
    words = bloom_bitmap(keys, build_key, m_bits, n_hashes, cast_to=cast_to)
    warr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    fk = fact_key if cast_to is None else f"cast({fact_key} AS {cast_to})"
    probes = []
    for s in range(n_hashes):
        p = f"pmod(xxhash64({fk}, {s}), {m_bits})"
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

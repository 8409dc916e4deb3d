"""Vector math over ``array<float>`` embedding columns.

Pure Column expressions (``zip_with`` + ``aggregate`` left-folds) —
JVM-side, no UDF.  The fold order is the element order, so dot
products are bit-identical to any engine that loops the list
sequentially (DuckDB's ``list_dot_product``), which is what makes
similarity results oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|) — written exactly like the oracle SQL
    (``sqrt(dot(a,a)) * sqrt(dot(b,b))`` — NOT ``sqrt(na*nb)``, which
    is a different float expression).  The denominator is nullif-
    guarded so a zero vector yields NULL on BOTH engines (Spark's
    non-ANSI x/0.0 is NULL; DuckDB's IEEE default is inf/NaN — NaN
    would sort above real similarities in a DESC top-k)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))

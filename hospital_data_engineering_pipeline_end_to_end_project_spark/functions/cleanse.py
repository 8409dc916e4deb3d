"""Cleanse-cast operator library.

The single most repeated operator in the reference is the
*error-marker-aware cast*: raw columns are unions of
``valid | null | marker-string`` (``generate_hospital_data.py:26-36``;
markers like ``ERR``, ``TEMP_ERR``, ``COST_ERR``, ``EXP_ERR``,
``BAD_AMOUNT``) and every Silver transform is a hand-rolled
``when(isNull | isin(markers)).otherwise(cast)`` chain
(``Silver Layer.py:28-57,182-198,297-303,399-416,507-517,590-610``).

Here it is one parameterized function family.  Everything stays in
built-in Column expressions — whole-stage codegen applies, no Python
in the row path, so the same plans run unchanged on a 1000-executor
cluster.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the reference generator's complete error-marker vocabulary plus the
#: usual CSV null spellings
DEFAULT_MARKERS = (
    "ERR",
    "TEMP_ERR",
    "COST_ERR",
    "EXP_ERR",
    "BAD_AMOUNT",
    "",
    "-",
    "null",
    "NULL",
    "N/A",
)


def clean_cast(
    col: Column | str,
    target_type: str,
    markers: Iterable[str] = DEFAULT_MARKERS,
    trim_first: bool = True,
) -> Column:
    """Cast a dirty string column, nulling error markers first.

    Generalizes ``Silver Layer.py:28-57`` etc.  ``try_cast`` semantics
    on top: any residual unparseable value becomes null instead of a
    runtime error (the reference notes ``try_cast`` was unavailable to
    it, ``Silver Layer.py:180``).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string")) if trim_first else c.cast("string")
    cleaned = F.when(s.isNull() | s.isin(*markers), F.lit(None)).otherwise(s)
    return cleaned.try_cast(target_type)


def regex_scrub_cast(
    col: Column | str,
    target_type: str,
    keep_pattern: str = r"[^0-9\.\-]",
    markers: Iterable[str] = DEFAULT_MARKERS,
) -> Column:
    """Strip junk characters then cast — the reference's amount cleaner
    (``regexp_replace(col, '[^0-9\\.\\-]', '')`` then cast,
    ``Silver Layer.py:184-198``) and phone scrub (``:413-416``)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    nulled = F.when(s.isNull() | s.isin(*markers), F.lit(None)).otherwise(s)
    scrubbed = F.regexp_replace(nulled, keep_pattern, "")
    return (
        F.when(scrubbed == "", F.lit(None)).otherwise(scrubbed).try_cast(target_type)
    )


def domain_filter(
    col: Column | str, allowed: Iterable[str], normalize: bool = True
) -> Column:
    """Null out values outside an allowed domain — the reference's
    gender rule ``isin("M","F","O")`` (``Silver Layer.py:406-410``)."""
    c = F.col(col) if isinstance(col, str) else col
    v = F.trim(c.cast("string")) if normalize else c
    return F.when(v.isin(*allowed), v).otherwise(F.lit(None))


def date_order_rule(
    start: Column | str, end: Column | str
) -> Column:
    """Null an end date that precedes its start date — the reference's
    discharge-before-admission sanity rule (``Silver Layer.py:44-48``).
    Returns the corrected *end* column."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.when(e < s, F.lit(None)).otherwise(e)


def normalize_label(col: Column | str) -> Column:
    """``initcap(trim(x))`` — reason normalization
    (``Silver Layer.py:49``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(F.trim(c))


def require_keys(df: DataFrame, keys: Iterable[str]) -> DataFrame:
    """Drop rows missing any required key after cleaning
    (``df.dropna(subset=...)``, ``Silver Layer.py:69,214,306``)."""
    return df.dropna(subset=list(keys))


def changed(left_prefix_cols: Iterable[Column], right_cols: Iterable[Column]) -> Column:
    """Null-safe any-attribute-changed predicate.

    The reference uses ``!=`` in its merge change conditions
    (``Silver Layer.py:92-98``), which never fires on transitions
    to/from NULL; this uses ``NOT (a <=> b)`` per SURVEY 2.6.
    """
    preds = [~l.eqNullSafe(r) for l, r in zip(left_prefix_cols, right_cols)]
    out = F.lit(False)
    for p in preds:
        out = out | p
    return out

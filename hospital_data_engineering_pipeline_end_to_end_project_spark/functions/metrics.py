"""Observation metrics.

The reference audits row counts by re-running the full lineage
(``df.count()`` after each merge, ``Silver Layer.py:125`` — a second
complete recomputation).  ``df.observe`` attaches named aggregates to
the existing plan: metrics are collected as a side effect of the ONE
write action, at zero extra passes — the difference between 1x and 2x
scan cost on a 100 TB merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_write(
    df: DataFrame,
    writer_fn,
    count_col_nonnull: str | None = None,
) -> dict[str, int]:
    """Write ``df`` via ``writer_fn(observed_df)`` and return metrics
    gathered during that same action: row count and (optionally) the
    non-null count of one column.

    Example::

        metrics = observed_write(state, lambda d: d.write.parquet(p))
    """
    obs = Observation("write_metrics")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if count_col_nonnull:
        aggs.append(F.count(count_col_nonnull).alias("n_nonnull"))
    observed = df.observe(obs, *aggs)
    writer_fn(observed)
    got = obs.get
    return {k: int(v) for k, v in got.items()}

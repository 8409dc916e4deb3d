"""Central query registry — the driver-facing catalog.

Merges the per-module catalogs (relational parity, SCD2/medallion,
LLM-data-pipeline extensions).  ``queries()`` maps name ->
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` maps the same names
to DuckDB-runnable ANSI SQL.  Names missing from ``oracle_sql()`` are
non-SQL-expressible operators (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import relational

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    # import errors must surface, not shrink the catalog: a silently
    # dropped module would erase a whole query family from the driver's
    # correctness gate (every optional dependency — delta-spark, media
    # codecs — is already guarded inside its own module)
    mods = [relational]
    for name in (
        "scd2_queries",
        "llm_ops",
        "advanced",
        "entry_extras",
        "data_prep",
        "analytics_ext",
    ):
        mods.append(
            __import__(
                f"hospital_data_engineering_pipeline_end_to_end_project_spark.plans.{name}",
                fromlist=[name],
            )
        )
    return mods


def queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        # a module may need side-input fixtures materialized before its
        # oracle SQL can run (q40 reads a generated raw file)
        prepare = getattr(m, "PREPARE", None)
        if prepare is not None:
            prepare()
        out.update(m.ORACLES)
    return out

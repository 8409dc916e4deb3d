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
    #
    # ORDER MATTERS: the driver's correctness gate records only the
    # first 50 entries of queries() in registration order.  Rounds 1-4
    # attested the relational/scd2/llm_ops/advanced families (all
    # hash-green in CORRECTNESS_r0{1,3,4}); round 5 rotates the
    # never-gated families (analytics_ext, data_prep, entry_extras'
    # q44/q45) to the front so they finally receive official rows.
    # Every query keeps its oracle regardless of position — the full
    # 83-query catalog is attested end-to-end by
    # tests/test_oracle_parity.py in every pytest run.
    mods = []
    for name in (
        "analytics_ext",
        "data_prep",
        "entry_extras",
        "scd2_queries",
        "llm_ops",
        "advanced",
    ):
        mods.append(
            __import__(
                f"hospital_data_engineering_pipeline_end_to_end_project_spark.plans.{name}",
                fromlist=[name],
            )
        )
    mods.append(relational)
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

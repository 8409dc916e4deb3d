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
    # first 50 entries of queries() in registration order.  Round 6
    # gated relational/scd2/llm_ops/advanced; round 7 rotates
    # entry_extras/data_prep/analytics_ext (q43–q45, q50–q57,
    # q61–q85 — last officially attested in r05, and the round-6
    # similarity/dedupe rework touches code shared by q61/q70/q71/
    # q79) to the front for fresh official rows, which also puts the
    # queries REGISTERED this round (q86–q89) inside the window.
    # Changed-this-round queries that live elsewhere (q27 SimHash
    # widening, q48 IVF sample-training) are pinned into the window
    # via _GATE_FRONT.
    # Every query keeps its oracle regardless of position — the full
    # catalog is attested end-to-end by tests/test_oracle_parity.py
    # in every pytest run.
    mods = []
    for name in (
        "entry_extras",
        "data_prep",
        "analytics_ext",
        "llm_ops",
        "scd2_queries",
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


#: Queries pinned to the FRONT of the catalog regardless of module
#: order, so they land inside the driver's 50-entry gate window.
#: Round 7: q27 (SimHash widened to 64-bit) and q48 (IVF quantizer
#: sample-training) change this round but live in llm_ops, which sits
#: partially outside the first 50 after the rotation — pinning
#: guarantees their fresh official rows.
_GATE_FRONT = ("q27_simhash", "q48_ivf_topk")


def _front_ordered(d: dict) -> dict:
    out = {k: d[k] for k in _GATE_FRONT if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return _front_ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        # a module may need side-input fixtures materialized before its
        # oracle SQL can run (q40 reads a generated raw file)
        prepare = getattr(m, "PREPARE", None)
        if prepare is not None:
            prepare()
        out.update(m.ORACLES)
    return _front_ordered(out)

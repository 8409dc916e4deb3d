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
    # gated relational/scd2/llm_ops/advanced; round 7 rotated
    # entry_extras/data_prep/analytics_ext to the front; round 8
    # rotates BACK to llm_ops/relational/scd2/advanced (q01–q39,
    # q46–q49, q58–q60 — freshest official rows are r06, and the
    # round-7 similarity rework touched code shared by q28/q29/q31).
    # That family is 46 queries; the remaining 4 window slots land on
    # the head of entry_extras.  Queries CHANGED this round that live
    # outside the window (q87 BM25 zero-token semantics, q88
    # semantic-dedup auto-hierarchical, q40 SCD2 partition pruning)
    # are pinned in via _GATE_FRONT.
    # Every query keeps its oracle regardless of position — the full
    # catalog is attested end-to-end by tests/test_oracle_parity.py
    # in every pytest run.
    mods = []
    for name in (
        "llm_ops",
        "scd2_queries",
        "advanced",
        "entry_extras",
        "data_prep",
        "analytics_ext",
        "corpus_ops",
        "relational_ext",
    ):
        mods.append(
            __import__(
                f"hospital_data_engineering_pipeline_end_to_end_project_spark.plans.{name}",
                fromlist=[name],
            )
        )
    mods.insert(3, relational)
    return mods


#: Queries pinned to the FRONT of the catalog regardless of module
#: order, so they land inside the driver's 50-entry gate window.
#: Round 8: q28/q29/q31 share the similarity code reworked in round 7
#: (their freshest official rows are pre-rework r06); q87/q88/q40 are
#: changed THIS round (BM25 zero-token filter, semantic-dedup
#: auto-hierarchical routing, SCD2 partition pruning) but live in
#: modules outside the rotated window.
_GATE_FRONT = (
    "q28_cosine_topk",
    "q29_ann_lsh",
    "q31_embedding_near_dups",
    "q87_bm25_topk",
    "q88_semantic_dedup",
    "q40_hospital_medallion_e2e",
)


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

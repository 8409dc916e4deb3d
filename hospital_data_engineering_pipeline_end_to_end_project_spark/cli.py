"""Pipeline CLI — the runnable equivalent of the reference notebooks.

A reference user executes ``Silver Layer.py`` then ``Gold Layer.py``
top-to-bottom; here the same workflow is::

    python -m hospital_data_engineering_pipeline_end_to_end_project_spark \\
        silver --raw RAW_DIR --warehouse WH --date 2026-01-15
    ... gold --warehouse WH
    ... refresh --warehouse WH --fact fact_billing --months 2026-01,2026-02
    ... compact --path WH/gold/fact_billing --partitioned year,month
    ... validate --warehouse WH

Flags deliberately mirror the engine's injectable knobs (processing
date, state format) rather than the reference's wall-clock implicit
state.  Exit code is non-zero when ``validate`` finds SCD2 invariant
violations.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(cpus: str):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.session import get_spark

    return get_spark(app_name="hospital-pipeline", master=f"local[{cpus}]")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hospital-engine")
    p.add_argument("--cpus", default="*", help="local[N] cores (default all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("silver", help="Bronze -> Silver SCD2 merge for all entities")
    ps.add_argument("--raw", required=True)
    ps.add_argument("--warehouse", required=True)
    ps.add_argument("--date", required=True, help="processing date YYYY-MM-DD")
    ps.add_argument("--state-format", default="parquet", choices=["parquet", "delta"])

    pg = sub.add_parser("gold", help="Silver -> full Gold star schema")
    pg.add_argument("--warehouse", required=True)

    pr = sub.add_parser("refresh", help="incremental fact partition refresh + marts")
    pr.add_argument("--warehouse", required=True)
    pr.add_argument("--fact", required=True)
    pr.add_argument(
        "--months", required=True,
        help="comma-separated YYYY-MM partitions to rewrite",
    )

    pc = sub.add_parser("compact", help="small-file compaction of a parquet dir")
    pc.add_argument("--path", required=True)
    pc.add_argument("--partitioned", default=None, help="comma-separated partition cols")
    pc.add_argument("--target-mb", type=int, default=128)

    pz = sub.add_parser(
        "zorder", help="Z-order-cluster a parquet dir on multiple columns"
    )
    pz.add_argument("--path", required=True)
    pz.add_argument(
        "--by", required=True, help="comma-separated numeric cluster columns"
    )
    pz.add_argument("--num-files", type=int, default=None)
    pz.add_argument("--target-mb", type=int, default=128)

    pv = sub.add_parser("validate", help="SCD2 invariant check over Silver state")
    pv.add_argument("--warehouse", required=True)

    a = p.parse_args(argv)
    spark = _spark(a.cpus)

    if a.cmd == "silver":
        from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import medallion

        out = medallion.run_silver(
            spark, a.raw, a.warehouse, a.date, state_format=a.state_format
        )
    elif a.cmd == "gold":
        from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import star

        out = star.run_gold(spark, a.warehouse)
    elif a.cmd == "refresh":
        from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import star

        months = []
        for tok in a.months.split(","):
            y, m = tok.strip().split("-")
            months.append((int(y), int(m)))
        rows = star.refresh_fact_partitions(spark, a.warehouse, a.fact, months)
        out = {"fact": a.fact, "rows_refreshed": rows}
        out.update(star.refresh_marts(spark, a.warehouse))
    elif a.cmd == "compact":
        from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.compaction import (
            compact_table,
        )

        out = compact_table(
            spark,
            a.path,
            target_file_bytes=a.target_mb * 1024 * 1024,
            partition_cols=a.partitioned.split(",") if a.partitioned else None,
        )
    elif a.cmd == "zorder":
        from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.compaction import (
            zorder_table,
        )

        out = zorder_table(
            spark,
            a.path,
            cluster_cols=[c.strip() for c in a.by.split(",")],
            num_files=a.num_files,
            target_file_bytes=a.target_mb * 1024 * 1024,
        )
    elif a.cmd == "validate":
        from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import scd2
        from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import medallion

        store = medallion.SilverStore(spark, a.warehouse)
        out = {}
        bad = 0
        for name, spec in medallion.ENTITIES.items():
            if store.exists(name):
                v = scd2.validate(store.read(name), spec.scd2)
                out[name] = v
                bad += sum(v.values())
        print(json.dumps(out, default=str))
        return 1 if bad else 0

    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())

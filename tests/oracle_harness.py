"""Local mirror of the driver's duckdb-oracle compare.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, sorted column names, and an
order-insensitive canonicalized value multiset — the same gate shape
as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb

from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.readers import TPCH_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rowset(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    canon.sort(key=repr)
    return sorted_cols, canon


def compare(spark, name: str, query_fn, sql: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    sc, sr = _rowset(s_cols, s_rows)
    dc, dr = _rowset(d_cols, d_rows)

    assert sc == dc, f"{name}: column mismatch spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duckdb={len(dr)}"
    mismatches = [
        (a, b) for a, b in zip(sr, dr) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
    )

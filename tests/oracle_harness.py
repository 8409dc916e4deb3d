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


def _dtype_kinds(cols: list[str], pdf) -> dict[str, str]:
    return {c: pdf[c].dtype.kind for c in cols}


def compare(spark, name: str, query_fn, sql: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    collected = sdf.collect()
    s_rows = [tuple(r) for r in collected]

    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_pdf = res.df()
    d_rows = con.execute(sql).fetchall()
    con.close()

    # The driver canonicalizes through pandas, where DuckDB HUGEINT
    # (sum over INTEGER) lands as float64 while Spark emits int64 —
    # equal values, divergent value-hash.  Catch the int-vs-float
    # divergence locally: pandas-ify both sides and compare numeric
    # kind per column (only the i/u-vs-f split; object/date columns
    # are compared by value below).
    import pandas as pd

    s_pdf = pd.DataFrame(s_rows, columns=s_cols) if s_rows else None
    if s_pdf is not None and len(d_pdf):
        sk, dk = _dtype_kinds(s_cols, s_pdf), _dtype_kinds(d_cols, d_pdf)
        for c in set(sk) & set(dk):
            a, b = sk[c], dk[c]
            int_kinds = {"i", "u"}
            if (a in int_kinds and b == "f") or (a == "f" and b in int_kinds):
                raise AssertionError(
                    f"{name}: column {c!r} numeric-kind mismatch "
                    f"spark={a} duckdb={b} (driver value-hash would diverge; "
                    f"CAST the oracle or the Spark side)"
                )

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

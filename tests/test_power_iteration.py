"""Power-iteration PC (q114) and OLS trend (q115) semantic contracts.

Cross-engine value parity is covered by the catalog parity suites;
these tests check the MATH against independent numpy replicas and a
constructed anisotropic dataset where the power method provably
converges.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def test_projections_match_numpy_replica(spark):
    """The operator's output must equal an independent numpy replica
    of the documented algorithm (snap -> exact covariance numerator ->
    3 power steps from e1 -> project) to float tolerance."""
    import pandas as pd

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = 64
    got = {
        r["vec_id"]: r["pc1_proj"]
        for r in similarity.power_iteration_pc(
            e, "vec_id", "embedding", dim=dim, k_top=10
        ).collect()
    }

    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
    Q = np.floor(X * 1_000_000 + 0.5).astype(object)  # exact int grid
    n = len(Q)
    S = np.zeros((dim, dim), dtype=object)
    for r in Q:
        S += np.outer(r, r)
    si = Q.sum(axis=0)
    C = np.array(
        [[float(n * S[i][j] - si[i] * si[j]) for j in range(dim)] for i in range(dim)]
    )
    v = np.zeros(dim)
    v[0] = 1.0
    for _ in range(3):
        w = C @ v
        v = w / math.sqrt(float(w @ w))
    proj = {int(i): round(float(x @ v), 6) for i, x in zip(pdf["vec_id"], X)}
    for vid, p in got.items():
        assert abs(p - proj[vid]) <= 2e-6, (vid, p, proj[vid])


def test_converges_on_anisotropic_data(spark):
    """Vectors dominated by one direction: the 3-step power method
    must recover it — top-|projection| ids are exactly the rows with
    the largest coefficient on the planted direction."""
    rng = np.random.default_rng(7)
    dim = 8
    u = np.ones(dim) / math.sqrt(dim)
    rows = []
    coef = {}
    for i in range(200):
        c = float(rng.normal(0, 10.0))  # dominant axis
        noise = rng.normal(0, 0.1, dim)
        coef[i] = c
        rows.append((i, [float(x) for x in c * u + noise]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.power_iteration_pc(
        df, "vec_id", "embedding", dim=dim, k_top=5
    ).collect()
    top_ids = [r["vec_id"] for r in got]
    # the top-5 projections must be the 5 most extreme coefficients
    # on one side (sign of the recovered direction is deterministic
    # but either orientation is valid math)
    extreme_pos = sorted(coef, key=lambda i: -coef[i])[:5]
    extreme_neg = sorted(coef, key=lambda i: coef[i])[:5]
    assert set(top_ids) in (set(extreme_pos), set(extreme_neg))
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_ols_trend_matches_numpy_closed_form(spark):
    """q115's integer-sum regression must agree with the independently
    accumulated mean-centered closed form (numpy float64: different
    accumulation, same math) to float tolerance.  Intercepts are in
    original units AT x=0 (i.e. at the fixed epoch offset), matching
    the plan's definition."""
    import pandas as pd

    from hospital_data_engineering_pipeline_end_to_end_project_spark.plans import analytics_ext

    got = {
        r["event_type"]: r
        for r in analytics_ext.q115_ols_trend(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    # pandas may surface the nanos timestamp as datetime64[us] — go
    # through an explicit ns view so the epoch-seconds are unit-safe
    sec = (
        pdf["ts"].astype("datetime64[ns]").astype("int64")
        // 1_000_000_000
    ).to_numpy()
    for t, g in pdf.assign(sec=sec).groupby("event_type"):
        x = g["sec"].to_numpy(dtype=np.float64) - analytics_ext.Q115_X0
        y = np.round(g["value"].to_numpy() * 100)
        xc, yc = x - x.mean(), y - y.mean()
        slope = (xc * yc).sum() / (xc * xc).sum()
        intercept = y.mean() - slope * x.mean()
        assert got[t]["slope_per_sec"] == pytest.approx(slope / 100, abs=1e-6)
        assert got[t]["intercept"] == pytest.approx(intercept / 100, rel=1e-6)
        r = np.corrcoef(x, y)[0, 1]
        assert got[t]["r2"] == pytest.approx(r * r, abs=1e-6)


def test_pca_project_pc1_equals_single_component(spark):
    """q116's first component must be q114's direction exactly: same
    covariance, same power chain — the deflation only affects pc2."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    two = {
        r["vec_id"]: r
        for r in similarity.pca_project(
            e, "vec_id", "embedding", dim=64, n_components=2
        ).collect()
    }
    one = similarity.power_iteration_pc(
        e, "vec_id", "embedding", dim=64, k_top=10
    ).collect()
    for r in one:
        assert two[r["vec_id"]]["pc1_proj"] == r["pc1_proj"]
    assert len(two) == 500  # full-table projection, no top-k


def test_pca_project_recovers_planted_plane(spark):
    """Two planted orthogonal directions with distinct strong
    variances: the 2-D projection must separate them — pc1 tracks
    the stronger axis, pc2 the weaker, noise stays small."""
    rng = np.random.default_rng(11)
    dim = 8
    u = np.zeros(dim); u[0] = 1.0
    w = np.zeros(dim); w[1] = 1.0
    rows, a_coef, b_coef = [], {}, {}
    for i in range(300):
        a = float(rng.normal(0, 20.0))
        b = float(rng.normal(0, 5.0))
        a_coef[i], b_coef[i] = a, b
        vec = a * u + b * w + rng.normal(0, 0.05, dim)
        rows.append((i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r
        for r in similarity.pca_project(
            df, "vec_id", "embedding", dim=dim, n_components=2
        ).collect()
    }
    p1 = np.array([got[i]["pc1_proj"] for i in range(300)])
    p2 = np.array([got[i]["pc2_proj"] for i in range(300)])
    a = np.array([a_coef[i] for i in range(300)])
    b = np.array([b_coef[i] for i in range(300)])
    assert abs(np.corrcoef(p1, a)[0, 1]) > 0.99
    assert abs(np.corrcoef(p2, b)[0, 1]) > 0.99


def test_degenerate_corpus_is_defined_not_zero_division(spark):
    # all-identical vectors -> all-zero covariance -> the power step
    # has no direction to normalize; the operator must return the
    # deterministic e_1 fallback instead of raising ZeroDivisionError
    df = spark.createDataFrame(
        [(i, [2.5, -1.0, 3.0, 0.5]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    got = similarity.power_iteration_pc(df, "vec_id", "embedding", dim=4)
    assert got.count() > 0
    proj = similarity.pca_project(
        df, "vec_id", "embedding", dim=4, n_components=2
    ).collect()
    assert len(proj) == 6  # every row projected, no crash

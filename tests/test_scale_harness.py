"""Smoke tests for scale_check.py's fixture synthesizers.

The growth-ratio evidence in BASELINE.md is only as good as the
scaled fixtures: each synthesizer must multiply rows by ``copies``,
keep ids globally unique, and preserve the distribution property its
docstring claims (within-copy structure intact, cross-copy
decorrelated).  Run at copies=2 on sf0.001 so the whole module is
seconds, not minutes.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scale_check as sc  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_scaled_documents_rows_and_salting(tmp_path):
    dst = str(tmp_path / "docs")
    sc.make_scaled_documents(SF, dst, copies=2)
    base = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    out = pd.read_parquet(os.path.join(dst, "documents.parquet"))
    assert len(out) == 2 * len(base)
    assert out["doc_id"].is_unique
    # copy 0 is verbatim; copy 1 replaces every 5th token, so the
    # same doc across copies must differ while copy 0 matches base
    c0 = out[out["doc_id"] < 10_000_000].sort_values("doc_id")
    assert list(c0["text"]) == list(base.sort_values("doc_id")["text"])
    c1 = out[out["doc_id"] >= 10_000_000].sort_values("doc_id")
    assert any(a != b for a, b in zip(c0["text"], c1["text"]))


def test_scaled_embeddings_rotation_preserves_within_copy_cosine(tmp_path):
    import numpy as np

    dst = str(tmp_path / "emb")
    sc.make_scaled_embeddings(SF, dst, copies=2)
    base = pd.read_parquet(os.path.join(SF, "embeddings.parquet"))
    out = pd.read_parquet(os.path.join(dst, "embeddings.parquet"))
    assert len(out) == 2 * len(base)
    assert out["vec_id"].is_unique
    c1 = out[out["vec_id"] >= 10_000_000].sort_values("vec_id")
    a1 = np.asarray(c1["embedding"].iloc[0])
    b1 = np.asarray(c1["embedding"].iloc[1])
    a0 = np.asarray(base.sort_values("vec_id")["embedding"].iloc[0])
    b0 = np.asarray(base.sort_values("vec_id")["embedding"].iloc[1])
    # rotation is a permutation: the multiset of element products is
    # identical, but the float SUM re-associates, so equality holds
    # only to accumulation round-off
    assert float(a1 @ b1) == pytest.approx(float(a0 @ b0), abs=1e-5)


def test_scaled_tpch_dir_layout_and_keys(tmp_path):
    dst = str(tmp_path / "tpch")
    sc.make_scaled_tpch_dir(SF, dst, copies=2)
    li_dir = os.path.join(dst, "lineitem.parquet")
    parts = sorted(os.listdir(li_dir))
    assert parts == ["part-00000.parquet", "part-00001.parquet"]
    base = pd.read_parquet(os.path.join(SF, "lineitem.parquet"))
    p1 = pd.read_parquet(os.path.join(li_dir, parts[1]))
    assert len(p1) == len(base)
    # copy 1's order keys are offset — no collision with copy 0
    assert p1["l_orderkey"].min() >= 10_000_000_000
    # dims symlinked in unchanged
    assert os.path.islink(os.path.join(dst, "region.parquet"))


def test_scaled_events_same_time_range_more_users(tmp_path):
    dst = str(tmp_path / "events")
    sc.make_scaled_events(SF, dst, copies=2)
    base = pd.read_parquet(os.path.join(SF, "events.parquet"))
    out = pd.read_parquet(os.path.join(dst, "events.parquet"))
    assert len(out) == 2 * len(base)
    assert out["event_id"].is_unique
    assert out["user_id"].nunique() == 2 * base["user_id"].nunique()
    assert out["ts"].min() == base["ts"].min()
    assert out["ts"].max() == base["ts"].max()

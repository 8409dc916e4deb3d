"""Round-15 optimization pins.

Each rewritten kernel is checked against an independent stdlib/numpy
spec reimplementation of the PRIOR expression semantics, including the
edge rows (nulls, NaN, duplicate boundary values) where vectorized and
expression forms habitually disagree.
"""

from __future__ import annotations

import bisect

from pyspark.sql import functions as F


def _spec_zb(bounds: list[float], x: float | None) -> int:
    # the old binary when-tree computed "count of bounds <= x", with
    # NULL/NaN comparisons falling through every else-branch to 0
    if x is None or x != x:
        return 0
    return bisect.bisect_right(bounds, x)


def _spec_zkey(zbs: list[int], bits: int) -> int:
    n_dims = len(zbs)
    key = 0
    for d, zb in enumerate(zbs):
        for i in range(bits):
            key |= ((zb >> i) & 1) << (i * n_dims + d)
    return key


def test_zorder_kernel_matches_expression_spec(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.sources.writers import (
        with_zorder_key,
    )

    rows = [
        (1, 0.5, 10.0),
        (2, 99.9, -5.0),
        (3, None, 3.0),       # NULL dim -> bucket 0 (when-tree else-chain)
        (4, float("nan"), 7.0),  # NaN dim -> bucket 0
        (5, 42.0, None),
        (6, 42.0, 42.0),      # duplicate values across rows
        (7, 42.0, 42.0),
        (8, -1e18, 1e18),     # beyond every boundary
        (9, 0.0, 0.0),
    ] + [(10 + i, float(i * 37 % 101), float(i * 13 % 53)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    keyed = with_zorder_key(df, ["x", "y"], bits_per_dim=8)
    got = {r["id"]: (r["__zb0"], r["__zb1"], r["__zkey"]) for r in keyed.collect()}

    # reproduce the quantile boundaries the operator used
    bounds = df.approxQuantile(["x", "y"], [i / 256 for i in range(1, 256)], 0.01)
    for (rid, x, y) in rows:
        zb0 = _spec_zb(bounds[0], x)
        zb1 = _spec_zb(bounds[1], y)
        zkey = _spec_zkey([zb0, zb1], 8)
        assert got[rid] == (zb0, zb1, zkey), rid

    # schema contract: int buckets, long key, payload columns unchanged
    assert dict(keyed.dtypes)["__zb0"] == "int"
    assert dict(keyed.dtypes)["__zkey"] == "bigint"
    assert [c for c in keyed.columns[:3]] == ["id", "x", "y"]


def _spec_wav(mid: int) -> bytes:
    # independent stdlib replay of the closed-form WAV the former
    # expression chain produced
    n = 64 + mid % 64
    data = b"".join(
        ((mid * 31 + i * 7) % 65536).to_bytes(2, "little") for i in range(n)
    )
    return (
        b"RIFF"
        + (len(data) + 36).to_bytes(4, "little")
        + b"WAVE"
        + bytes.fromhex("666d742010000000")
        + bytes.fromhex("01000100803e0000007d000002001000")
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


def _spec_mjpeg(mid: int) -> bytes:
    frames = []
    for f in range(mid % 4 + 3):
        w = (mid * 5 + f) % 300 + 1
        h = (mid * 3 + f * 7) % 200 + 1
        frames.append(
            bytes.fromhex(
                "ffd8ffe000104a4649460001010000010001" "0000ffc0001108"
            )
            + h.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + bytes.fromhex("03012200021101031101ffd9")
        )
    return b"".join(frames)


def test_id_synth_kernels_match_expression_spec(spark):
    from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import (
        multimodal,
    )

    ids = [0, 1, 5, 63, 64, 599, 600, 601, 12345]
    d = spark.createDataFrame([(i,) for i in ids] + [(None,)], "doc_id long")

    wav = {r["media_id"]: r for r in
           multimodal.synthesize_wav_media(d, "doc_id").collect()}
    for i in ids:
        assert bytes(wav[i]["payload"]) == _spec_wav(i), i
        assert wav[i]["meta"]["byte_len"] == len(_spec_wav(i))
        assert wav[i]["meta"]["mime"] == "audio/wav"
    # NULL id: NULL payload, non-null meta struct with NULL byte_len
    # (the expression form's semantics)
    null_row = wav[None]
    assert null_row["payload"] is None
    assert null_row["meta"]["byte_len"] is None

    vid = {r["media_id"]: r for r in
           multimodal.synthesize_video_media(d, "doc_id").collect()}
    for i in ids:
        assert bytes(vid[i]["payload"]) == _spec_mjpeg(i), i
        assert vid[i]["meta"]["byte_len"] == len(_spec_mjpeg(i))
        assert vid[i]["meta"]["mime"] == "video/x-motion-jpeg"
    assert vid[None]["payload"] is None
    assert vid[None]["meta"]["byte_len"] is None

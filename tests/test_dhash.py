"""Perceptual image-hash dedup tier: PGM synthesis must produce real
decodable payloads, the Arrow dHash must match a per-row reference,
and the banded Hamming join must be pigeonhole-complete vs brute
force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal


def _docs(spark):
    base = [f"tok{i}" for i in range(60)]
    rows = []
    # a family of near-identical docs (1-2 token substitutions) plus
    # unrelated docs over a disjoint vocabulary
    for i in range(6):
        toks = list(base)
        for j in range(i):
            toks[10 * j] = f"swap{i}_{j}"
        rows.append((i, " ".join(toks)))
    for i in range(6, 12):
        rows.append((i, " ".join(f"other{i}_{j}" for j in range(40))))
    rows.append((99, ""))  # empty doc: flat-black thumbnail
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pgm_synthesis_decodes_roundtrip(spark):
    media = multimodal.synthesize_minhash_pgm(_docs(spark))
    n_px = multimodal.DHASH_GRID_W * multimodal.DHASH_GRID_H
    for r in media.collect():
        d = multimodal.pgm_decoder(bytes(r["payload"]))
        assert d["width"] == multimodal.DHASH_GRID_W
        assert d["height"] == multimodal.DHASH_GRID_H
        assert len(d["pixels"]) == n_px
        assert r["meta"]["mime"] == multimodal.PGM_MIME
        assert r["meta"]["byte_len"] == len(bytes(r["payload"]))
    # the registered decoder serves the same mime
    assert multimodal.registered_decoders()[multimodal.PGM_MIME] is multimodal.pgm_decoder
    # empty doc -> flat black raster
    flat = [r for r in media.collect() if r["media_id"] == 99][0]
    assert set(multimodal.pgm_decoder(bytes(flat["payload"]))["pixels"]) == {0}


def test_dhash_bands_match_reference_and_reject_corrupt(spark):
    media = multimodal.synthesize_minhash_pgm(_docs(spark))
    # corrupt one payload: truncated raster must yield decode_ok=false
    media = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 3, F.expr("substring(payload, 1, 20)"))
        .otherwise(F.col("payload")),
    )
    got = {r["media_id"]: r for r in multimodal.dhash_bands_from_pgm(media).collect()}
    assert got[3]["decode_ok"] is False and got[3]["b0"] is None
    # per-row reference dHash from the decoded pixels
    w = multimodal.DHASH_GRID_W
    for r in media.collect():
        mid = r["media_id"]
        if mid == 3:
            continue
        px = multimodal.pgm_decoder(bytes(r["payload"]))["pixels"]
        for j in range(multimodal.DHASH_BANDS):
            want = 0
            for rr in range(2):
                row = (2 * j + rr) * w
                for c in range(w - 1):
                    if px[row + c] > px[row + c + 1]:
                        want |= 1 << (rr * 8 + c)
            assert got[mid][f"b{j}"] == want, (mid, j)


def test_dhash_near_dups_complete_vs_bruteforce(spark):
    media = multimodal.synthesize_minhash_pgm(_docs(spark))
    hashes = multimodal.dhash_bands_from_pgm(media)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal.dhash_near_dups(hashes, max_hamming=3).collect()
    }
    rows = hashes.collect()
    want = {}
    for a in rows:
        for b in rows:
            if a["media_id"] >= b["media_id"]:
                continue
            h = sum(
                bin(a[f"b{j}"] ^ b[f"b{j}"]).count("1")
                for j in range(multimodal.DHASH_BANDS)
            )
            if h <= 3:
                want[(a["media_id"], b["media_id"])] = h
    # pigeonhole-complete AND exact-verified: identical dicts
    assert got == want
    # the near-identical family is found, the disjoint-vocab docs are
    # only ever paired through the flat-image degeneracy (none here:
    # 40 distinct tokens give non-flat sketches)
    assert (0, 1) in got
    assert not any(a < 6 <= b < 12 for a, b in got)


def test_dhash_max_hamming_guard(spark):
    media = multimodal.synthesize_minhash_pgm(_docs(spark))
    hashes = multimodal.dhash_bands_from_pgm(media)
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.dhash_near_dups(hashes, max_hamming=4)

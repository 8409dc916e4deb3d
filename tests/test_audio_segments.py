"""Audio segment dedup tier: the speech-shaped WAV synthesis must be
a real decodable RIFF whose samples match the closed form, and the
segment matcher must report exactly the planted shared runs."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from hospital_data_engineering_pipeline_end_to_end_project_spark.operators import multimodal


def _u16(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)


def test_speech_wav_samples_match_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "")], "doc_id long, text string"
    )
    media = {r["media_id"]: r for r in multimodal.synthesize_speech_wav(docs).collect()}
    pcm = multimodal.wav_pcm_decoder(bytes(media[1]["payload"]))
    n = multimodal.SPEECH_SAMPLES_PER_TOKEN
    assert len(pcm) == 2 * n * 3
    samples = struct.unpack(f"<{3 * n}h", pcm)
    for p, tok in enumerate(["alpha", "beta", "gamma"]):
        for j in range(n):
            u = (_u16(tok) + 7 * j) % 65536
            want = u - 65536 if u >= 32768 else u
            assert samples[p * n + j] == want, (tok, j)
    # empty doc: valid zero-sample WAV
    assert multimodal.wav_pcm_decoder(bytes(media[2]["payload"])) == b""


def test_audio_segment_pairs_find_planted_runs(spark):
    shared = [f"run{i}" for i in range(10)]  # a 10-token shared segment
    docs = spark.createDataFrame(
        [
            (1, " ".join(["a1", "a2"] + shared + ["a3", "a4", "a5"])),
            (2, " ".join(["b1"] + shared + ["b2", "b3"])),
            # shares only a 5-token prefix of the run: below min_frames=8
            (3, " ".join(shared[:5] + [f"c{i}" for i in range(8)])),
            # nothing shared
            (4, " ".join(f"d{i}" for i in range(12))),
        ],
        "doc_id long, text string",
    )
    media = multimodal.synthesize_speech_wav(docs)
    got = {
        (r["doc_a"], r["doc_b"]): (r["start_a"], r["start_b"], r["seg_frames"])
        for r in multimodal.audio_segment_pairs(media, k=4, min_frames=8).collect()
    }
    # the planted 10-frame segment, at its exact 1-based frame offsets
    assert got == {(1, 2): (3, 2, 10)}
    # lowering min_frames surfaces the 5-frame partial too
    got5 = {
        (r["doc_a"], r["doc_b"]): (r["start_a"], r["start_b"], r["seg_frames"])
        for r in multimodal.audio_segment_pairs(media, k=4, min_frames=5).collect()
    }
    assert got5[(1, 3)] == (3, 1, 5) and got5[(2, 3)] == (2, 1, 5)
    assert not any(4 in p for p in got5)


def test_audio_segment_pairs_max_df_and_guard(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"x{j}" for j in range(10))) for i in range(5)],
        "doc_id long, text string",
    )
    media = multimodal.synthesize_speech_wav(docs)
    # every doc is identical: the 10-frame run pairs all 10 ways ...
    assert multimodal.audio_segment_pairs(media, k=4, min_frames=8).count() == 10
    # ... and the boilerplate cap removes the ubiquitous grams from
    # candidate generation entirely
    assert (
        multimodal.audio_segment_pairs(media, k=4, min_frames=8, max_df=3).count()
        == 0
    )
    with pytest.raises(ValueError, match="below the gram size"):
        multimodal.audio_segment_pairs(media, k=4, min_frames=3)

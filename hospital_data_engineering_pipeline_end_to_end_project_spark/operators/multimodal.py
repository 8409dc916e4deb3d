"""Multimodal column plumbing.

Media (image/audio/video) travels as an opaque ``binary`` payload plus
a typed metadata struct; decode / feature-extraction runs as Arrow
-batched pandas functions over ``mapInPandas`` — the row format never
crosses to Python un-batched.

The actual codec step is STUBBED in this environment (no
PIL/ffmpeg/torchaudio in the container): ``decode_media`` raises
``NotImplementedError`` unless a decoder is registered, and
``extract_features`` computes deterministic byte-level features
(length, md5, frame-count estimate) so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                    T.StructField("byte_len", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("decoded_len", T.LongType(), True),
    ]
)

#: mime -> decoder registry.  Real image/audio codecs (PIL / ffmpeg /
#: soundfile) are absent from this container and would be registered
#: here by the deployment; text/plain is registered below as the one
#: codec that needs no external library, so the registry path runs
#: for real in every environment.
_DECODERS: dict[str, Callable[[bytes], object]] = {}


def register_decoder(mime: str, fn: Callable[[bytes], object]) -> None:
    _DECODERS[mime] = fn


def registered_decoders() -> dict[str, Callable[[bytes], object]]:
    """Snapshot of the registry (what :func:`decoded_stats` captures
    into its UDF closure)."""
    return dict(_DECODERS)


def decode_media(payload: bytes, mime: str):
    """Decode one media payload.  Codecs beyond text/plain are absent
    in this container; register one with :func:`register_decoder`."""
    if mime not in _DECODERS:
        raise NotImplementedError(
            f"no decoder registered for {mime!r}; image/audio libs are "
            "not available in this environment"
        )
    return _DECODERS[mime](payload)


register_decoder(
    "text/plain", lambda b: b.decode("utf-8", errors="replace")
)


def wav_pcm_decoder(b: bytes) -> bytes:
    """Minimal RIFF/WAVE chunk walker (stdlib-only): returns the raw
    PCM bytes of the ``data`` chunk.  A real deployment registers
    soundfile/ffmpeg here; this proves the registry handles a binary,
    non-UTF-8 mime end-to-end.  Malformed payloads raise — which
    :func:`decoded_stats` maps to ``decode_ok = false`` instead of a
    stage failure."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        size = struct.unpack_from("<I", b, off + 4)[0]
        if cid == b"data":
            return b[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


register_decoder("audio/wav", wav_pcm_decoder)


def decoded_stats(
    media: DataFrame,
    decoders: dict[str, Callable[[bytes], object]] | None = None,
) -> DataFrame:
    """Arrow-batched decode over the payload column.

    The decoder mapping is snapshotted at PLAN-BUILD time and shipped
    inside the UDF closure: module-level registry state does not exist
    on executors (each worker re-imports this module with an empty
    dict plus the defaults), so relying on driver-side registration
    alone would silently decode nothing on a real cluster.  Rows whose
    mime has no decoder — or whose payload makes its decoder raise —
    yield ``decode_ok = false`` instead of failing the batch: on
    100 TB of mixed media a single unknown mime or corrupt payload
    must not kill the stage.
    """
    snapshot = dict(_DECODERS) if decoders is None else dict(decoders)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok, dlen = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                fn = snapshot.get(meta["mime"])
                if fn is None or payload is None:
                    ok.append(False)
                    dlen.append(None)
                    continue
                try:
                    decoded = fn(bytes(payload))
                except Exception:
                    ok.append(False)
                    dlen.append(None)
                else:
                    ok.append(True)
                    dlen.append(len(decoded) if hasattr(decoded, "__len__") else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "decode_ok": ok,
                    "decoded_len": pd.array(dlen, dtype="Int64"),
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so
    the binary pipeline is exercisable with the shipped test data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("source"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("byte_len"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, frame_bytes: int = 1000) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    features are computed columnar-side in Python and returned as a
    batch — the pattern a real image-resize / frame-sample operator
    uses.  Features are deterministic byte functions so results are
    oracle-checkable.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    # stub frame sampler: 1 frame per `frame_bytes`
                    "n_frames": payloads.map(
                        lambda b: (len(b) // frame_bytes) + 1 if b is not None else 0
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)

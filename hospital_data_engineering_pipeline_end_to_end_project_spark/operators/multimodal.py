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

#: registry for real decoders (PIL / ffmpeg / soundfile), absent here
_DECODERS: dict[str, Callable[[bytes], object]] = {}


def register_decoder(mime: str, fn: Callable[[bytes], object]) -> None:
    _DECODERS[mime] = fn


def decode_media(payload: bytes, mime: str):
    """Decode one media payload.  STUB: no codec libraries ship in
    this container; register one with :func:`register_decoder`."""
    if mime not in _DECODERS:
        raise NotImplementedError(
            f"no decoder registered for {mime!r}; image/audio libs are "
            "not available in this environment"
        )
    return _DECODERS[mime](payload)


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

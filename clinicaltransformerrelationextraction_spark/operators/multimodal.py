"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata structs;
decode / feature-extract run as Arrow-batched pandas UDFs over
``mapInPandas``. The decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode step is stubbed behind a deterministic fake (and a
clearly-marked NotImplementedError for the real path); the Spark plumbing —
schema, batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEAT_DIM = 8


def q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Typed metadata over a binary payload column (here: utf-8 bytes of
    text standing in for image bytes): byte length, hex magic prefix,
    bytes-per-char ratio. Pure built-ins — metadata extraction never needs
    Python."""
    d = spark.read.parquet(f"{sf}/documents.parquet")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("byte_len"),
        F.lower(F.hex(F.substring(payload, 1, 8))).alias("magic_hex"),
        (F.octet_length(payload) / F.length("text")).alias(
            "bytes_per_char"
        ),
    )


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _decode_real(payload: bytes, modality: str):  # pragma: no cover
    raise NotImplementedError(
        "real decode requires PIL/ffmpeg/librosa — not in this container; "
        "plug the decoder in here, the Spark plumbing is unchanged"
    )


def _decode_fake(payload: bytes, modality: str) -> tuple[np.ndarray, int]:
    """Deterministic fake decode: FEAT_DIM moments of the byte histogram.
    Stands in for resize/frame-sample/spectrogram."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(FEAT_DIM), 0
    feats = np.array(
        [
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            float(np.median(arr)),
            arr.sum() % 997.0,
            float(arr.size),
            float((arr > 100).sum()),
        ]
    )
    n_frames = max(1, arr.size // 64)
    return feats, n_frames


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    modality: str = "image",
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched multimodal feature extraction: binary -> fixed-dim
    feature vector + frame count. Narrow map, scales linearly."""
    decode = _decode_real if real_decode else _decode_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, frames = [], []
            for payload in pdf[payload_col]:
                f, n = decode(bytes(payload), modality)
                feats.append([float(x) for x in f])
                frames.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": modality,
                    "feature": feats,
                    "n_frames": pd.array(frames, dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=_FEAT_SCHEMA)


def documents_as_media(spark: SparkSession, sf: str) -> DataFrame:
    """Adapter: documents -> (doc_id, payload binary) for plumbing tests."""
    return spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

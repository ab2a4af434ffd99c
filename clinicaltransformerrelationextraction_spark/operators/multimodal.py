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


_DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_sq_sum", T.LongType()),
        T.StructField("byte_min", T.LongType()),
        T.StructField("byte_max", T.LongType()),
        T.StructField("med2", T.LongType()),
        T.StructField("sum_mod_997", T.LongType()),
        T.StructField("n_gt100", T.LongType()),
        T.StructField("mean_micro", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Oracle-checked multimodal feature digest: the fake decode's
    byte-histogram moments (InputFeatures contract analog,
    src/data_utils.py:42-55) as EXACT integer scalars — every column is a
    bigint, so the result is sortable/hashable by any canonicalizer and the
    DuckDB oracle reproduces it bit-for-bit from hex-extracted bytes.

    mean_micro is round-half-up fixed point in pure integer arithmetic
    ((s*2e6 + n) // (2n)); med2 is 2x the median (always an integer: the sum
    of the two middle bytes for even n, twice the middle byte for odd n).
    The float feature vector of ``extract_features`` is derivable from
    these moments; this digest is the table you'd persist at 100 TB.
    """
    media = documents_as_media(spark, sf)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n = int(arr.size)
                if n == 0:
                    rows.append((int(doc_id), "image") + (0,) * 9 + (1,))
                    continue
                s = int(arr.sum())
                srt = np.sort(arr)
                med2 = int(
                    srt[n // 2] * 2 if n % 2 else srt[n // 2 - 1] + srt[n // 2]
                )
                rows.append(
                    (
                        int(doc_id),
                        "image",
                        n,
                        s,
                        int((arr * arr).sum()),
                        int(arr.min()),
                        int(arr.max()),
                        med2,
                        s % 997,
                        int((arr > 100).sum()),
                        (s * 2_000_000 + n) // (2 * n),
                        max(1, n // 64),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DIGEST_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=_DIGEST_SCHEMA)

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature-extract kernels are STUBS (the real image/audio
libraries are not in this container): they derive deterministic fake
metadata from the raw bytes, so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and differentially
testable, and swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, feature_mean double"
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio
    bytes; in production this is the parquet/tar blob column), plus the
    typed metadata struct every multimodal column should carry."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("video").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return df.withColumn(out_col, payload).withColumn(out_col + "_meta", meta)


def _decode_stub(payload: bytes):
    """Deterministic fake decode: metadata derived only from byte
    length, so an oracle can replicate it. A real decoder (PIL/ffmpeg)
    drops in here unchanged."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + n % 448,
        "height": 64 + (n * 7) % 448,
        "n_frames": 1 + n % 5,
        "feature_mean": round((n % 251) / 251.0, 6),
    }


def decode_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode over partitions: one pandas batch in, one
    metadata batch out — the shape a real image/audio featurizer uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[payload_col].map(_decode_stub)
            out = pd.DataFrame(list(meta))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODE_SCHEMA)


def resize_stub(df: DataFrame, max_side: int = 256, payload_col: str = "payload") -> DataFrame:
    """Resize placeholder: real implementation decodes + resizes the
    binary; the stub truncates bytes proportionally. Keeps the
    binary-in/binary-out contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = pdf[payload_col].map(
                lambda b: b[: max(1, int(len(b) * min(1.0, max_side / 512.0)))]
            )
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, pts_seconds double, frame_payload binary, frame_bytes long"
)


def _split_frames_stub(payload: bytes, every_n: int):
    """Deterministic fake frame extractor: treats the payload as
    ``1 + n % 5`` equal-size frames (matching _decode_stub's n_frames)
    and returns every ``every_n``-th slice. A real extractor (ffmpeg
    keyframe demux) drops in here unchanged — the surrounding Spark
    plumbing (row amplification, schema, batching) does not change."""
    n = len(payload)
    n_frames = 1 + n % 5
    size = max(1, n // n_frames)
    return [
        (i, float(i), payload[i * size : (i + 1) * size])
        for i in range(0, n_frames, every_n)
    ]


def frame_sample(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Row-amplifying frame sampler: one input row (video payload) →
    one output row per sampled frame, each with its own binary payload
    and presentation timestamp. This is the UDTF-shaped mapInPandas
    contract a real video pipeline needs (amplification factor bounded
    by every_n); only the codec inside _split_frames_stub is fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for idx, pts, fb in _split_frames_stub(bytes(payload), every_n):
                    rows.append((doc_id, idx, pts, fb, len(fb)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "pts_seconds", "frame_payload", "frame_bytes"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate int, duration_s double, rms double, n_windows int"
)


def _audio_stub(payload: bytes):
    """Deterministic fake audio decode (sample rate / duration / RMS
    energy derived from byte stats). A real decoder (soundfile/ffmpeg)
    drops in here unchanged; only this function is fake — the schema,
    Arrow batching, and windowing arithmetic are the production shape."""
    n = len(payload)
    sample_rate = (8000, 16000, 44100)[n % 3]
    duration = round(n / 1000.0, 6)
    rms = round((sum(payload[:256]) % 1009) / 1009.0, 6) if n else 0.0
    n_windows = max(1, int(duration * 1000) // 25)  # 25 ms hops
    return {
        "n_bytes": n,
        "sample_rate": sample_rate,
        "duration_s": duration,
        "rms": rms,
        "n_windows": n_windows,
    }


def audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched audio featurizer over binary payloads — the audio
    leg of the modality triple (images: decode_features / resize_stub;
    video: frame_sample)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[payload_col].map(lambda b: _audio_stub(bytes(b)))
            out = pd.DataFrame(list(meta))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_SCHEMA)

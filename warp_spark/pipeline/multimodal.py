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
    bytes; in production this is the parquet/tar blob column)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


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


def frame_sample_stub(*_args, **_kwargs):
    """Video frame sampling requires a real decoder — not available in
    this container."""
    raise NotImplementedError(
        "frame sampling needs ffmpeg/PIL; wire a real decoder into "
        "decode_features/_decode_stub"
    )

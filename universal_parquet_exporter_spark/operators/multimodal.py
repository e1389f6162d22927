"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-vectorized UDFs.

The decode step itself is STUBBED (no image/audio libs in this
container): :func:`decode_stub` derives deterministic fake features from
the raw bytes, and :func:`decode_real` raises ``NotImplementedError`` with
the integration point documented.  Everything Spark-side — schema,
``mapInArrow`` batch shape, partition behavior — is real and tested, so a
real decoder drops in without touching the plumbing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "doc_id long, n_bytes long, first_byte int, fake_width int, fake_height int"


def decode_real(payload: bytes) -> dict:  # pragma: no cover - stub by design
    """Integration point for a real decoder (PIL/ffmpeg/torchaudio)."""
    raise NotImplementedError(
        "media decoding libs are not available in this environment; "
        "swap this for PIL.Image.open/av.open and return real metadata"
    )


def _fake_features(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic stand-in features from raw bytes (vectorized):
    byte length, first byte, and a fake WxH derived from the length."""
    lengths = np.diff(offsets)
    first = np.zeros(lengths.size, dtype=np.int32)
    nonempty = lengths > 0
    first[nonempty] = data[offsets[:-1][nonempty]]
    width = (lengths % 640 + 1).astype(np.int32)
    height = (lengths % 480 + 1).astype(np.int32)
    return first, width, height


def extract_media_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """mapInArrow metadata extraction over a binary column — the real
    plumbing a decode stage would use (batch-wise, zero per-row Python)."""

    def run(iterator):
        for batch in iterator:
            ids = batch.column(id_col)
            col = batch.column(bin_col)
            combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if pa.types.is_large_binary(combined.type) or pa.types.is_large_string(combined.type):
                odtype = np.int64
            else:
                odtype = np.int32
            bufs = combined.buffers()
            offsets = np.frombuffer(bufs[1], dtype=odtype)[
                combined.offset : combined.offset + len(combined) + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
            )
            rel = offsets - offsets[0]
            d = data[offsets[0] : offsets[-1]]
            first, width, height = _fake_features(d, rel)
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": ids,
                    "n_bytes": pa.array(np.diff(rel), type=pa.int64()),
                    "first_byte": pa.array(first, type=pa.int32()),
                    "fake_width": pa.array(width, type=pa.int32()),
                    "fake_height": pa.array(height, type=pa.int32()),
                }
            )

    return df.mapInArrow(run, MEDIA_META_SCHEMA)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing demo over documents (text bytes stand in for
    an image payload; real corpora carry html/jpeg bytes here)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return extract_media_meta(payload)

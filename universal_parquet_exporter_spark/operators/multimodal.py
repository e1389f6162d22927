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


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off long, frame binary"

# pa.binary() int32-offset ceiling: INCLUSIVE max bytes per emitted
# batch, default for sample_frames' max_batch_bytes (tests pass a tiny
# value to exercise the row-slice split without allocating 2 GiB)
_MAX_FRAME_BATCH_BYTES = 2**31 - 1


def _binary_view(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets relative to row 0, flat data bytes) for a binary/string array."""
    combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    odtype = (
        np.int64
        if pa.types.is_large_binary(combined.type) or pa.types.is_large_string(combined.type)
        else np.int32
    )
    bufs = combined.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odtype)[
        combined.offset : combined.offset + len(combined) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return offsets - offsets[0], data[offsets[0] : offsets[-1]]


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    n_frames: int = 4,
    frame_bytes: int = 16,
    max_batch_bytes: int = _MAX_FRAME_BATCH_BYTES,
) -> DataFrame:
    """Frame-sampling plumbing for video/audio payloads: slice each binary
    payload at ``n_frames`` evenly-spaced offsets (a real decoder would
    seek keyframes there instead — :func:`decode_real` is the swap point).
    Entirely vectorized: one NumPy gather per frame index per batch, no
    per-row Python; output is one row per (row, frame)."""

    def run(iterator):
        for batch in iterator:
            ids = batch.column(id_col)
            offsets, data = _binary_view(batch.column(bin_col))
            lengths = np.diff(offsets)
            n = lengths.size
            for i in range(n_frames):
                starts = (lengths * i) // n_frames
                take = np.minimum(frame_bytes, lengths - starts)
                out_off = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(take, out=out_off[1:])
                pos = offsets[:-1] + starts
                # pa.binary() offsets are int32: emit in row slices whose
                # sampled bytes stay under 2 GiB (one slice in practice;
                # an int32 cast of a larger total would TRUNCATE silently)
                lo = 0
                while lo < n:
                    # cap is INCLUSIVE (max bytes per emitted batch);
                    # last hi with out_off[hi] - out_off[lo] <= cap via
                    # side='right' then -1 (side='left' under-counts by
                    # one when a boundary EQUALS the target, turning a
                    # fitting frame into a spurious overflow)
                    hi = (
                        n
                        if out_off[-1] - out_off[lo] <= max_batch_bytes
                        else int(
                            np.searchsorted(
                                out_off, out_off[lo] + max_batch_bytes, side="right"
                            )
                            - 1
                        )
                    )
                    if hi <= lo:  # single row over 2 GiB: impossible at
                        # sane frame_bytes, fail loudly rather than wrap
                        raise OverflowError("one sampled frame exceeds int32 offsets")
                    soff = out_off[lo : hi + 1] - out_off[lo]
                    total = int(soff[-1])
                    tk = take[lo:hi]
                    flat = np.repeat(pos[lo:hi], tk) + (
                        np.arange(total, dtype=np.int64) - np.repeat(soff[:-1], tk)
                    )
                    frames = pa.Array.from_buffers(
                        pa.binary(),
                        hi - lo,
                        [None, pa.py_buffer(soff.astype(np.int32)), pa.py_buffer(data[flat])],
                    )
                    yield pa.RecordBatch.from_pydict(
                        {
                            "doc_id": ids.slice(lo, hi - lo),
                            "frame_idx": pa.array(np.full(hi - lo, i, dtype=np.int32)),
                            "frame_off": pa.array(starts[lo:hi], type=pa.int64()),
                            "frame": frames,
                        }
                    )
                    lo = hi

    return df.mapInArrow(run, FRAME_SCHEMA)


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-frame deterministic sampling over documents-as-binary; frames are
    fingerprinted (md5) so the contract check is value-exact."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return sample_frames(payload).select(
        "doc_id", "frame_idx", "frame_off", F.md5("frame").alias("frame_md5")
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing demo over documents (text bytes stand in for
    an image payload; real corpora carry html/jpeg bytes here)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return extract_media_meta(payload)

"""Run-length encoding over integer value streams.

Run boundaries detected vectorized via ``np.flatnonzero(a[1:] != a[:-1])``
(SURVEY.md §2C); run values are frame-of-reference encoded, run lengths
bit-packed.  Winner for sorted/clustered columns (dict codes of ``lang``
after range partitioning, constant-timestamp crawl sessions)."""

from __future__ import annotations

import numpy as np

from .bitpack import bitpack, bitunpack, bits_needed
from .forcodec import for_decode, for_encode


def rle_runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (run_values, run_lengths) for an int array."""
    v = np.ascontiguousarray(values)
    if v.size == 0:
        return v[:0], np.empty(0, dtype=np.int64)
    breaks = np.flatnonzero(v[1:] != v[:-1])
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks + 1, [v.size]))
    return v[starts], (ends - starts).astype(np.int64)


def rle_encode(values: np.ndarray) -> tuple[dict, list[bytes]]:
    run_values, run_lengths = rle_runs(values)
    vmeta, vbufs = for_encode(run_values)
    if run_lengths.size:
        lwidth = bits_needed(int(run_lengths.max()))
    else:
        lwidth = 0
    meta = {
        "codec": "rle",
        "n": int(np.asarray(values).size),
        "runs": int(run_values.size),
        "lwidth": lwidth,
        "values": vmeta,
    }
    bufs = [bitpack(run_lengths.view(np.uint64) if run_lengths.dtype == np.int64 else run_lengths, lwidth)]
    bufs.extend(vbufs)
    return meta, bufs


def rle_decode(meta: dict, buffers: list[bytes]) -> np.ndarray:
    runs = meta["runs"]
    run_lengths = bitunpack(buffers[0], runs, meta["lwidth"]).astype(np.int64)
    run_values = for_decode(meta["values"], buffers[1:])
    if runs == 0:
        return run_values
    return np.repeat(run_values, run_lengths)

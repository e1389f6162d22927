"""Frame-of-reference: subtract the chunk minimum, bit-pack the deltas.

Arithmetic is done in uint64 two's-complement wraparound so any int64
range (including min=-2^63 .. max=2^63-1) round-trips exactly.  Winner
codec for clustered timestamps (``warc_ts`` µs int64) per FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np

from .bitpack import bitpack, bitunpack, bits_needed


def for_encode(values: np.ndarray) -> tuple[dict, list[bytes]]:
    """Encode signed/unsigned ints. Meta carries (ref, width, n, dtype)."""
    v = np.ascontiguousarray(values)
    dtype = v.dtype.str
    if v.size == 0:
        return {"codec": "for", "n": 0, "ref": 0, "width": 0, "dtype": dtype}, []
    u = v.astype(np.int64, copy=False).view(np.uint64)
    ref = int(v.min())
    deltas = u - np.uint64(np.int64(ref)).astype(np.uint64)  # wraparound-exact
    width = bits_needed(int(deltas.max()))
    return (
        {"codec": "for", "n": int(v.size), "ref": ref, "width": width, "dtype": dtype},
        [bitpack(deltas, width)],
    )


def for_decode(meta: dict, buffers: list[bytes]) -> np.ndarray:
    n = meta["n"]
    dtype = np.dtype(meta["dtype"])
    if n == 0:
        return np.empty(0, dtype=dtype)
    deltas = bitunpack(buffers[0], n, meta["width"])
    vals = (deltas + np.uint64(np.int64(meta["ref"])).astype(np.uint64)).view(np.int64)
    return vals.astype(dtype, copy=False)


def delta_encode(values: np.ndarray) -> tuple[dict, list[bytes]]:
    """Delta coding for locally-ordered streams (sequential ids,
    near-monotonic timestamps): store the first value + consecutive
    differences through :func:`for_encode`.  Differences are taken in
    uint64 two's-complement wraparound, so any int64 stream — including
    sign-crossing extremes — round-trips exactly; FOR alone can only
    exploit the global range, delta exploits the local ordering."""
    v = np.ascontiguousarray(values)
    dtype = v.dtype.str
    if v.size == 0:
        return {"codec": "delta", "n": 0, "first": 0, "dtype": dtype, "inner": None}, []
    u = v.astype(np.int64, copy=False).view(np.uint64)
    diffs = np.empty(v.size - 1, dtype=np.uint64)
    np.subtract(u[1:], u[:-1], out=diffs)  # wraparound-exact
    imeta, ibufs = for_encode(diffs.view(np.int64))
    return (
        {"codec": "delta", "n": int(v.size), "first": int(np.int64(u[0])), "dtype": dtype, "inner": imeta},
        ibufs,
    )


def delta_decode(meta: dict, buffers: list[bytes]) -> np.ndarray:
    n = meta["n"]
    dtype = np.dtype(meta["dtype"])
    if n == 0:
        return np.empty(0, dtype=dtype)
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(np.int64(meta["first"]))
    if n > 1:
        diffs = for_decode(meta["inner"], buffers).view(np.uint64)
        np.cumsum(diffs, out=out[1:])  # wraps identically to encode
        out[1:] += out[0]
    return out.view(np.int64).astype(dtype, copy=False)

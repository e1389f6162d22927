"""Bit-packing: pack non-negative integers into ceil(log2(max+1))-bit slots.

Vectorized via ``np.packbits``/``np.unpackbits`` (little-endian bit order)
over fixed-size slabs with preallocated per-process scratch buffers —
fresh large allocations are pathologically slow on fault-expensive
kernels (see :mod:`..memtune`), so the hot path never allocates more than
one slab.  Shared sub-primitive for dictionary codes, RLE run lengths and
frame-of-reference deltas (SURVEY.md §2C).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ._native import get_native

_SLAB = 1 << 16  # values per slab; _SLAB*width bits is a multiple of 8

# per-process scratch (Spark python workers are single-threaded per task)
_tmp64 = np.empty((_SLAB, 64), dtype=np.uint64)
_tmp8 = np.empty((_SLAB, 64), dtype=np.uint8)


def bits_needed(max_value: int) -> int:
    """Bits required to represent ``max_value`` (``0`` → width 0)."""
    if max_value < 0:
        raise ValueError("bitpack requires non-negative values")
    return int(max_value).bit_length()


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` into ``width``-bit little-endian slots.
    ``width == 0`` encodes a constant-zero column in zero bytes."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width == 0 or v.size == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    out = np.empty((v.size * width + 7) // 8, dtype=np.uint8)
    lib = get_native()
    if lib is not None:
        lib.upes_bitpack(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            v.size,
            width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.tobytes()
    shifts = np.arange(width, dtype=np.uint64)
    pos = 0
    for start in range(0, v.size, _SLAB):
        slab = v[start : start + _SLAB]
        k = slab.size
        t64 = _tmp64[:k, :width]
        t8 = _tmp8[:k, :width]
        np.right_shift(slab[:, None], shifts, out=t64)
        np.bitwise_and(t64, np.uint64(1), out=t8, casting="unsafe")
        packed = np.packbits(t8.ravel(), bitorder="little")
        out[pos : pos + packed.size] = packed
        pos += packed.size
    return out.tobytes()


def bitunpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`bitpack` → ``np.uint64`` array of length ``n``."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    lib = get_native()
    if lib is not None:
        lib.upes_bitunpack(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        return out
    shifts = np.arange(width, dtype=np.uint64)
    slab_bytes = _SLAB * width // 8
    done = 0
    pos = 0
    while done < n:
        take = min(_SLAB, n - done)
        nbits = take * width
        nbytes = (nbits + 7) // 8
        bits = np.unpackbits(raw[pos : pos + nbytes], count=nbits, bitorder="little")
        t64 = _tmp64[:take, :width]
        np.left_shift(bits.reshape(take, width), shifts, out=t64, casting="unsafe")
        t64.sum(axis=1, out=out[done : done + take])
        done += take
        pos += slab_bytes
    return out

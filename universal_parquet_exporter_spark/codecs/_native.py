"""Optional C fast-path for codec inner loops (FSST scan, bit-packing).

The greedy FSST scan and arbitrary-width bit (un)packing are sequential
byte loops — the only kernels NumPy cannot express without large
intermediates.  When a C compiler is present we build a tiny shared
library once per machine (atomic rename, so concurrent Spark Python
workers race safely); otherwise every caller falls back to the pure-NumPy
implementations, which stay the reference semantics (tests assert parity).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

void upes_bitpack(const uint64_t* v, int64_t n, int width, uint8_t* out) {
    __uint128_t acc = 0;
    int nb = 0;
    int64_t pos = 0;
    uint64_t mask = (width >= 64) ? ~0ULL : ((1ULL << width) - 1);
    for (int64_t i = 0; i < n; i++) {
        acc |= ((__uint128_t)(v[i] & mask)) << nb;
        nb += width;
        while (nb >= 8) {
            out[pos++] = (uint8_t)(acc & 0xFF);
            acc >>= 8;
            nb -= 8;
        }
    }
    if (nb > 0) out[pos++] = (uint8_t)(acc & 0xFF);
}

void upes_bitunpack(const uint8_t* in, int64_t n, int width, uint64_t* out) {
    __uint128_t acc = 0;
    int nb = 0;
    int64_t pos = 0;
    uint64_t mask = (width >= 64) ? ~0ULL : ((1ULL << width) - 1);
    for (int64_t i = 0; i < n; i++) {
        while (nb < width) {
            acc |= ((__uint128_t)in[pos++]) << nb;
            nb += 8;
        }
        out[i] = ((uint64_t)acc) & mask;
        acc >>= width;
        nb -= width;
    }
}

/* grouped: symbol codes grouped by first byte, sorted length-desc within
   a group; first_off[b]..first_off[b+1] is byte b's candidate range.
   sym_val/sym_mask: little-endian 8-byte value/mask per symbol, so a
   candidate check is one unaligned load + AND + compare. */
static inline uint64_t load8(const uint8_t* p) {
    uint64_t w;
    memcpy(&w, p, 8);
    return w;
}

/* two-level dispatch: symbols of length >= 2 are grouped by their FIRST
   TWO bytes (first2_off[w2]..first2_off[w2+1], length-desc within a
   bucket), so the candidate scan touches only symbols that already match
   2 bytes; length-1 symbols resolve via the direct code1[256] table.
   The common case takes ONE load in the 128 KB best2[w2] table (the
   bucket's longest candidate) verified against the tiny L1-resident
   sym_val/sym_mask arrays; only a first-candidate miss touches the
   bucket scan.  Greedy longest-match semantics identical to the NumPy
   fallback. */
int64_t upes_fsst_encode(const uint8_t* data, int64_t n,
                         const uint64_t* sym_val, const uint64_t* sym_mask,
                         const int32_t* sym_len, const uint8_t* grouped2,
                         const int32_t* first2_off, const int16_t* code1,
                         const int16_t* best2, uint8_t* out) {
    int64_t i = 0, pos = 0;
    int64_t safe = n - 8;
    while (i < n) {
        int64_t rem = n - i;
        if (rem >= 2) {
            uint32_t w2 = (uint32_t)data[i] | ((uint32_t)data[i + 1] << 8);
            int16_t b = best2[w2];
            if (b >= 0) {
                uint64_t w;
                if (i <= safe) {
                    w = load8(data + i);
                } else {
                    w = 0;
                    memcpy(&w, data + i, rem);
                }
                int l = sym_len[b];
                if (l <= rem && (w & sym_mask[b]) == sym_val[b]) {
                    out[pos++] = (uint8_t)b; i += l; continue;
                }
                /* longest candidate missed: scan the bucket tail */
                int32_t lo = first2_off[w2] + 1, hi = first2_off[w2 + 1];
                int best = -1, bl = 0;
                for (int32_t k = lo; k < hi; k++) {
                    int c = grouped2[k];
                    l = sym_len[c];
                    if (l <= rem && (w & sym_mask[c]) == sym_val[c]) {
                        best = c; bl = l; break;  /* length-desc: first hit = longest */
                    }
                }
                if (best >= 0) { out[pos++] = (uint8_t)best; i += bl; continue; }
            }
        }
        int16_t c1 = code1[data[i]];
        if (c1 >= 0) { out[pos++] = (uint8_t)c1; i += 1; }
        else { out[pos++] = 255; out[pos++] = data[i]; i += 1; }
    }
    return pos;
}

int64_t upes_fsst_decoded_size(const uint8_t* enc, int64_t n, const int32_t* sym_len) {
    int64_t i = 0, total = 0;
    while (i < n) {
        uint8_t c = enc[i];
        if (c == 255) { total += 1; i += 2; }
        else { total += sym_len[c]; i += 1; }
    }
    return total;
}

/* one unconditional unaligned 8-byte store per symbol (symbols are
   <= 8 bytes; sym_val is the zero-padded little-endian image, so the
   pad bytes are overwritten by the next token).  The caller allocates
   out with >= 7 bytes of tail slack.  ~3x the byte-loop memcpy form. */
int64_t upes_fsst_decode(const uint8_t* enc, int64_t n,
                         const uint64_t* sym_val,
                         const int32_t* sym_len, uint8_t* out) {
    int64_t i = 0, pos = 0;
    while (i < n) {
        uint8_t c = enc[i];
        if (c == 255) { out[pos++] = enc[i + 1]; i += 2; }
        else {
            memcpy(out + pos, &sym_val[c], 8);
            pos += sym_len[c]; i += 1;
        }
    }
    return pos;
}
"""

_lib = None
_tried = False


_CFLAGS = ["-O3", "-march=native", "-funroll-loops"]


def _build() -> "ctypes.CDLL | None":
    digest = hashlib.sha256((_C_SRC + repr(_CFLAGS)).encode()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "upes_native")
    so_path = os.path.join(cache_dir, f"upes_{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache_dir, exist_ok=True)
        src_path = os.path.join(cache_dir, f"upes_{digest}.c")
        tmp_so = so_path + f".tmp{os.getpid()}"
        with open(src_path, "w") as f:
            f.write(_C_SRC)
        try:
            subprocess.run(
                ["gcc", *_CFLAGS, "-shared", "-fPIC", src_path, "-o", tmp_so],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except subprocess.CalledProcessError:
            # -march=native unsupported on some toolchains
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", src_path, "-o", tmp_so],
                check=True,
                capture_output=True,
                timeout=120,
            )
        os.replace(tmp_so, so_path)  # atomic: concurrent workers race safely
    lib = ctypes.CDLL(so_path)
    i64, i32p, u8p, u64p, c_int = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int,
    )
    lib.upes_bitpack.argtypes = [u64p, i64, c_int, u8p]
    lib.upes_bitpack.restype = None
    lib.upes_bitunpack.argtypes = [u8p, i64, c_int, u64p]
    lib.upes_bitunpack.restype = None
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.upes_fsst_encode.argtypes = [u8p, i64, u64p, u64p, i32p, u8p, i32p, i16p, i16p, u8p]
    lib.upes_fsst_encode.restype = i64
    lib.upes_fsst_decoded_size.argtypes = [u8p, i64, i32p]
    lib.upes_fsst_decoded_size.restype = i64
    lib.upes_fsst_decode.argtypes = [u8p, i64, u64p, i32p, u8p]
    lib.upes_fsst_decode.restype = i64
    return lib


def get_native() -> "ctypes.CDLL | None":
    """Compiled kernels, or None (pure-NumPy fallback).  Set
    ``UPES_DISABLE_NATIVE=1`` to force the fallback (used by parity tests)."""
    global _lib, _tried
    if os.environ.get("UPES_DISABLE_NATIVE"):
        return None
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:
            _lib = None
    return _lib

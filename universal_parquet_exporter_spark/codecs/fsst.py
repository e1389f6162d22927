"""FSST-style string compression (Fast Static Symbol Table).

A static table of ≤255 symbols, each 1-8 bytes; the encoded stream is one
byte per symbol occurrence, with byte 255 as an escape prefix for bytes no
symbol covers.  Decode is exact concatenation — lossless by construction.

Public-knowledge design (Boncz, Neumann, Leis: "FSST: Fast Random Access
String Compression", VLDB 2020).  This implementation is original:

- **train** (:func:`fsst_train`): bounded iterative table construction on a
  ≤64 KiB sample — parse sample with current table, count symbol-pair
  concatenations, keep the top-gain candidates (5 rounds).
- **encode** (:func:`fsst_encode`): per-position longest-match lengths are
  precomputed fully vectorized (8-byte little-endian windows +
  ``np.searchsorted`` per symbol length); the final greedy walk is a tight
  Python loop over plain lists (~the only non-vectorized loop in the
  engine, O(output symbols), amortized by the vectorized match phase).
- **decode** (:func:`fsst_decode`): fully vectorized (escape-run parity,
  per-code lengths, cumsum offsets, one fancy-index gather).

Applies to high-entropy string/binary data buffers (``url``, ``text``;
FIXTURES.md §1) where dictionary encoding loses.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass, field

import numpy as np

from ._native import get_native

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_LEN = 8
SAMPLE_BYTES = 1 << 16
TRAIN_ROUNDS = 5


@dataclass
class FsstTable:
    symbols: list[bytes]  # index == code byte
    _arrays: tuple | None = field(default=None, repr=False, compare=False)

    def to_meta(self) -> dict:
        return {"lens": [len(s) for s in self.symbols]}

    def table_buffer(self) -> bytes:
        return b"".join(self.symbols)

    def native_arrays(self):
        """(sym_flat u8, sym_off i32, sym_len i32, grouped2 u8, first2_off
        i32[65537], code1 i16[256], sym_val u64, sym_mask u64) — symbols of
        length >= 2 grouped by their FIRST TWO bytes (length-desc within a
        bucket) so the C scan only examines candidates that already match
        two bytes; length-1 symbols resolve via the direct code1 table.
        Little-endian 8-byte value/mask pairs give a one-load candidate
        check."""
        if self._arrays is None:
            lens = np.array([len(s) for s in self.symbols], dtype=np.int32)
            offs = np.zeros(len(self.symbols) + 1, dtype=np.int32)
            np.cumsum(lens, out=offs[1:])
            flat = np.frombuffer(self.table_buffer(), dtype=np.uint8)
            vals = np.zeros(max(len(self.symbols), 1), dtype=np.uint64)
            masks = np.zeros(max(len(self.symbols), 1), dtype=np.uint64)
            code1 = np.full(256, -1, dtype=np.int16)
            by_first2: dict[int, list[int]] = {}
            for code, sym in enumerate(self.symbols):
                vals[code] = int.from_bytes(sym.ljust(8, b"\x00"), "little")
                masks[code] = (1 << (8 * len(sym))) - 1 if len(sym) < 8 else 0xFFFFFFFFFFFFFFFF
                if len(sym) == 1:
                    code1[sym[0]] = code
                else:
                    by_first2.setdefault(sym[0] | (sym[1] << 8), []).append(code)
            grouped_list: list[int] = []
            first2_off = np.zeros(65537, dtype=np.int32)
            # cumulative bucket offsets without a 65536-iteration Python
            # loop: only occupied buckets contribute
            counts = np.zeros(65536, dtype=np.int32)
            for w2, codes in by_first2.items():
                codes.sort(key=lambda c: (-len(self.symbols[c]), c))
                counts[w2] = len(codes)
            np.cumsum(counts, out=first2_off[1:])
            order = sorted(by_first2)
            for w2 in order:
                grouped_list.extend(by_first2[w2])
            grouped2 = np.array(grouped_list, dtype=np.uint8)
            # direct-mapped longest candidate per 2-byte prefix: the C
            # scan's common case is one load here + an L1 verify
            best2 = np.full(65536, -1, dtype=np.int16)
            for w2, codes in by_first2.items():
                best2[w2] = codes[0]
            self._arrays = (
                flat, offs[:-1].copy(), lens, grouped2, first2_off, code1, vals, masks, best2
            )
        return self._arrays

    @staticmethod
    def from_meta(meta: dict, buf: bytes) -> "FsstTable":
        out, pos = [], 0
        for ln in meta["lens"]:
            out.append(buf[pos : pos + ln])
            pos += ln
        return FsstTable(out)


def _token_ids(sample: bytes, table: "FsstTable") -> np.ndarray:
    """Greedy tokenization of the sample as an id stream (vectorized):
    id < 256 → symbol code into ``table``; id ≥ 256 → literal byte
    (id-256).  Runs the real encoder, then classifies its code stream."""
    if not table.symbols:
        return np.frombuffer(sample, dtype=np.uint8).astype(np.int32) + 256
    enc = np.frombuffer(fsst_encode(sample, table), dtype=np.uint8)
    n = enc.size
    marker = np.zeros(n, dtype=bool)
    is_ff = enc == ESCAPE
    if is_ff.any():
        idx = np.flatnonzero(is_ff)
        run_start = np.concatenate(([True], np.diff(idx) > 1))
        run_id = np.cumsum(run_start) - 1
        starts = idx[run_start]
        offset = idx - starts[run_id]
        marker[idx[offset % 2 == 0]] = True
    literal = np.zeros(n, dtype=bool)
    lit_pos = np.flatnonzero(marker) + 1
    literal[lit_pos[lit_pos < n]] = True
    ids = enc.astype(np.int32)
    ids[literal] += 256
    return ids[~marker]


def fsst_train(sample: bytes) -> FsstTable:
    """Build a symbol table from a sample — bounded iterative construction
    (parse with current table, count adjacent-token concatenations, keep
    the top-gain candidates), all counting vectorized with ``np.unique``."""
    sample = sample[:SAMPLE_BYTES]
    if not sample:
        return FsstTable([])
    table: list[bytes] = []
    for _ in range(TRAIN_ROUNDS):
        def materialize(tid: int) -> bytes:
            return table[tid] if tid < 256 else bytes([tid - 256])

        # (ids < 256 always index into the current table; escapes are ≥ 256)

        ids = _token_ids(sample, FsstTable(table))
        lens = np.ones(512, dtype=np.int32)
        for i, s in enumerate(table):
            lens[i] = len(s)

        uniq1, cnt1 = np.unique(ids, return_counts=True)
        gain1 = cnt1 * np.maximum(lens[uniq1] - 1, 1)

        a, b = ids[:-1], ids[1:]
        ok = (lens[a] + lens[b]) <= MAX_LEN
        pkey = a[ok].astype(np.int64) * 512 + b[ok]
        uniq2, cnt2 = np.unique(pkey, return_counts=True)
        la = lens[(uniq2 // 512).astype(np.int32)]
        lb = lens[(uniq2 % 512).astype(np.int32)]
        gain2 = cnt2 * (la + lb - 1)

        # take a generous top slice, materialize bytes, dedupe by max gain
        order1 = np.argsort(-gain1)[: 2 * MAX_SYMBOLS]
        order2 = np.argsort(-gain2)[: 2 * MAX_SYMBOLS]
        gains: dict[bytes, int] = {}
        for i in order1:
            s = materialize(int(uniq1[i]))
            g = int(gain1[i])
            if g > gains.get(s, 0):
                gains[s] = g
        for i in order2:
            key = int(uniq2[i])
            s = materialize(key // 512) + materialize(key % 512)
            g = int(gain2[i])
            if g > gains.get(s, 0):
                gains[s] = g
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        table = [s for s, g in ranked[:MAX_SYMBOLS] if g > 1]
    return FsstTable(table)


def _match_tables(table: FsstTable):
    """Per symbol length: (sorted uint64 prefix values, code array)."""
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    tmp: dict[int, list[tuple[int, int]]] = {}
    for code, sym in enumerate(table.symbols):
        val = int.from_bytes(sym.ljust(8, b"\x00"), "little")
        tmp.setdefault(len(sym), []).append((val, code))
    for ln, pairs in tmp.items():
        pairs.sort()
        vals = np.array([p[0] for p in pairs], dtype=np.uint64)
        codes = np.array([p[1] for p in pairs], dtype=np.uint8)
        by_len[ln] = (vals, codes)
    return by_len


_LEN_MASKS = np.array(
    [0] + [(1 << (8 * ln)) - 1 for ln in range(1, 8)] + [0xFFFFFFFFFFFFFFFF],
    dtype=np.uint64,
)

_ENC_SLAB = 1 << 22  # positions per vectorized match slab (4 Mi)


def fsst_encode(data: bytes | np.ndarray, table: FsstTable) -> bytes:
    """Encode a byte buffer with ``table``; returns the code stream."""
    d = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.ascontiguousarray(data, dtype=np.uint8)
    n = d.size
    if n == 0:
        return b""
    lib = get_native()
    if lib is not None:
        flat, offs, lens, grouped2, first2_off, code1, vals, masks, best2 = table.native_arrays()
        out = np.empty(2 * n, dtype=np.uint8)  # worst case: all escaped
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        m = lib.upes_fsst_encode(
            d.ctypes.data_as(u8p), n,
            vals.ctypes.data_as(u64p), masks.ctypes.data_as(u64p),
            lens.ctypes.data_as(i32p), grouped2.ctypes.data_as(u8p),
            first2_off.ctypes.data_as(i32p), code1.ctypes.data_as(i16p),
            best2.ctypes.data_as(i16p),
            out.ctypes.data_as(u8p),
        )
        return out[:m].tobytes()
    by_len = _match_tables(table)
    lengths = sorted(by_len.keys(), reverse=True)

    match_len = np.zeros(n, dtype=np.uint8)
    match_code = np.zeros(n, dtype=np.uint8)
    padded = np.concatenate([d, np.zeros(8, dtype=np.uint8)])
    for start in range(0, n, _ENC_SLAB):
        stop = min(start + _ENC_SLAB, n)
        win = np.lib.stride_tricks.sliding_window_view(padded[start : stop + 8], 8)[: stop - start]
        w64 = np.ascontiguousarray(win).view(np.uint64).ravel()
        ml = match_len[start:stop]
        mc = match_code[start:stop]
        for ln in lengths:
            vals, codes = by_len[ln]
            masked = w64 & _LEN_MASKS[ln]
            idx = np.searchsorted(vals, masked)
            idx_c = np.minimum(idx, vals.size - 1)
            hit = (vals[idx_c] == masked) & (ml == 0)
            if ln > 1:
                # a symbol longer than the remaining tail must not match
                tail = n - (start + np.flatnonzero(hit))
                hit_pos = np.flatnonzero(hit)
                ok = tail >= ln
                hit = np.zeros_like(hit)
                hit[hit_pos[ok]] = True
            mc[hit] = codes[idx_c[hit]]
            ml[hit] = ln

    # greedy walk (sequential by nature; plain-list loop, O(#tokens))
    ml_l = match_len.tolist()
    mc_l = match_code.tolist()
    d_l = d.tolist()
    out = bytearray()
    i = 0
    append = out.append
    while i < n:
        ln = ml_l[i]
        if ln:
            append(mc_l[i])
            i += ln
        else:
            append(ESCAPE)
            append(d_l[i])
            i += 1
    return bytes(out)


def fsst_decode(enc: bytes, table: FsstTable) -> bytes:
    """Vectorized inverse of :func:`fsst_encode`."""
    return fsst_decode_np(enc, table).tobytes()


def fsst_decode_np(enc: bytes, table: FsstTable) -> np.ndarray:
    """:func:`fsst_decode` returning a uint8 numpy array WITHOUT the
    final bytes copy — the chunk decoder wraps the result in Arrow
    buffers directly, and at document-body sizes the avoided copy is a
    measurable share of decode wall."""
    codes = np.frombuffer(enc, dtype=np.uint8)
    n = codes.size
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    lib = get_native()
    if lib is not None:
        arrays = table.native_arrays()
        lens, vals = arrays[2], arrays[6]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        total = lib.upes_fsst_decoded_size(codes.ctypes.data_as(u8p), n, lens.ctypes.data_as(i32p))
        # +8 tail slack: the C loop writes each symbol as one unaligned
        # 8-byte store (zero-padded image), so the last token may touch
        # up to 7 bytes past `total`
        out = np.empty(total + 8, dtype=np.uint8)
        lib.upes_fsst_decode(
            codes.ctypes.data_as(u8p), n,
            vals.ctypes.data_as(u64p),
            lens.ctypes.data_as(i32p), out.ctypes.data_as(u8p),
        )
        return out[:total]
    # classify positions: escape markers / literals / symbol codes.
    is_ff = codes == ESCAPE
    # markers alternate within each maximal run of 0xFF bytes (run parity),
    # except a run can start as a literal only if preceded by a marker —
    # impossible, since a marker is itself 0xFF and would extend the run.
    marker = np.zeros(n, dtype=bool)
    if is_ff.any():
        idx = np.flatnonzero(is_ff)
        run_start = np.concatenate(([True], np.diff(idx) > 1))
        run_id = np.cumsum(run_start) - 1
        starts = idx[run_start]
        offset = idx - starts[run_id]
        marker[idx[offset % 2 == 0]] = True
    literal = np.zeros(n, dtype=bool)
    lit_src = np.flatnonzero(marker) + 1
    # a marker is always followed by its literal byte inside the stream
    literal[lit_src] = True
    symbol = ~(marker | literal)

    sym_lens = np.zeros(MAX_SYMBOLS + 1, dtype=np.int64)
    for c, s in enumerate(table.symbols):
        sym_lens[c] = len(s)
    sym_flat = np.frombuffer(table.table_buffer(), dtype=np.uint8)
    sym_offsets = np.zeros(MAX_SYMBOLS + 1, dtype=np.int64)
    np.cumsum(sym_lens[:-1], out=sym_offsets[1:])

    out_len = np.zeros(n, dtype=np.int64)
    out_len[literal] = 1
    out_len[symbol] = sym_lens[codes[symbol]]
    total = int(out_len.sum())

    src_start = np.zeros(n, dtype=np.int64)
    src_start[literal] = sym_flat.size + np.flatnonzero(literal)
    src_start[symbol] = sym_offsets[codes[symbol]]
    source = np.concatenate([sym_flat, codes])

    out_off = np.zeros(n, dtype=np.int64)
    np.cumsum(out_len[:-1], out=out_off[1:])
    pos_of_byte = np.repeat(src_start, out_len) + (
        np.arange(total, dtype=np.int64) - np.repeat(out_off, out_len)
    )
    return source[pos_of_byte]

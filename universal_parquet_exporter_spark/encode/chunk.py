"""Per-column chunk encoding with cost-model codec auto-selection.

For every Arrow column chunk the selector computes cheap stats
(cardinality, run count, value range, sampled FSST ratio) and picks the
codec with the smallest *estimated* encoded size (SURVEY.md §2C, §7
Phase 3); the decision is recorded in the chunk meta so lineage can
report it.  All kernels are lossless; ``decode_array(encode_array(a)) ==
a`` bit-identically, including null masks — the engine's analog of the
reference's write-then-read-back contract
(``/root/reference/tests/test_parquet_writer.py:38-58``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.bitpack import bitpack, bits_needed, bitunpack
from ..codecs.dictionary import dict_decode_ints, dict_encode_ints
from ..codecs.forcodec import delta_decode, delta_encode, for_decode, for_encode
from ..codecs.fsst import FsstTable, fsst_decode_np, fsst_encode, fsst_train
from ..codecs.rle import rle_decode, rle_encode, rle_runs

# ---------------------------------------------------------------------------
# Arrow type tags (compact, JSON-safe)
# ---------------------------------------------------------------------------


def type_tag(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return f"ts:{t.unit}:{t.tz or ''}"
    if pa.types.is_decimal(t):
        # the dec: codec paths assume the 16-byte decimal128 layout;
        # decimal256 (precision > 38) would be silently corrupted by the
        # word-slicing, so reject it loudly here
        if not pa.types.is_decimal128(t):
            raise TypeError(
                f"unsupported Arrow type for encode: {t} (decimal128 only; "
                "cast precision <= 38 upstream)"
            )
        return f"dec:{t.precision}:{t.scale}"
    if pa.types.is_list(t):
        return f"list<{type_tag(t.value_type)}>"
    if pa.types.is_large_list(t):
        return f"llist<{type_tag(t.value_type)}>"
    if pa.types.is_fixed_size_list(t):
        return f"flist:{t.list_size}<{type_tag(t.value_type)}>"
    simple = {
        pa.int8(): "i8",
        pa.int16(): "i16",
        pa.int32(): "i32",
        pa.int64(): "i64",
        pa.float32(): "f32",
        pa.float64(): "f64",
        pa.bool_(): "bool",
        pa.string(): "str",
        pa.large_string(): "lstr",
        pa.binary(): "bin",
        pa.large_binary(): "lbin",
        pa.date32(): "date32",
    }
    for k, v in simple.items():
        if t.equals(k):
            return v
    raise TypeError(f"unsupported Arrow type for encode: {t}")


def tag_type(tag: str) -> pa.DataType:
    if tag.startswith("list<"):
        return pa.list_(tag_type(tag[5:-1]))
    if tag.startswith("llist<"):
        return pa.large_list(tag_type(tag[6:-1]))
    if tag.startswith("flist:"):
        head, child = tag.split("<", 1)
        return pa.list_(tag_type(child[:-1]), int(head.split(":")[1]))
    if tag.startswith("ts:"):
        _, unit, tz = tag.split(":", 2)
        return pa.timestamp(unit, tz or None)
    if tag.startswith("dec:"):
        _, p, s = tag.split(":")
        return pa.decimal128(int(p), int(s))
    return {
        "i8": pa.int8(),
        "i16": pa.int16(),
        "i32": pa.int32(),
        "i64": pa.int64(),
        "f32": pa.float32(),
        "f64": pa.float64(),
        "bool": pa.bool_(),
        "str": pa.string(),
        "lstr": pa.large_string(),
        "bin": pa.binary(),
        "lbin": pa.large_binary(),
        "date32": pa.date32(),
    }[tag]


_INT_NUMPY = {"i8": np.int8, "i16": np.int16, "i32": np.int32, "i64": np.int64, "date32": np.int32}

# ---------------------------------------------------------------------------
# integer stream selector
# ---------------------------------------------------------------------------

_CARD_SAMPLE = 1 << 14


def _int_stats(v: np.ndarray) -> dict:
    n = v.size
    if n == 0:
        return {"n": 0, "card": 0, "runs": 0, "lo": 0, "hi": 0}
    lo, hi = int(v.min()), int(v.max())
    run_breaks = int(np.count_nonzero(v[1:] != v[:-1])) + 1
    if n > _CARD_SAMPLE:
        step = n // _CARD_SAMPLE
        card = int(np.unique(v[::step]).size)
        # extrapolate conservatively: sampled distinct is a lower bound
        card = min(n, card * 2) if card > _CARD_SAMPLE // 4 else card
    else:
        card = int(np.unique(v).size)
    return {"n": n, "card": card, "runs": run_breaks, "lo": lo, "hi": hi}


def _range_width(lo: int, hi: int) -> int:
    return bits_needed((hi - lo) & 0xFFFFFFFFFFFFFFFF)


def encode_int_stream(v: np.ndarray) -> tuple[dict, list[bytes]]:
    """Pick plain/FOR/RLE/dict(+RLE) for a signed-int stream by estimated
    size, then encode.  ``v`` may be any int dtype; round-trips exactly."""
    v64 = np.ascontiguousarray(v).astype(np.int64, copy=False)
    st = _int_stats(v64)
    n = st["n"]
    if n == 0:
        meta, bufs = for_encode(v)
        return meta, bufs
    w_for = _range_width(st["lo"], st["hi"])
    est = {"for": n * w_for / 8}
    est["rle"] = st["runs"] * (w_for + bits_needed(n)) / 8
    w_code = bits_needed(max(st["card"] - 1, 0))
    est["dict"] = st["card"] * max(w_for, 8) / 8 + n * w_code / 8
    # dict+rle: runs in code space == runs in value space
    est["dict_rle"] = st["card"] * max(w_for, 8) / 8 + st["runs"] * (w_code + bits_needed(n)) / 8
    if n > 1:
        # delta: exploits LOCAL ordering (sequential ids, near-monotonic
        # timestamps) that FOR's global range cannot see; width estimated
        # exactly as delta_encode's inner FOR pass will see it
        u = v64.view(np.uint64)
        diffs = u[1:] - u[:-1]
        dref = np.uint64(np.int64(int(diffs.view(np.int64).min())))
        w_delta = bits_needed(int((diffs - dref).max()))
        est["delta"] = (n - 1) * w_delta / 8 + 16
    choice = min(est, key=est.get)  # type: ignore[arg-type]
    src = np.ascontiguousarray(v)
    if choice == "for":
        return for_encode(src)
    if choice == "rle":
        return rle_encode(src)
    if choice == "delta":
        return delta_encode(src)
    if choice == "dict":
        return dict_encode_ints(src, use_rle=False)
    return dict_encode_ints(src, use_rle=True)


def decode_int_stream(meta: dict, buffers: list[bytes]) -> np.ndarray:
    codec = meta["codec"]
    if codec == "for":
        return for_decode(meta, buffers)
    if codec == "rle":
        return rle_decode(meta, buffers)
    if codec == "delta":
        return delta_decode(meta, buffers)
    if codec == "dict":
        return dict_decode_ints(meta, buffers)
    raise ValueError(f"unknown int codec {codec}")


# ---------------------------------------------------------------------------
# byte-stream (string/binary data buffer) selector
# ---------------------------------------------------------------------------

_FSST_SAMPLE = 1 << 16


def _decimal_scale(v: np.ndarray, max_scale: int = 4) -> int | None:
    """Smallest k such that every value is exactly a k-decimal number
    (``round(v*10^k)/10^k`` reproduces the input bit-for-bit), else None.
    Checked on a slice first to bail out cheaply on real-valued data."""
    if v.size == 0:
        return None
    probe = v[: min(v.size, 1024)]
    for k in range(0, max_scale + 1):
        f = 10.0**k
        with np.errstate(invalid="ignore", over="ignore"):
            scaled = probe * f
            if not np.all(np.isfinite(scaled)) or np.abs(scaled).max() >= 2**52:
                return None
            c = np.round(scaled)
            if np.array_equal(c / f, probe):
                full = np.round(v * f)
                if np.all(np.isfinite(v)) and np.abs(v * f).max() < 2**52 and np.array_equal(full / f, v):
                    return k
                return None
    return None


def encode_byte_stream(data: np.ndarray, table: FsstTable | None = None) -> tuple[dict, list[bytes]]:
    """Encode a raw byte buffer: FSST if a sampled trial compresses, else
    plain.  (Whole-string dictionary is handled one level up, where
    offsets are known.)  A pre-trained ``table`` (shared per task across
    fragments) skips the per-chunk training cost; the sampled trial still
    guards against a mismatched table."""
    nbytes = int(data.size)
    if nbytes == 0:
        return {"codec": "plain", "nbytes": 0}, []
    if nbytes >= 64:
        sample = data[:_FSST_SAMPLE].tobytes()
        if table is None:
            table = fsst_train(sample)
        if table.symbols:
            trial = fsst_encode(sample, table)
            ratio = len(trial) / len(sample)
            table_cost = len(table.table_buffer()) + 2 * len(table.symbols)
            if ratio * nbytes + table_cost < nbytes * 0.95:
                enc = fsst_encode(data, table)
                if len(enc) + table_cost < nbytes:
                    return (
                        {
                            "codec": "fsst",
                            "nbytes": nbytes,
                            "enc_bytes": len(enc),
                            "table": table.to_meta(),
                        },
                        [enc, table.table_buffer()],
                    )
    return {"codec": "plain", "nbytes": nbytes}, [data.tobytes()]


def decode_byte_stream(meta: dict, buffers: list[bytes]) -> np.ndarray:
    if meta["codec"] == "plain":
        if meta["nbytes"] == 0:
            return np.empty(0, dtype=np.uint8)
        return np.frombuffer(buffers[0], dtype=np.uint8)
    table = FsstTable.from_meta(meta["table"], buffers[1])
    return fsst_decode_np(buffers[0], table)


# ---------------------------------------------------------------------------
# full-array encode/decode
# ---------------------------------------------------------------------------


def _combine(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _null_meta(arr: pa.Array) -> tuple[dict | None, list[bytes]]:
    if arr.null_count == 0:
        return None, []
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    packed = np.packbits(mask, bitorder="little")
    return {"count": int(arr.null_count)}, [packed.tobytes()]


def _null_mask(meta: dict | None, buf: bytes | None, n: int) -> np.ndarray | None:
    if meta is None:
        return None
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little")
    return bits.astype(bool)


def encode_array(
    name: str,
    arr: pa.Array | pa.ChunkedArray,
    fsst_table: FsstTable | None = None,
) -> tuple[dict, list[bytes]]:
    """Encode one Arrow column chunk.  Returns (meta, buffers); meta is
    JSON-safe and records the chosen codec per sub-stream."""
    arr = _combine(arr)
    tag = type_tag(arr.type)
    n = len(arr)
    nmeta, nbufs = _null_meta(arr)
    meta: dict = {"name": name, "type": tag, "n": n, "null": nmeta}
    bufs: list[bytes] = list(nbufs)

    if n == 0:
        meta["enc"] = {"codec": "empty"}
        return meta, bufs

    if tag in ("i8", "i16", "i32", "i64", "date32") or tag.startswith("ts:"):
        if arr.null_count:
            arr = arr.fill_null(0)
        if tag == "date32":
            v = arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
        else:
            v = arr.to_numpy(zero_copy_only=False)
            if tag.startswith("ts:"):
                v = v.view("i8")
        emeta, ebufs = encode_int_stream(v)
    elif tag in ("f32", "f64"):
        if arr.null_count:
            arr = arr.fill_null(0.0)
        v = arr.to_numpy(zero_copy_only=False)
        scale = _decimal_scale(v) if tag == "f64" else None
        iview = v.view(np.int32 if tag == "f32" else np.int64)
        st = _int_stats(iview.astype(np.int64, copy=False))
        if scale is not None:
            # doubles that are exactly k-decimal values (prices, rates):
            # lossless integer re-expression, then the int selector
            ints = np.round(v * 10.0**scale).astype(np.int64)
            imeta, ebufs = encode_int_stream(ints)
            emeta = {"codec": "fscale", "scale": scale, "inner": imeta}
        elif st["card"] <= max(64, st["n"] // 64) or st["runs"] <= st["n"] // 4:
            # floats as raw bit patterns through the int selector — pays for
            # constant/low-cardinality columns
            emeta, ebufs = encode_int_stream(iview.astype(np.int64, copy=False))
            emeta = {"codec": "fbits", "inner": emeta}
        else:
            emeta, ebufs = {"codec": "plain", "nbytes": int(v.nbytes)}, [v.tobytes()]
    elif tag == "bool":
        if arr.null_count:
            arr = arr.fill_null(False)
        v = arr.to_numpy(zero_copy_only=False)
        emeta, ebufs = {"codec": "boolpack"}, [np.packbits(v, bitorder="little").tobytes()]
    elif tag in ("str", "lstr", "bin", "lbin"):
        if arr.null_count:
            # normalize null slots to empty values so encoded bytes are
            # deterministic (offsets behind nulls are non-normative in Arrow)
            arr = arr.fill_null("" if tag in ("str", "lstr") else b"")
        emeta, ebufs = _encode_varlen(arr, tag, fsst_table)
    elif tag.startswith("dec:"):
        if arr.null_count:
            import decimal as _dec

            arr = arr.fill_null(_dec.Decimal(0).scaleb(-arr.type.scale))
        buf = arr.buffers()[1]
        words = np.frombuffer(buf, dtype=np.int64)[arr.offset * 2 : (arr.offset + n) * 2]
        lo, hi = words[0::2], words[1::2]
        v64 = np.ascontiguousarray(lo)
        # a decimal128 whose unscaled value fits int64 has its high word
        # equal to the low word's sign extension (two's complement); then
        # the column is just scaled integers — prices, rates — and the
        # int selector (FOR/delta/dict/RLE) beats 16-byte plain storage
        # ~2-4x.  DECIMAL(10,2) etc. (precision ≤ 18) always qualifies;
        # the value check also catches narrow values in wide types.
        if n and np.array_equal(hi, v64 >> 63):
            imeta, ebufs = encode_int_stream(v64)
            emeta = {"codec": "dscale", "inner": imeta}
        else:
            off = arr.offset * 16
            raw = np.frombuffer(buf, dtype=np.uint8)[off : off + n * 16]
            emeta, ebufs = {"codec": "plain", "nbytes": int(raw.size)}, [raw.tobytes()]
    elif tag.startswith(("list<", "llist<", "flist:")):
        emeta, ebufs = _encode_list(arr, fsst_table)
    else:  # pragma: no cover
        raise TypeError(f"unhandled tag {tag}")

    meta["enc"] = emeta
    bufs.extend(ebufs)
    return meta, bufs


def _encode_list(arr: pa.Array, fsst_table: FsstTable | None = None) -> tuple[dict, list[bytes]]:
    """Nested list encoding: per-slot lengths through the int selector
    (null slots normalized to 0 — list offsets behind nulls are
    non-normative in Arrow) + the flattened child values through the full
    codec selector recursively, so ``array<float>`` embeddings get the
    float paths and ``array<string>`` gets dict/FSST.  Fixed-size lists
    are canonicalized to variable lists first (same buffers logically);
    the type tag restores the exact type on decode."""
    import pyarrow.compute as pc

    if pa.types.is_fixed_size_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_type))
    lengths = pc.list_value_length(arr).cast(pa.int64())
    if lengths.null_count:
        lengths = lengths.fill_null(0)
    lens_np = lengths.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    values = arr.flatten()  # excludes values behind null slots
    lmeta, lbufs = encode_int_stream(lens_np)
    vmeta, vbufs = encode_array("values", values, fsst_table)
    return {"codec": "list", "lens": lmeta, "values": vmeta, "nb": [len(lbufs)]}, lbufs + vbufs


def _decode_list(tag: str, n: int, enc: dict, body: list[bytes], mask: np.ndarray | None) -> pa.Array:
    nlb = enc["nb"][0]
    lengths = decode_int_stream(enc["lens"], body[:nlb]).astype(np.int64, copy=False)
    child = decode_array(enc["values"], body[nlb:])
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    validity = None
    null_count = 0
    if mask is not None:
        validity = pa.array(~mask).buffers()[1]
        null_count = int(mask.sum())
    if tag.startswith("llist<"):
        out_type = pa.large_list(child.type)
        obuf = pa.py_buffer(offsets.tobytes())
    else:
        out_type = pa.list_(child.type)
        obuf = pa.py_buffer(offsets.astype(np.int32).tobytes())
    out = pa.Array.from_buffers(out_type, n, [validity, obuf], null_count=null_count, children=[child])
    target = tag_type(tag)
    return out if out.type == target else out.cast(target)


def _varlen_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lengths int64, data uint8) for a string/binary array, honoring
    offset/slice."""
    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    odtype = np.int64 if large else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odtype)[arr.offset : arr.offset + len(arr) + 1]
    offsets = offsets.astype(np.int64, copy=False)
    data_all = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    data = data_all[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    return lengths, data


def _encode_varlen(arr: pa.Array, tag: str, fsst_table: FsstTable | None = None) -> tuple[dict, list[bytes]]:
    n = len(arr)
    lengths, data = _varlen_parts(arr)
    total = int(data.size)
    # whole-value dictionary probe (Arrow C++ does the heavy lifting)
    sample_n = min(n, 2048)
    card_probe = pa.compute.count_distinct(arr.slice(0, sample_n)).as_py()
    use_dict = card_probe <= sample_n // 4
    if use_dict:
        denc = pa.compute.dictionary_encode(arr)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        dictionary = denc.dictionary
        card = len(dictionary)
        if card <= max(1, n // 3):
            indices = denc.indices.fill_null(0) if denc.indices.null_count else denc.indices
            codes = indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            cmeta, cbufs = encode_int_stream(codes)
            dlen, ddata = _varlen_parts(dictionary.cast(pa.large_string() if tag in ("str", "lstr") else pa.large_binary()))
            lmeta, lbufs = encode_int_stream(dlen)
            bmeta, bbufs = encode_byte_stream(ddata, fsst_table)
            meta = {
                "codec": "vdict",
                "n": n,
                "card": card,
                "codes": cmeta,
                "dict_lens": lmeta,
                "dict_data": bmeta,
                "nb": [len(cbufs), len(lbufs), len(bbufs)],
            }
            return meta, cbufs + lbufs + bbufs
    lmeta, lbufs = encode_int_stream(lengths)
    bmeta, bbufs = encode_byte_stream(data, fsst_table)
    meta = {
        "codec": "varlen",
        "n": n,
        "lens": lmeta,
        "data": bmeta,
        "nb": [len(lbufs), len(bbufs)],
    }
    return meta, lbufs + bbufs


def _build_varlen(lengths: np.ndarray, data: np.ndarray, tag: str, mask: np.ndarray | None) -> pa.Array:
    offsets = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    pa_type = pa.large_string() if tag in ("str", "lstr") else pa.large_binary()
    validity = None
    if mask is not None:
        validity = pa.array(~mask).buffers()[1]
    out = pa.Array.from_buffers(
        pa_type,
        lengths.size,
        [validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
        null_count=int(mask.sum()) if mask is not None else 0,
    )
    return out.cast(tag_type(tag))


def decode_array(meta: dict, buffers: list[bytes]) -> pa.Array:
    """Exact inverse of :func:`encode_array`."""
    tag = meta["type"]
    n = meta["n"]
    nmeta = meta["null"]
    nb = 1 if nmeta is not None else 0
    mask = _null_mask(nmeta, buffers[0] if nb else None, n)
    enc = meta["enc"]
    body = buffers[nb:]
    pa_type = tag_type(tag)

    if enc["codec"] == "empty":
        return pa.array([], type=pa_type)

    if tag in ("i8", "i16", "i32", "i64", "date32") or tag.startswith("ts:"):
        v = decode_int_stream(enc, body)
        if tag.startswith("ts:"):
            np_vals = v.astype(np.int64, copy=False)
            result = pa.array(np_vals).cast(pa_type)
        elif tag == "date32":
            np_vals = v.astype(np.int32, copy=False)
            result = pa.array(np_vals).cast(pa_type)
        else:
            np_vals = v.astype(_INT_NUMPY[tag], copy=False)
            result = pa.array(np_vals, type=pa_type)
        if mask is not None:
            result = _apply_mask(result, mask)
        return result
    if tag in ("f32", "f64"):
        if enc["codec"] == "fscale":
            ints = decode_int_stream(enc["inner"], body)
            v = ints.astype(np.float64) / 10.0 ** enc["scale"]
        elif enc["codec"] == "fbits":
            iv = decode_int_stream(enc["inner"], body)
            v = iv.astype(np.int32, copy=False).view(np.float32) if tag == "f32" else iv.view(np.float64)
        else:
            v = np.frombuffer(body[0], dtype=np.float32 if tag == "f32" else np.float64)
        result = pa.array(v, type=pa_type)
        if mask is not None:
            result = _apply_mask(result, mask)
        return result
    if tag == "bool":
        bits = np.unpackbits(np.frombuffer(body[0], dtype=np.uint8), count=n, bitorder="little")
        result = pa.array(bits.astype(bool))
        if mask is not None:
            result = _apply_mask(result, mask)
        return result
    if tag in ("str", "lstr", "bin", "lbin"):
        if enc["codec"] == "vdict":
            ncb, nlb, nbb = enc["nb"]
            codes = decode_int_stream(enc["codes"], body[:ncb])
            dlens = decode_int_stream(enc["dict_lens"], body[ncb : ncb + nlb])
            ddata = decode_byte_stream(enc["dict_data"], body[ncb + nlb :])
            doffs = np.zeros(dlens.size + 1, dtype=np.int64)
            np.cumsum(dlens, out=doffs[1:])
            lengths = dlens[codes].astype(np.int64)
            starts = doffs[codes]
            total = int(lengths.sum())
            if total:
                out_off = np.zeros(lengths.size, dtype=np.int64)
                np.cumsum(lengths[:-1], out=out_off[1:])
                pos = np.repeat(starts, lengths) + (
                    np.arange(total, dtype=np.int64) - np.repeat(out_off, lengths)
                )
                data = ddata[pos]
            else:
                data = np.empty(0, np.uint8)
            return _build_varlen(lengths, data, tag, mask)
        nlb, nbb = enc["nb"]
        lengths = decode_int_stream(enc["lens"], body[:nlb]).astype(np.int64)
        data = decode_byte_stream(enc["data"], body[nlb:])
        return _build_varlen(lengths, data, tag, mask)
    if tag.startswith("dec:"):
        validity = None
        if mask is not None:
            validity = pa.array(~mask).buffers()[1]
        if enc["codec"] == "dscale":
            v64 = decode_int_stream(enc["inner"], body).astype(np.int64, copy=False)
            words = np.empty((n, 2), dtype=np.int64)
            words[:, 0] = v64
            words[:, 1] = v64 >> 63  # sign extension restores the high word
            raw_bytes = words.tobytes()
        else:
            raw_bytes = np.frombuffer(body[0], dtype=np.uint8).tobytes()
        return pa.Array.from_buffers(
            pa_type, n, [validity, pa.py_buffer(raw_bytes)],
            null_count=int(mask.sum()) if mask is not None else 0,
        )
    if tag.startswith(("list<", "llist<", "flist:")):
        return _decode_list(tag, n, enc, body, mask)
    raise TypeError(f"unhandled tag {tag}")  # pragma: no cover


def _apply_mask(arr: pa.Array, mask: np.ndarray) -> pa.Array:
    """Attach a null mask to a mask-free primitive array."""
    validity = pa.array(~mask).buffers()[1]
    bufs = arr.buffers()
    return pa.Array.from_buffers(arr.type, len(arr), [validity, bufs[1]], null_count=int(mask.sum()))

"""Codec kernel round-trip tests (encode→decode == input, bit-identical).

Pattern seed: the reference's write-then-read-back contract
(``/root/reference/tests/test_parquet_writer.py:38-58``), applied per codec
with edge cases: empty chunks, single values, constant runs, extreme int64,
null-heavy and escape-heavy byte streams.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from universal_parquet_exporter_spark.codecs import (
    FsstTable,
    bitpack,
    bits_needed,
    bitunpack,
    dict_decode_ints,
    dict_encode_ints,
    for_decode,
    for_encode,
    fsst_decode,
    fsst_encode,
    fsst_train,
    rle_decode,
    rle_encode,
)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 31, 37, 63, 64])
def test_bitpack_roundtrip(width):
    n = 10_007
    if width == 0:
        v = np.zeros(n, dtype=np.uint64)
    elif width == 64:
        v = rng.integers(0, 2**63, n, dtype=np.uint64) * 2 + rng.integers(0, 2, n, dtype=np.uint64)
    else:
        hi = (1 << width) - 1
        v = rng.integers(0, hi, n, endpoint=True, dtype=np.uint64)
    buf = bitpack(v, width)
    assert len(buf) == (n * width + 7) // 8
    out = bitunpack(buf, n, width)
    assert np.array_equal(out, v)


def test_bitpack_native_matches_numpy(monkeypatch):
    import universal_parquet_exporter_spark.codecs._native as native

    v = rng.integers(0, 1 << 23, 5000).astype(np.uint64)
    b_native = bitpack(v, 23)
    monkeypatch.setenv("UPES_DISABLE_NATIVE", "1")
    b_numpy = bitpack(v, 23)
    assert b_native == b_numpy
    assert np.array_equal(bitunpack(b_native, v.size, 23), v)


@pytest.mark.parametrize(
    "v",
    [
        np.array([], dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([-(2**63), 2**63 - 1, 0], dtype=np.int64),
        np.full(1000, -42, dtype=np.int64),
        rng.integers(-(10**12), 10**12, 20000).astype(np.int64),
        (rng.integers(0, 1000, 20000) + 1_700_000_000_000_000).astype(np.int64),
        rng.integers(-100, 100, 5000).astype(np.int32),
    ],
    ids=["empty", "zero", "extremes", "const", "wide", "ts_like", "i32"],
)
def test_for_roundtrip(v):
    meta, bufs = for_encode(v)
    out = for_decode(meta, bufs)
    assert out.dtype == v.dtype
    assert np.array_equal(out, v)


def test_rle_roundtrip():
    v = np.repeat(rng.integers(-5, 5, 997), rng.integers(1, 60, 997)).astype(np.int64)
    meta, bufs = rle_encode(v)
    assert meta["runs"] <= 997
    assert np.array_equal(rle_decode(meta, bufs), v)


def test_rle_compresses_sorted():
    v = np.sort(rng.integers(0, 50, 100_000)).astype(np.int64)
    meta, bufs = rle_encode(v)
    assert sum(len(b) for b in bufs) < v.nbytes / 100


@pytest.mark.parametrize("use_rle", [False, True])
def test_dict_roundtrip(use_rle):
    v = rng.choice(np.array([7, -3, 10**10, 0]), 30_000).astype(np.int64)
    if use_rle:
        v = np.sort(v)
    meta, bufs = dict_encode_ints(v, use_rle=use_rle)
    assert meta["card"] == 4
    assert np.array_equal(dict_decode_ints(meta, bufs), v)


# ---------------------------------------------------------------------------
# FSST
# ---------------------------------------------------------------------------

TEXT = (b"the quick brown fox jumps over the lazy dog " * 500) + bytes(range(256)) * 4


def test_fsst_roundtrip_text():
    tbl = fsst_train(TEXT)
    assert 0 < len(tbl.symbols) <= 255
    enc = fsst_encode(TEXT, tbl)
    assert len(enc) < len(TEXT) / 2  # repetitive text must compress well
    assert fsst_decode(enc, tbl) == TEXT


def test_fsst_table_serialization():
    tbl = fsst_train(TEXT)
    back = FsstTable.from_meta(tbl.to_meta(), tbl.table_buffer())
    assert back.symbols == tbl.symbols
    enc = fsst_encode(TEXT, tbl)
    assert fsst_decode(enc, back) == TEXT


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"\xff" * 1000,  # escape byte floods
        bytes(rng.integers(0, 256, 50_000).astype(np.uint8)),  # incompressible
        b"aaaaaaaa" * 1000,  # one dominant symbol
        b"ab",  # shorter than any useful symbol
    ],
    ids=["empty", "escapes", "random", "constant", "tiny"],
)
def test_fsst_edge_cases(data):
    tbl = fsst_train(data)
    assert fsst_decode(fsst_encode(data, tbl), tbl) == data


def test_fsst_native_matches_numpy(monkeypatch):
    tbl = fsst_train(TEXT)
    enc_native = fsst_encode(TEXT, tbl)
    dec_native = fsst_decode(enc_native, tbl)
    monkeypatch.setenv("UPES_DISABLE_NATIVE", "1")
    enc_numpy = fsst_encode(TEXT, tbl)
    dec_numpy = fsst_decode(enc_native, tbl)
    assert enc_native == enc_numpy
    assert dec_native == dec_numpy == TEXT


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_fsst_property_roundtrip(data):
    tbl = fsst_train(data)
    assert fsst_decode(fsst_encode(data, tbl), tbl) == data


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=500)
)
def test_int_codecs_property_roundtrip(xs):
    v = np.array(xs, dtype=np.int64)
    for enc, dec in [(for_encode, for_decode), (rle_encode, rle_decode), (dict_encode_ints, dict_decode_ints)]:
        meta, bufs = enc(v)
        assert np.array_equal(dec(meta, bufs), v)


def test_bits_needed():
    assert bits_needed(0) == 0
    assert bits_needed(1) == 1
    assert bits_needed(255) == 8
    assert bits_needed(256) == 9
    with pytest.raises(ValueError):
        bits_needed(-1)


def test_delta_roundtrip_and_wins_on_sequences():
    from universal_parquet_exporter_spark.codecs.forcodec import delta_decode, delta_encode
    from universal_parquet_exporter_spark.encode.chunk import decode_int_stream, encode_int_stream

    cases = [
        np.arange(10_000, dtype=np.int64) + 1_000_000,          # sequential ids
        np.int64(1_700_000_000_000_000) + np.cumsum(np.random.default_rng(42).integers(0, 1000, 5000)),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, -1, 0, 1], dtype=np.int64),
        np.array([7], dtype=np.int64),
        np.array([], dtype=np.int64),
    ]
    for v in cases:
        meta, bufs = delta_encode(v)
        assert np.array_equal(delta_decode(meta, bufs), v)
    # the selector must pick delta for a long sequential run and beat FOR hard
    seq = np.arange(50_000, dtype=np.int64) + 10**12
    meta, bufs = encode_int_stream(seq)
    assert meta["codec"] == "delta", meta["codec"]
    assert sum(len(b) for b in bufs) < seq.nbytes // 50
    assert np.array_equal(decode_int_stream(meta, bufs), seq)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=300)
)
def test_delta_property_roundtrip(xs):
    from universal_parquet_exporter_spark.codecs.forcodec import delta_decode, delta_encode

    v = np.array(xs, dtype=np.int64)
    meta, bufs = delta_encode(v)
    assert np.array_equal(delta_decode(meta, bufs), v)

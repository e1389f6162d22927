"""Arrow column-chunk + container round-trips (bit-identical, incl. nulls).

Mirrors the reference round-trip contract
(``/root/reference/tests/test_parquet_writer.py:38-58``) at the Arrow
level; also checks the cost-model selector picks sane codecs and that the
container payload is byte-deterministic (resume idempotency)."""

import decimal

import numpy as np
import pyarrow as pa
import pytest

from universal_parquet_exporter_spark.encode import (
    deserialize_chunk,
    serialize_chunk,
)
from universal_parquet_exporter_spark.encode.chunk import decode_array, encode_array

rng = np.random.default_rng(42)


def roundtrip(arr: pa.Array) -> tuple[pa.Array, dict]:
    meta, bufs = encode_array("c", arr)
    out = decode_array(meta, bufs)
    return out, meta


def assert_identical(out: pa.Array, src: pa.Array):
    # decode may widen str→large_string; values must be bit-identical
    if not out.type.equals(src.type):
        out = out.cast(src.type)
    assert out.equals(src)


CASES = {
    "ts_clustered": pa.array(
        (rng.integers(0, 1000, 20000) + 1_700_000_000_000_000), type=pa.int64()
    ).cast(pa.timestamp("us")),
    "ts_tz": pa.array([1, 2, 3], type=pa.int64()).cast(pa.timestamp("us", tz="UTC")),
    "ts_null": pa.array([1, None, 3], type=pa.int64()).cast(pa.timestamp("us")),
    "int_null": pa.array([1, 2, None, 4, None, 2, 2, 2] * 500, type=pa.int32()),
    "int_extreme": pa.array([-(2**63), 2**63 - 1, None, 0], type=pa.int64()),
    "sorted_rle": pa.array(np.sort(rng.integers(0, 50, 50000)).astype(np.int64)),
    "lang_lowcard": pa.array(rng.choice(["en", "de", "fr", "es"], 50000, p=[0.6, 0.2, 0.1, 0.1]).tolist()),
    "text": pa.array(
        [" ".join(rng.choice(["web", "page", "content", "the", "model"], 40).tolist()) for _ in range(2000)]
    ),
    "binary_null": pa.array(
        [None if i % 50 == 0 else bytes(rng.integers(0, 256, 30).astype(np.uint8)) for i in range(1000)],
        type=pa.binary(),
    ),
    "float": pa.array(rng.random(20000)),
    "float_const": pa.array(np.full(5000, 3.25)),
    "f32": pa.array(rng.random(5000).astype(np.float32)),
    "bool_null": pa.array([True, None, False] * 300),
    "empty_str": pa.array([], type=pa.string()),
    "empty_int": pa.array([], type=pa.int64()),
    "all_null_str": pa.array([None, None], type=pa.string()),
    "empty_strings": pa.array(["", "", "a", ""]),
    "single": pa.array(["only"]),
    "decimal": pa.array(
        [decimal.Decimal("1.25"), None, decimal.Decimal("99.99")], type=pa.decimal128(10, 2)
    ),
    "date": pa.array([0, 1, None, 20000], type=pa.int32()).cast(pa.date32()),
}


@pytest.mark.parametrize("name", list(CASES))
def test_array_roundtrip(name):
    src = CASES[name]
    out, _ = roundtrip(src)
    assert_identical(out, src)


def test_decimal_scaled_int_routing_and_ratio():
    """DECIMAL(10,2) money columns (the reference's ubiquitous type,
    /root/reference/tests/test_query_executor_realDB.py:98) must route
    through the int selector as scaled integers — 16-byte plain storage
    is ≥2x too big for values FOR/bit-packing compresses."""
    cents = rng.integers(0, 1_000_000, 50000)
    src = pa.array(
        [decimal.Decimal(int(c)).scaleb(-2) for c in cents], type=pa.decimal128(10, 2)
    )
    meta, bufs = encode_array("c", src)
    assert meta["enc"]["codec"] == "dscale"
    assert sum(len(b) for b in bufs) <= src.nbytes * 0.25  # ≤4B/val vs 16B
    out = decode_array(meta, bufs)
    assert_identical(out, src)


def test_decimal_wide_values_fall_back_plain():
    """Unscaled values beyond int64 (precision 38) must take the plain
    16-byte path and still round-trip bit-identically."""
    src = pa.array(
        [decimal.Decimal(2**100), decimal.Decimal(-(2**90)), None, decimal.Decimal(7)],
        type=pa.decimal128(38, 0),
    )
    meta, bufs = encode_array("c", src)
    assert meta["enc"]["codec"] == "plain"
    out = decode_array(meta, bufs)
    assert_identical(out, src)


def test_decimal_negative_null_and_sliced():
    """Negative scaled values (sign-extension path), nulls, and a sliced
    array (nonzero Arrow offset) through the dscale route."""
    vals = [decimal.Decimal("-12345.67"), None, decimal.Decimal("0.01"),
            decimal.Decimal("-0.99"), decimal.Decimal("99999.99")] * 200
    src = pa.array(vals, type=pa.decimal128(12, 2))
    meta, bufs = encode_array("c", src)
    assert meta["enc"]["codec"] == "dscale"
    assert_identical(decode_array(meta, bufs), src)

    sliced = src.slice(3, 750)
    meta, bufs = encode_array("c", sliced)
    assert_identical(decode_array(meta, bufs), sliced)


def test_decimal256_rejected_loudly():
    """decimal256 (precision > 38) would be silently corrupted by the
    16-byte word slicing — encode must refuse it, not garble it."""
    src = pa.array([decimal.Decimal(1)], type=pa.decimal256(50, 2))
    with pytest.raises(TypeError, match="decimal128 only"):
        encode_array("c", src)


def test_decimal_property_roundtrip():
    """Hypothesis sweep over decimal128 arrays spanning the dscale/plain
    boundary (values straddling ±2^63 unscaled), nulls included."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    small = st.integers(min_value=-(2**62), max_value=2**62)
    big = st.integers(min_value=2**63, max_value=2**90)
    elem = st.one_of(st.none(), small, big, big.map(lambda v: -v))

    @settings(max_examples=50, deadline=None)
    @given(st.lists(elem, min_size=0, max_size=200))
    def run(vals):
        src = pa.array(
            [None if v is None else decimal.Decimal(v).scaleb(-2) for v in vals],
            type=pa.decimal128(38, 2),
        )
        meta, bufs = encode_array("c", src)
        assert_identical(decode_array(meta, bufs), src)

    run()


def test_sliced_array_roundtrip():
    src = pa.array(["abc", "de", None, "fgh", "ij"] * 100)
    sliced = src.slice(3, 250)
    out, _ = roundtrip(sliced)
    assert_identical(out, sliced.combine_chunks() if hasattr(sliced, "combine_chunks") else sliced)


def test_selector_choices():
    _, m = roundtrip(CASES["ts_clustered"])
    assert m["enc"]["codec"] in ("for", "rle", "dict")
    _, m = roundtrip(CASES["sorted_rle"])
    assert m["enc"]["codec"] == "rle"
    _, m = roundtrip(CASES["lang_lowcard"])
    assert m["enc"]["codec"] == "vdict"


def test_selector_beats_plain():
    """Chosen codecs must compress the codec-friendly fixtures hard."""
    for name, min_ratio in [("ts_clustered", 0.25), ("sorted_rle", 0.01), ("lang_lowcard", 0.1)]:
        src = CASES[name]
        meta, bufs = encode_array("c", src)
        assert sum(len(b) for b in bufs) <= src.nbytes * min_ratio, name


def test_container_roundtrip_and_determinism():
    tbl = pa.table(
        {
            "url": CASES["text"],
            "ts": CASES["ts_clustered"][:2000],
            "lang": CASES["lang_lowcard"][:2000],
            "val": CASES["float"][:2000],
        }
    )
    p1, report = serialize_chunk(tbl)
    p2, _ = serialize_chunk(tbl)
    assert p1 == p2  # byte-deterministic for resume idempotency
    back = deserialize_chunk(p1)
    for name in tbl.schema.names:
        src = tbl.column(name).combine_chunks()
        out = back.column(name).combine_chunks()
        if not out.type.equals(src.type):
            out = out.cast(src.type)
        assert out.equals(src), name
    assert report["bytes_out"] < report["bytes_in"]
    assert {c["name"] for c in report["columns"]} == set(tbl.schema.names)


LIST_CASES = {
    "list_f32": pa.array([[1.5, 2.5], [3.5, 4.5], [0.0]], type=pa.list_(pa.float32())),
    "list_nulls": pa.array([[1.5], None, [], [2.5, 3.5]], type=pa.list_(pa.float32())),
    "list_elem_nulls": pa.array([[1.5, None], [None], None], type=pa.list_(pa.float32())),
    "large_list": pa.array([[1, 2], [3]], type=pa.large_list(pa.int64())),
    "fixed_list": pa.array([[1.0, 2.0], [3.0, 4.0], None], type=pa.list_(pa.float64(), 2)),
    "list_str": pa.array([["a", "bb"], None, ["ccc", ""]], type=pa.list_(pa.string())),
    "list_ts": pa.array([[1, 2], [3]], type=pa.list_(pa.timestamp("us"))),
    "list_empty": pa.array([], type=pa.list_(pa.float32())),
}


@pytest.mark.parametrize("name", sorted(LIST_CASES))
def test_list_roundtrip(name):
    """Nested list columns (array<float> embeddings and friends) must
    round-trip bit-identically, preserving the exact Arrow type."""
    src = LIST_CASES[name]
    out, meta = roundtrip(src)
    assert out.type.equals(src.type), (out.type, src.type)
    assert out.equals(src)


def test_list_sliced_roundtrip():
    src = pa.array([[9.0], [1.5, 2.5], None, [3.5]], type=pa.list_(pa.float32())).slice(1, 3)
    out, _ = roundtrip(src)
    assert out.equals(pa.array([[1.5, 2.5], None, [3.5]], type=pa.list_(pa.float32())))


def test_embeddings_like_compresses_lengths():
    """Constant-length float vectors: the length stream must collapse
    (RLE/dict), leaving ~only the raw float payload."""
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((200, 64)).astype(np.float32)
    src = pa.array(list(vecs), type=pa.list_(pa.float32()))
    meta, bufs = encode_array("v", src)
    total = sum(len(b) for b in bufs)
    assert total <= vecs.nbytes * 1.02  # lengths amortize to ~nothing


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(st.none(), st.floats(width=32, allow_nan=False)),
                max_size=8,
            ),
        ),
        max_size=48,
    )
)
def test_list_float_property_roundtrip(rows):
    """Any list<float> shape — ragged lengths, null slots, null elements,
    empties — must round-trip to an equal array of the exact type."""
    src = pa.array(rows, type=pa.list_(pa.float32()))
    out, _ = roundtrip(src)
    assert out.type.equals(src.type)
    assert out.equals(src)


def test_container_column_pruning():
    """deserialize_chunk(columns=...) must decode ONLY the requested
    columns (excluded buffers skipped by length) and agree with the full
    decode bit-for-bit."""
    tbl = pa.table(
        {
            "url": CASES["text"],
            "lang": CASES["lang_lowcard"][:2000],
            "val": CASES["float"][:2000],
        }
    )
    p, _ = serialize_chunk(tbl)
    full = deserialize_chunk(p)
    pruned = deserialize_chunk(p, columns=["val", "url"])
    assert pruned.schema.names == ["val", "url"]
    assert pruned.column("url").equals(full.column("url"))
    assert pruned.column("val").equals(full.column("val"))
    with pytest.raises(KeyError):
        deserialize_chunk(p, columns=["nope"])

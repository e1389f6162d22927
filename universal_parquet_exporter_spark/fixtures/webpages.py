"""Deterministic Common-Crawl-style web-page fixture (FIXTURES.md §1).

Schema is the BASELINE.json ``input_hint`` contract:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Every value derives from the row id through a splitmix64-style mixer, so
the table is identical for any partitioning/parallelism — required for
resume-idempotency and N-vs-4N scaling runs on "the same input".
Codec-discriminating properties per FIXTURES.md: Zipf-skewed hosts (salting
target), clustered crawl-session timestamps (FOR/RLE target), Zipfian
natural-ish text (FSST target), per-host language (dict/RLE target), and
baked-in edge slices (empty text, null html, constant-timestamp run,
single-language host).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
N_HOSTS = 1000
N_LANGS = 12
VOCAB_SIZE = 5000
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in µs

WEBPAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("html", pa.binary(), nullable=True),
        pa.field("text", pa.string(), nullable=False),
        pa.field("lang", pa.string(), nullable=False),
    ]
)

_LANGS = ["en", "de", "fr", "es", "pt", "it", "nl", "pl", "ru", "ja", "zh", "ko"]


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style deterministic uint64 stream keyed by (id, salt)."""
    x = ids.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15 + SEED) & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    return (_mix(ids, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# --- host / lang assignment (module-level, tiny, deterministic) -----------

_host_rng = np.random.default_rng(SEED)
_HOST_WEIGHTS = 1.0 / np.arange(1, N_HOSTS + 1) ** 1.2
_HOST_CDF = np.cumsum(_HOST_WEIGHTS / _HOST_WEIGHTS.sum())
_HOST_NAMES = np.array(
    [f"host{i:04d}.example{i % 7}.com" for i in range(N_HOSTS)], dtype=object
)
# language per host: host 0 is the all-'en' single-language slice; others
# follow a skewed categorical (en 60%, tail over the rest)
_lang_probs = np.array([0.60, 0.10, 0.07, 0.06, 0.04, 0.03, 0.03, 0.02, 0.02, 0.01, 0.01, 0.01])
_HOST_LANG = _host_rng.choice(np.arange(N_LANGS), size=N_HOSTS, p=_lang_probs)
_HOST_LANG[0] = 0

# --- vocabulary (Zipfian word frequencies) ---------------------------------

_SYLL = np.array(
    ["ta", "re", "mi", "so", "lun", "ver", "net", "web", "con", "dat",
     "pro", "ser", "tion", "ing", "ly", "ment", "al", "or", "an", "ex"],
    dtype=object,
)
_vocab_rng = np.random.default_rng(SEED + 1)
_VOCAB = np.array(
    [
        "".join(_vocab_rng.choice(_SYLL, size=_vocab_rng.integers(1, 4) + 1))
        for _ in range(VOCAB_SIZE)
    ],
    dtype=object,
)
_VOCAB_BYTES = [w.encode() for w in _VOCAB]
_VOCAB_FLAT = np.frombuffer(b"".join(b + b" " for b in _VOCAB_BYTES), dtype=np.uint8)
_VOCAB_LENS = np.array([len(b) + 1 for b in _VOCAB_BYTES], dtype=np.int64)  # incl. space
_VOCAB_OFFS = np.zeros(VOCAB_SIZE, dtype=np.int64)
np.cumsum(_VOCAB_LENS[:-1], out=_VOCAB_OFFS[1:])


def _zipf_word_ids(u: np.ndarray, s: float = 1.1) -> np.ndarray:
    """Map uniforms to Zipf-ish word ranks in [0, VOCAB_SIZE)."""
    r = (1.0 - u) ** (-1.0 / (s - 1.0))  # Pareto
    return np.minimum(r - 1.0, VOCAB_SIZE - 1).astype(np.int64)


def _gather_concat(starts: np.ndarray, lengths: np.ndarray, source: np.ndarray) -> np.ndarray:
    """Concatenate source[starts[i]:starts[i]+lengths[i]] — vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    out_off = np.zeros(lengths.size, dtype=np.int64)
    np.cumsum(lengths[:-1], out=out_off[1:])
    pos = np.repeat(starts, lengths) + (np.arange(total, dtype=np.int64) - np.repeat(out_off, lengths))
    return source[pos]


def _make_strings(lengths: np.ndarray, data: np.ndarray, large: bool = False) -> pa.Array:
    offsets = np.zeros(lengths.size + 1, dtype=np.int64 if large else np.int32)
    np.cumsum(lengths, out=offsets[1:])
    t = pa.large_string() if large else pa.string()
    return pa.Array.from_buffers(
        t, lengths.size, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())]
    )


def generate_batch(ids: np.ndarray) -> pa.RecordBatch:
    """Generate the webpages batch for the given row ids (vectorized)."""
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    n = ids.size

    # hosts: Zipf(1.2) over 1000 hosts → url skew target
    host = np.searchsorted(_HOST_CDF, _uniform(ids, 1)).clip(0, N_HOSTS - 1)
    lang_idx = _HOST_LANG[host]
    lang = pa.array(np.array(_LANGS, dtype=object)[lang_idx], type=pa.string())

    # urls: https://{host}/{depth 1-4 hex chain}; id 7 gets a max-length url
    depth = (_mix(ids, 2) % np.uint64(4)).astype(np.int64) + 1
    depth[ids == 7] = 12
    seg1 = _mix(ids, 3)
    urls = []
    host_names = _HOST_NAMES[host]
    hexseg = np.char.mod("%016x", seg1.astype(object))
    for i in range(n):
        d = depth[i]
        h = hexseg[i]
        path = "/".join(h[: 4 + 2 * k] for k in range(d))
        # trailing id segment guarantees global url uniqueness (unique key
        # per FIXTURES.md §1) regardless of prefix collisions on hot hosts
        urls.append(f"https://{host_names[i]}/{path}/{ids[i]:x}")
    url = pa.array(urls, type=pa.string())

    # timestamps: crawl sessions (runs of near-equal values); ids in
    # [1000, 1256) form an exactly-constant run
    session = (ids // 256).astype(np.int64)
    jitter = (_mix(ids, 4) % np.uint64(1000)).astype(np.int64)
    ts_us = BASE_TS_US + session * 10_000_000 + jitter
    const_run = (ids >= 1000) & (ids < 1256)
    ts_us[const_run] = BASE_TS_US + 39 * 10_000_000
    warc_ts = pa.array(ts_us).cast(pa.timestamp("us"))

    # text: Zipfian words, lognormal length (median ≈ 400 chars ≈ 66 words)
    u1 = _uniform(ids, 5)
    u2 = _uniform(ids, 6)
    normal = np.sqrt(-2.0 * np.log(u1 + 1e-300)) * np.cos(2 * np.pi * u2)
    n_words = np.exp(np.log(66.0) + 0.7 * normal).astype(np.int64).clip(1, 2000)
    n_words[ids % 997 == 0] = 0  # empty-text slice
    total_words = int(n_words.sum())
    row_of_word = np.repeat(np.arange(n, dtype=np.int64), n_words)
    word_start = np.zeros(n, dtype=np.int64)
    np.cumsum(n_words[:-1], out=word_start[1:])
    k_of_word = np.arange(total_words, dtype=np.int64) - np.repeat(word_start, n_words)
    wseed = ids[row_of_word] * np.int64(131071) + k_of_word
    wids = _zipf_word_ids(_uniform(wseed, 7))
    text_data = _gather_concat(_VOCAB_OFFS[wids], _VOCAB_LENS[wids], _VOCAB_FLAT)
    # per-row byte length = sum of word lens (incl. trailing space)
    wlens = _VOCAB_LENS[wids]
    row_len = np.zeros(n, dtype=np.int64)
    np.add.at(row_len, row_of_word, wlens)
    text = _make_strings(row_len.astype(np.int64), text_data)

    # html: deterministic markup skeleton wrapping text; ~2% null
    import pyarrow.compute as pc

    title = pc.utf8_slice_codeunits(text, 0, 32)
    html_str = pc.binary_join_element_wise(
        pa.array(["<html><head><title>"] * n),
        title,
        pa.array(["</title></head><body><p>"] * n),
        text,
        pa.array(["</p></body></html>"] * n),
        "",
    )
    html_bin = html_str.cast(pa.binary())
    null_mask = (ids % 50) == 3
    if null_mask.any():
        html_bin = pa.compute.if_else(pa.array(~null_mask), html_bin, pa.scalar(None, pa.binary()))

    return pa.RecordBatch.from_arrays(
        [url, warc_ts, html_bin, text.cast(pa.string()) if text.type != pa.string() else text, lang],
        schema=WEBPAGES_SCHEMA,
    )


def generate_webpages_local(n_rows: int) -> pa.Table:
    """Driver-side generation (tests, small scales)."""
    batches = []
    for start in range(0, n_rows, 65536):
        ids = np.arange(start, min(start + 65536, n_rows), dtype=np.int64)
        batches.append(generate_batch(ids))
    return pa.Table.from_batches(batches, schema=WEBPAGES_SCHEMA)


def generate_webpages(spark, n_rows: int, partitions: int = 32):
    """Distributed generation via mapInArrow over spark.range — scales to
    arbitrary row counts without driver materialization."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    spark_schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), False),
            StructField("lang", StringType(), False),
        ]
    )

    def gen(iterator):
        for batch in iterator:
            ids = batch.column(0).to_numpy()
            yield generate_batch(ids)

    return spark.range(0, n_rows, numPartitions=partitions).mapInArrow(gen, spark_schema)

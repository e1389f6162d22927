"""Lightweight columnar compression kernels (pure NumPy, vectorized).

Each codec exposes ``encode(...) -> (meta: dict, buffers: list[bytes])``
and ``decode(meta, buffers) -> numpy data`` and is exact (lossless,
bit-identical round-trip).  They operate on NumPy views of Arrow column
buffers; nothing here touches Spark.

The reference's only encoder is pyarrow's default Parquet writer
(``/root/reference/src/export/parquet_writer.py:17`` — Snappy + Parquet
dictionary encoding); that is the size *control* these codecs must beat.
"""

from .bitpack import bitpack, bitunpack, bits_needed
from .forcodec import for_encode, for_decode
from .rle import rle_encode, rle_decode
from .dictionary import dict_encode_ints, dict_decode_ints
from .fsst import FsstTable, fsst_train, fsst_encode, fsst_decode

__all__ = [
    "bitpack",
    "bitunpack",
    "bits_needed",
    "for_encode",
    "for_decode",
    "rle_encode",
    "rle_decode",
    "dict_encode_ints",
    "dict_decode_ints",
    "FsstTable",
    "fsst_train",
    "fsst_encode",
    "fsst_decode",
]

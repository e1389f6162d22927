"""Dictionary encoding: distinct-value table + bit-packed integer codes.

``np.unique(return_inverse=True)`` over the chunk (SURVEY.md §2C).  The
code stream optionally goes through RLE when the column is clustered
(chosen by the selector, :mod:`..encode.selector`).  Winner for
low-cardinality columns (``lang``)."""

from __future__ import annotations

import numpy as np

from .bitpack import bitpack, bitunpack, bits_needed
from .forcodec import for_decode, for_encode
from .rle import rle_decode, rle_encode


def dict_encode_ints(values: np.ndarray, use_rle: bool = False) -> tuple[dict, list[bytes]]:
    """Dictionary-encode an integer array (codes bit-packed or RLE'd)."""
    v = np.ascontiguousarray(values)
    uniques, codes = np.unique(v, return_inverse=True)
    codes = codes.astype(np.uint64, copy=False)
    umeta, ubufs = for_encode(uniques)
    if use_rle:
        cmeta, cbufs = rle_encode(codes)
    else:
        width = bits_needed(int(uniques.size - 1)) if uniques.size else 0
        cmeta = {"codec": "bitpack", "n": int(v.size), "width": width}
        cbufs = [bitpack(codes, width)]
    meta = {
        "codec": "dict",
        "n": int(v.size),
        "card": int(uniques.size),
        "codes": cmeta,
        "values": umeta,
        "ncbufs": len(cbufs),
    }
    return meta, cbufs + ubufs


def dict_decode_ints(meta: dict, buffers: list[bytes]) -> np.ndarray:
    ncb = meta["ncbufs"]
    cmeta = meta["codes"]
    if cmeta["codec"] == "rle":
        codes = rle_decode(cmeta, buffers[:ncb]).astype(np.int64)
    else:
        codes = bitunpack(buffers[0], cmeta["n"], cmeta["width"]).astype(np.int64)
    uniques = for_decode(meta["values"], buffers[ncb:])
    if meta["card"] == 0:
        return uniques
    return uniques[codes]

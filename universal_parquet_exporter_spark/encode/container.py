"""Binary container for an encoded chunk: JSON meta + packed buffers.

Layout: ``[4B magic][4B meta_len][meta JSON][buffers...]`` with per-buffer
(offset, length) recorded in the meta.  Deterministic bytes for identical
input — required for checkpointed-resume idempotency (SURVEY.md §2C).
"""

from __future__ import annotations

import json

import pyarrow as pa

from .chunk import decode_array, encode_array, tag_type

_MAGIC = b"UPE1"


def read_chunk_schema(fh) -> pa.Schema:
    """Arrow schema of the chunk a (seekable, positioned) handle points
    at, from the container meta ALONE — the header and JSON are read,
    no payload buffer is touched or decoded.  This is what schema
    probing should cost: O(meta), not O(chunk)."""
    head = fh.read(8)
    if head[:4] != _MAGIC:
        raise ValueError("bad container magic")
    meta_len = int.from_bytes(head[4:8], "little")
    meta_doc = json.loads(fh.read(meta_len))
    return pa.schema(
        [pa.field(c["name"], tag_type(c["type"])) for c in meta_doc["cols"]]
    )


def serialize_chunk(
    batch: pa.RecordBatch | pa.Table, fsst_tables: dict | None = None
) -> tuple[bytes, dict]:
    """Encode every column of a record batch; returns (payload, report).

    ``report`` carries per-column codec choices and byte counts for the
    lineage/metrics table (engine analog of the reference's export summary,
    ``/root/reference/examples/advanced_integration_example.py:283-297``).
    ``fsst_tables`` optionally maps column name → pre-trained FsstTable
    shared across many chunks of the same task (amortizes training)."""
    cols = []
    all_bufs: list[bytes] = []
    report_cols = []
    for name in batch.schema.names:
        col = batch.column(batch.schema.get_field_index(name))
        meta, bufs = encode_array(name, col, (fsst_tables or {}).get(name))
        lens = [len(b) for b in bufs]
        meta["buf_lens"] = lens
        cols.append(meta)
        all_bufs.extend(bufs)
        in_bytes = col.nbytes if hasattr(col, "nbytes") else 0
        report_cols.append(
            {
                "name": name,
                "codec": _codec_label(meta),
                "bytes_in": int(in_bytes),
                "bytes_out": int(sum(lens)),
            }
        )
    meta_doc = {"n": batch.num_rows, "cols": cols}
    meta_json = json.dumps(meta_doc, separators=(",", ":")).encode()
    payload = b"".join(
        [_MAGIC, len(meta_json).to_bytes(4, "little"), meta_json, *all_bufs]
    )
    report = {
        "rows": batch.num_rows,
        "bytes_in": sum(c["bytes_in"] for c in report_cols),
        "bytes_out": len(payload),
        "columns": report_cols,
    }
    return payload, report


def _codec_label(meta: dict) -> str:
    enc = meta["enc"]
    codec = enc.get("codec")
    if codec == "varlen":
        return f"varlen(lens={enc['lens']['codec']},data={enc['data']['codec']})"
    if codec == "vdict":
        return f"vdict(codes={enc['codes']['codec']},data={enc['dict_data']['codec']})"
    if codec == "fbits":
        return f"fbits({enc['inner']['codec']})"
    return str(codec)


def deserialize_chunk(
    payload: bytes, columns: list[str] | None = None, missing_ok: bool = False
) -> pa.Table:
    """Exact inverse of :func:`serialize_chunk`.  With ``columns``, only
    those columns are DECODED — excluded columns' buffers are skipped by
    their recorded lengths without touching the codec layer (reading
    only ``text`` never pays for decompressing ``html``), in requested
    order.  An empty list is normalized to None (full decode) so this
    layer agrees with the pipeline's ``_arrow_to_ddl``, which treats
    ``[]`` as falsy and emits the full schema.  ``missing_ok`` returns
    the present subset (requested order) instead of raising — the
    schema-evolution path, where chunks written before a column existed
    simply don't have it and the caller null-pads from the union
    schema."""
    if not columns:
        columns = None
    if payload[:4] != _MAGIC:
        raise ValueError("bad container magic")
    meta_len = int.from_bytes(payload[4:8], "little")
    meta_doc = json.loads(payload[8 : 8 + meta_len])
    pos = 8 + meta_len
    arrays = {}
    for col_meta in meta_doc["cols"]:
        if columns is not None and col_meta["name"] not in columns:
            pos += sum(col_meta["buf_lens"])
            continue
        bufs = []
        for ln in col_meta["buf_lens"]:
            bufs.append(payload[pos : pos + ln])
            pos += ln
        arrays[col_meta["name"]] = decode_array(col_meta, bufs)
    if columns is not None:
        missing = [c for c in columns if c not in arrays]
        if missing and not missing_ok:
            raise KeyError(f"columns not in chunk: {missing}")
        return pa.table({c: arrays[c] for c in columns if c in arrays})
    return pa.table(arrays)

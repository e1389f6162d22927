"""The distributed encode job: plan → shuffle → mapInArrow encode →
Parquet sink + lineage → (optionally) decode read-back.

Engine analog of the reference's batch-export orchestration
(``/root/reference/examples/advanced_integration_example.py:80-114`` — its
per-query loop with error isolation and a summary record) re-designed for
Spark: the unit of work is a byte-balanced *encode unit* (a url-range,
possibly hash-salted — :mod:`..plans.partitioning`), executed as one
shuffle + one Arrow-vectorized map stage, with per-unit lineage rows
enabling checkpointed resume (north rule).

Scale notes (100 TB / 1000-executor thinking):
- exactly ONE wide dependency: ``repartition(n_units, unit)``; encode,
  sink writes and lineage derivation are all narrow;
- the encoded payload column is written with parquet compression=none —
  our codecs own the bytes, so sizes are honest and decode never pays a
  double-decompress;
- lineage is derived from the committed sink by column-pruned re-read
  (payload column never read), so a crashed run can only under-report,
  never over-report → resume is safe;
- decode prunes to requested columns before deserializing payloads.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..plans.partitioning import EncodePlan, assign_units_arrow, plan_encode
from .container import deserialize_chunk, serialize_chunk

ENC_SCHEMA = "unit long, n_rows long, bytes_in long, bytes_out long, wall_ms double, codecs string, payload binary"
FRAG_SCHEMA = (
    "unit long, first_key string, n_rows long, bytes_in long, bytes_out long, "
    "wall_ms double, codecs string, payload binary"
)

_FRAG_MAGIC = b"UPEU"


def pack_fragments(frags: list[bytes]) -> bytes:
    """Final per-unit container: fragment payloads concatenated with a
    length index (reduce side never re-encodes)."""
    head = [_FRAG_MAGIC, len(frags).to_bytes(4, "little")]
    head.extend(len(f).to_bytes(8, "little") for f in frags)
    return b"".join(head) + b"".join(frags)


def unpack_fragments(payload: bytes) -> list[bytes]:
    if payload[:4] != _FRAG_MAGIC:
        raise ValueError("bad unit container magic")
    n = int.from_bytes(payload[4:8], "little")
    lens = [int.from_bytes(payload[8 + 8 * i : 16 + 8 * i], "little") for i in range(n)]
    out = []
    pos = 8 + 8 * n
    for ln in lens:
        out.append(payload[pos : pos + ln])
        pos += ln
    return out


@dataclass
class EncodeJobConfig:
    output_dir: str
    key_col: str = "url"
    size_cols: tuple = ("text", "html")
    target_unit_bytes: int = 64 << 20
    sample_rows: int = 100_000
    run_id: str = ""

    def __post_init__(self):
        if not self.run_id:
            self.run_id = uuid.uuid4().hex[:12]


def _plan_path(output_dir: str) -> str:
    return os.path.join(output_dir, "plan.json")


def load_or_build_plan(df, cfg: EncodeJobConfig) -> EncodePlan:
    """Reuse the persisted plan (stable unit identity across resumes) or
    build one from a deterministic sample."""
    path = _plan_path(cfg.output_dir)
    if os.path.exists(path):
        with open(path) as f:
            return EncodePlan.from_json(f.read())
    plan = plan_encode(
        df,
        key_col=cfg.key_col,
        size_cols=[c for c in cfg.size_cols if c in df.columns],
        target_bytes=cfg.target_unit_bytes,
        sample_rows=cfg.sample_rows,
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(plan.to_json())
    os.replace(tmp, path)
    return plan


def completed_units(spark, output_dir: str) -> set[int]:
    """Units whose lineage rows say 'ok' — skipped on resume."""
    lineage_dir = os.path.join(output_dir, "lineage")
    if not os.path.isdir(lineage_dir):
        return set()
    rows = spark.read.parquet(lineage_dir).where("status = 'ok'").select("unit").collect()
    return {r.unit for r in rows}


def encode_job(spark, df, cfg: EncodeJobConfig) -> dict:
    """Run (or resume) the encode job.

    Map-side combine: every input partition encodes its rows into
    per-unit *fragments* before the shuffle, so the exchange carries
    compressed bytes (~5x less traffic than shuffling raw rows — the
    difference between shuffling 100 TB and 20 TB at nominal scale).  The
    reduce side only concatenates fragments into the final per-unit
    container; nothing is re-encoded.  Fragment boundaries depend on input
    splits, so payload bytes may differ between runs at different
    parallelism — decoded data is identical (the north-rule invariant),
    and resume stays unit-atomic via lineage."""
    plan = load_or_build_plan(df, cfg)
    done = completed_units(spark, cfg.output_dir)
    n_units = plan.n_units

    bplan = spark.sparkContext.broadcast(plan.to_json())
    bdone = spark.sparkContext.broadcast(sorted(done))
    key_col = cfg.key_col

    def map_encode(iterator):
        from ..plans.partitioning import _fixed_width

        plan_local = EncodePlan.from_json(bplan.value)
        done_local = np.array(bdone.value, dtype=np.int64)
        buf: dict[int, list] = {}
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            units = assign_units_arrow(batch.column(key_col), plan_local)
            keys = _fixed_width(batch.column(key_col))
            if done_local.size:
                keep = ~np.isin(units, done_local)
                if not keep.all():
                    idx = np.flatnonzero(keep)
                    batch = batch.take(pa.array(idx))
                    units = units[keep]
                    keys = keys[keep]
            if len(units) == 0:
                continue
            order = np.lexsort((keys, units))
            batch = batch.take(pa.array(order))
            units = units[order]
            change = np.flatnonzero(units[1:] != units[:-1])
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(units)]))
            for s, e in zip(starts, ends):
                buf.setdefault(int(units[s]), []).append(batch.slice(s, e - s))
        # train FSST tables ONCE per task from the largest buffered unit's
        # string/binary columns; fragments reuse them (the per-fragment
        # trial still falls back to plain if a table fits poorly)
        fsst_tables = {}
        if buf:
            biggest = max(buf.values(), key=lambda bs: sum(b.nbytes for b in bs))
            probe = pa.Table.from_batches(biggest)
            for field in probe.schema:
                if pa.types.is_string(field.type) or pa.types.is_binary(field.type) or \
                   pa.types.is_large_string(field.type) or pa.types.is_large_binary(field.type):
                    col = probe.column(field.name).combine_chunks()
                    bufs_ = col.buffers()
                    if bufs_[2] is not None and bufs_[2].size >= 64:
                        sample = bufs_[2].to_pybytes()[:65536]
                        from ..codecs.fsst import fsst_train

                        fsst_tables[field.name] = fsst_train(sample)

        for unit in sorted(buf):
            t0 = time.perf_counter()
            tbl = pa.Table.from_batches(buf[unit])
            payload, report = serialize_chunk(tbl, fsst_tables)
            wall = (time.perf_counter() - t0) * 1000
            first_key = tbl.column(key_col)[0].as_py() if tbl.num_rows else ""
            yield pa.RecordBatch.from_pydict(
                {
                    "unit": [unit],
                    "first_key": [first_key],
                    "n_rows": [tbl.num_rows],
                    "bytes_in": [report["bytes_in"]],
                    "bytes_out": [len(payload)],
                    "wall_ms": [wall],
                    "codecs": [json.dumps({c["name"]: c["codec"] for c in report["columns"]})],
                    "payload": [payload],
                }
            )

    from pyspark.sql import functions as F

    frags = df.mapInArrow(map_encode, FRAG_SCHEMA)
    shuffled = frags.repartition(max(n_units - len(done), 1), F.col("unit"))

    def reduce_combine(iterator):
        per_unit: dict[int, list] = {}
        for batch in iterator:
            d = batch.to_pydict()
            for i in range(batch.num_rows):
                per_unit.setdefault(d["unit"][i], []).append(
                    (
                        d["first_key"][i],
                        d["n_rows"][i],
                        d["bytes_in"][i],
                        d["wall_ms"][i],
                        d["codecs"][i],
                        d["payload"][i],
                    )
                )
        for unit in sorted(per_unit):
            frag_rows = sorted(per_unit[unit], key=lambda r: r[0])
            payload = pack_fragments([r[5] for r in frag_rows])
            yield pa.RecordBatch.from_pydict(
                {
                    "unit": [unit],
                    "n_rows": [int(sum(r[1] for r in frag_rows))],
                    "bytes_in": [int(sum(r[2] for r in frag_rows))],
                    "bytes_out": [len(payload)],
                    "wall_ms": [float(sum(r[3] for r in frag_rows))],
                    "codecs": [frag_rows[0][4]],
                    "payload": [payload],
                }
            )

    encoded = shuffled.mapInArrow(reduce_combine, ENC_SCHEMA)
    data_dir = os.path.join(cfg.output_dir, "data")
    t_stage = time.perf_counter()
    (
        encoded.write.mode("append")
        .option("compression", "uncompressed")
        .parquet(data_dir)
    )
    stage_wall = time.perf_counter() - t_stage

    # lineage from the COMMITTED sink (column-pruned read: payload skipped)
    sink = spark.read.parquet(data_dir).drop("payload")
    new_units = sink.where(~F.col("unit").isin(list(done)) if done else F.lit(True))
    lineage = (
        new_units.withColumn("run_id", F.lit(cfg.run_id))
        .withColumn("status", F.lit("ok"))
        .withColumn("committed_at", F.current_timestamp())
    )
    lineage.write.mode("append").parquet(os.path.join(cfg.output_dir, "lineage"))

    agg = sink.agg(
        F.count("*").alias("units"),
        F.sum("n_rows").alias("rows"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
    ).collect()[0]
    return {
        "run_id": cfg.run_id,
        "plan_units": n_units,
        "resumed_units": len(done),
        "encoded_units": int(agg.units),
        "rows": int(agg.rows or 0),
        "bytes_in": int(agg.bytes_in or 0),
        "bytes_out": int(agg.bytes_out or 0),
        "ratio": (int(agg.bytes_out or 0) / int(agg.bytes_in)) if agg.bytes_in else None,
        # wall of the assign→shuffle→encode→sink action alone (excludes
        # planning and lineage bookkeeping, which are O(1) driver work)
        "encode_stage_sec": round(stage_wall, 3),
    }


def decode_dataset(spark, output_dir: str, columns: list[str] | None = None):
    """Read the encoded dataset back as a DataFrame of original rows."""
    data_dir = os.path.join(output_dir, "data")
    enc = spark.read.parquet(data_dir).select("unit", "payload").dropDuplicates(["unit"])

    sample = spark.read.parquet(data_dir).select("payload").limit(1).collect()
    if not sample:
        raise ValueError("empty encoded dataset")
    probe = deserialize_chunk(unpack_fragments(sample[0].payload)[0])
    out_schema = _arrow_to_ddl(probe.schema, columns)

    def decode(iterator):
        for batch in iterator:
            for payload in batch.column("payload"):
                for frag in unpack_fragments(payload.as_py()):
                    tbl = deserialize_chunk(frag)
                    if columns:
                        tbl = tbl.select(columns)
                    for b in tbl.to_batches():
                        yield _normalize_batch(b)

    return enc.mapInArrow(decode, out_schema)


def _arrow_to_ddl(schema: pa.Schema, columns: list[str] | None) -> str:
    parts = []
    for f in schema:
        if columns and f.name not in columns:
            continue
        t = f.type
        if pa.types.is_large_string(t) or pa.types.is_string(t):
            s = "string"
        elif pa.types.is_large_binary(t) or pa.types.is_binary(t):
            s = "binary"
        elif pa.types.is_timestamp(t):
            s = "timestamp"
        elif pa.types.is_int64(t):
            s = "long"
        elif pa.types.is_int32(t):
            s = "int"
        elif pa.types.is_float64(t):
            s = "double"
        elif pa.types.is_float32(t):
            s = "float"
        elif pa.types.is_boolean(t):
            s = "boolean"
        elif pa.types.is_date32(t):
            s = "date"
        elif pa.types.is_decimal(t):
            s = f"decimal({t.precision},{t.scale})"
        else:
            raise TypeError(f"unsupported type {t}")
        parts.append(f"{f.name} {s}")
    return ", ".join(parts)


def _normalize_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    """large_string/large_binary → string/binary for Spark compatibility."""
    cols = []
    fields = []
    for i, f in enumerate(batch.schema):
        col = batch.column(i)
        if pa.types.is_large_string(f.type):
            col = col.cast(pa.string())
        elif pa.types.is_large_binary(f.type):
            col = col.cast(pa.binary())
        cols.append(col)
        fields.append(pa.field(f.name, col.type, f.nullable))
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))

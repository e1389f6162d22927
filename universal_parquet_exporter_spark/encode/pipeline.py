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
    """Run (or resume) the encode job. Returns job metrics."""
    plan = load_or_build_plan(df, cfg)
    done = completed_units(spark, cfg.output_dir)
    n_units = plan.n_units

    bplan = spark.sparkContext.broadcast(plan.to_json())
    bdone = spark.sparkContext.broadcast(sorted(done))
    key_col = cfg.key_col
    columns = df.columns

    def assign(iterator):
        plan_local = EncodePlan.from_json(bplan.value)
        done_local = np.array(bdone.value, dtype=np.int64)
        for batch in iterator:
            units = assign_units_arrow(batch.column(key_col), plan_local)
            keep = ~np.isin(units, done_local) if done_local.size else np.ones(len(units), bool)
            out = batch.append_column("__unit", pa.array(units, type=pa.int64()))
            if not keep.all():
                out = out.filter(pa.array(keep))
            yield out

    from pyspark.sql import functions as F

    assigned_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    assigned = df.mapInArrow(assign, assigned_schema + ", __unit long")

    shuffled = assigned.repartition(max(n_units - len(done), 1), F.col("__unit")).sortWithinPartitions(
        "__unit", key_col
    )

    def encode(iterator):
        current_unit = None
        batches: list[pa.RecordBatch] = []

        def flush():
            nonlocal batches, current_unit
            if current_unit is None:
                return None
            t0 = time.perf_counter()
            tbl = pa.Table.from_batches(batches)
            payload, report = serialize_chunk(tbl)
            wall = (time.perf_counter() - t0) * 1000
            row = pa.RecordBatch.from_pydict(
                {
                    "unit": [current_unit],
                    "n_rows": [tbl.num_rows],
                    "bytes_in": [report["bytes_in"]],
                    "bytes_out": [report["bytes_out"]],
                    "wall_ms": [wall],
                    "codecs": [json.dumps({c["name"]: c["codec"] for c in report["columns"]})],
                    "payload": [payload],
                }
            )
            batches = []
            current_unit = None
            return row

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            units = batch.column("__unit").to_numpy()
            data = batch.drop_columns(["__unit"])
            # units are contiguous after sortWithinPartitions
            change = np.flatnonzero(units[1:] != units[:-1])
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(units)]))
            for s, e in zip(starts, ends):
                u = int(units[s])
                if current_unit is not None and u != current_unit:
                    out = flush()
                    if out is not None:
                        yield out
                current_unit = u
                batches.append(data.slice(s, e - s))
        out = flush()
        if out is not None:
            yield out

    encoded = shuffled.mapInArrow(encode, ENC_SCHEMA)
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
    probe = deserialize_chunk(sample[0].payload)
    out_schema = _arrow_to_ddl(probe.schema, columns)

    def decode(iterator):
        for batch in iterator:
            for payload in batch.column("payload"):
                tbl = deserialize_chunk(payload.as_py())
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

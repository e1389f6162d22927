"""The distributed encode job: plan → mapInArrow encode → Parquet sink +
lineage → (optionally) decode read-back.

Engine analog of the reference's batch-export orchestration
(``/root/reference/examples/advanced_integration_example.py:80-114`` — its
per-query loop with error isolation and a summary record) re-designed for
Spark: the unit of work is a byte-balanced *encode unit* (a url-range,
possibly hash-salted — :mod:`..plans.partitioning`), with per-unit lineage
rows enabling checkpointed resume (north rule).

Scale notes (100 TB / 1000-executor thinking):
- the job is fully NARROW and Iceberg-writer-shaped: each map task
  bucket-sorts its input rows by (unit, key), serializes runs of
  consecutive unit-slices into CHUNKS of ~``chunk_rows`` rows (the codec
  granularity — throughput and ratio degrade sharply on tiny chunks, so
  chunk size must not depend on how many units a task touches or on the
  cluster's parallelism), appends the chunks to its own payload file in
  storage, and emits only tiny MANIFEST rows to Spark — one per
  unit-slice, carrying the chunk location plus the slice's row range,
  exactly how one parquet row group serves several partitions.  Encoded
  bytes never cross the JVM<->Python boundary and are never shuffled —
  measured on this sandbox's fault-expensive kernel, JVM-side handling
  of payload bytes is precisely what destroys multi-core scaling, and at
  nominal scale a consolidate-per-unit exchange is pure network cost on
  already-compressed bytes;
- payload I/O resolves through ``pyarrow.fs`` for ``hdfs://``/``s3://``
  output dirs (same storage as the Spark-written manifests); plain paths
  use POSIX I/O and require a driver+executor shared mount, and payload
  files are fsync'd before their manifest rows are emitted;
- unit atomicity without a shuffle: the manifest parquet commit is
  job-atomic (FileOutputCommitter), lineage rows are derived from the
  committed manifest and appended after, and decode semi-joins fragments
  against lineage on (unit, run_id) — a run that crashes between payload
  writes / manifest commit / lineage commit leaves only dead payload
  files or orphan manifest rows, which are never read, and a resume
  re-encodes those units under a new run_id (GC of dead files is the
  usual Iceberg maintenance sweep);
- payload files hold our codec output verbatim — sizes are honest and
  decode never pays a double-decompress;
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

# manifest row layout: one row per unit-slice — a contiguous row range
# [row_off, row_off+n_rows) of ONE encode unit inside a serialized chunk.
# A chunk (payload bytes at [offset, offset+length) of a task's payload
# file) may hold several consecutive unit-slices, exactly like a parquet
# row group holding several partitions: the encode granularity (chunk,
# sized for codec throughput) is decoupled from the bookkeeping
# granularity (unit, sized for resume/lineage), so fragment size no
# longer shrinks with task parallelism.  Iceberg-style: tasks write data
# files straight to storage, Spark commits only the manifest.
FRAG_SCHEMA = (
    "unit long, first_key string, n_rows long, row_off long, bytes_in long, "
    "bytes_out long, wall_ms double, codecs string, file string, offset long, length long, "
    "stats string, native boolean"
)

_STATS_STR_MAX = 64  # string bound length cap (see _chunk_stats)
_STATS_DV_MAX = 16  # distinct-value set cap (see _chunk_stats)
_STATS_DV_PROBE = 2048  # rows probed before committing to a full unique()

_TS_UNIT_TO_US = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}  # ns divides


def _ts_scalar_us(scalar, unit: str) -> int | None:
    """Arrow timestamp scalar → exact epoch-µs int (no float round-trip);
    None for null."""
    import pyarrow.compute as pc

    raw = pc.cast(scalar, pa.int64()).as_py()
    if raw is None:
        return None
    mult = _TS_UNIT_TO_US[unit]
    return raw // 1000 if mult is None else raw * mult


def ts_value_us(v) -> int:
    """Python datetime → exact epoch-µs int.  Naive datetimes are read as
    UTC wall-clock — the same convention Arrow uses to store tz-naive
    timestamp columns, so filter bounds and recorded stats agree."""
    from datetime import datetime, timedelta, timezone

    if v.tzinfo is None:
        v = v.replace(tzinfo=timezone.utc)
    return (v - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(microseconds=1)


def date_value_days(v) -> int:
    """Python date → days since epoch (the date32 storage integer)."""
    from datetime import date

    return (v - date(1970, 1, 1)).days


def _chunk_stats(tbl: pa.Table) -> str:
    """Per-chunk zone map: JSON ``{col: [min, max]}`` over int/float/
    string/timestamp/date/decimal columns — the engine's analog of
    parquet row-group statistics, consumed by :func:`decode_dataset`'s
    ``filters`` pruning.  A ``null`` bound means unbounded on that side
    (never wrongly prunes):
    - long string minima are TRUNCATED (a prefix is still a valid lower
      bound); long string maxima are dropped (truncating a max would
      understate it and prune chunks that match — the parquet pitfall);
    - float columns containing NaN record no bounds (NaN breaks total
      order);
    - timestamps record exact epoch-µs ints, dates epoch-days ints,
      decimals exact decimal STRINGS (an unscaled int can overflow int64
      at precision 38; the pruning side re-types them from the probed
      schema) — so ``warc_ts``-style time-range scans prune, the
      canonical Common-Crawl filter column (SURVEY §1.2);
    - all-null columns record no bounds.

    Low-cardinality columns additionally record their EXACT distinct
    values under the reserved ``_dv`` key (``{"_dv": {col: [v, ...]}}``)
    when a chunk holds ≤ ``_STATS_DV_MAX`` of them: equality/IN terms on
    interleaved categorical columns (``lang = 'de'``) then prune chunks
    that min/max bounds can never exclude (``'de'`` sits inside every
    chunk's [ar..zh] range).  This is the metadata-plane-sized answer to
    point lookups — a real per-chunk Bloom filter needs ~1 byte/value
    (40 KB/chunk at 32k rows), which belongs in payload, not in a 10^7-
    row manifest; a ≤16-value set costs ≤ ~200 B and is EXACT, not
    probabilistic.  High-cardinality columns exit on a ``_STATS_DV_PROBE``-
    row prefix probe before any full unique() pass; values are stored in
    the same domain as the bounds (µs/days ints, decimal strings), and a
    string set is dropped whole if any member exceeds the length cap
    (a truncated member would break equality exactness).

    Every chunk also records its row count under ``_n`` and per-column
    null counts under ``_nc`` (ALL columns, zeros included — the parquet
    null-count analog, type-agnostic so binary/bool/list columns get
    them too).  Consumers prune ``IS NULL`` terms when a column's count
    is 0, ``IS NOT NULL`` terms when it equals ``_n``, and — because
    comparison/equality predicates are null-rejecting — any other term
    when the column is all-null IN THAT CHUNK, which includes chunks
    from generations that predate the column under additive schema
    evolution (their ``_nc`` simply lacks the key).  A column absent
    from ``_nc`` on a chunk whose map exists therefore means all-null;
    a chunk with no ``_nc`` at all (pre-feature data, or a dataset with
    a real column named ``_n``/``_nc``, which suppresses both reserved
    keys) never prunes on null counts."""
    import math

    import pyarrow.compute as pc

    stats: dict[str, list] = {}
    dv_map: dict[str, list] = {}
    if "_n" not in tbl.schema.names and "_nc" not in tbl.schema.names:
        nc_map = {f.name: tbl.column(f.name).null_count for f in tbl.schema}
    else:
        nc_map = None
    for field in tbl.schema:
        t = field.type
        is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
        is_ts = pa.types.is_timestamp(t)
        is_date = pa.types.is_date(t)
        is_dec = pa.types.is_decimal(t)
        if not (
            pa.types.is_integer(t) or pa.types.is_floating(t) or is_str
            or is_ts or is_date or is_dec
        ):
            continue
        col = tbl.column(field.name)
        if col.null_count == len(col):
            continue
        if is_str:
            # avg > cap ⟹ some member > cap ⟹ the set would be dropped
            # whole — skip the probe without changing the result (and
            # document bodies skip hashing 2048 long strings per chunk)
            avg_len = col.nbytes / max(len(col) - col.null_count, 1)
        if not pa.types.is_floating(t) and field.name != "_dv" and not (
            is_str and avg_len > _STATS_STR_MAX
        ):
            dv = _dv_values(col, t)
            if dv is not None:
                dv_map[field.name] = dv
        if is_str and avg_len > _STATS_STR_MAX:
            # skip long-string columns (document bodies): their maxima
            # would be dropped and their minima truncated to near-useless
            # prefixes, yet min_max would scan every byte — a measurable
            # tax on the hot encode path for bounds that never prune.
            # Keys/ids/enum-ish columns (avg value <= cap) keep stats.
            continue
        mm = pc.min_max(col)
        if is_ts:
            mn = _ts_scalar_us(mm["min"], t.unit)
            mx = _ts_scalar_us(mm["max"], t.unit)
        elif is_date:
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            mn = None if mn is None else date_value_days(mn)
            mx = None if mx is None else date_value_days(mx)
        elif is_dec:
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            mn = None if mn is None else str(mn)
            mx = None if mx is None else str(mx)
        else:
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if mn is None or mx is None:
            continue
        if pa.types.is_floating(t) and (math.isnan(mn) or math.isnan(mx)):
            continue
        if is_str:
            mn = mn[:_STATS_STR_MAX]
            if len(mx) > _STATS_STR_MAX:
                mx = None
        if field.name != "_dv":  # a real column named _dv would shadow the set map
            stats[field.name] = [mn, mx]
    if dv_map and "_dv" not in tbl.schema.names:
        stats["_dv"] = dv_map
    if nc_map is not None:
        stats["_n"] = tbl.num_rows
        stats["_nc"] = nc_map
    return json.dumps(stats, separators=(",", ":"))


def _dv_values(col, t) -> list | None:
    """The column's exact distinct-value set in the zone-map domain, or
    None when it exceeds ``_STATS_DV_MAX`` (a prefix probe exits before
    the full unique() on high-cardinality columns) or any string member
    exceeds the length cap.  Sorted — stats stay byte-deterministic."""
    import pyarrow.compute as pc

    # pc.unique/count_distinct take ChunkedArray directly — no copy
    if len(col) > _STATS_DV_PROBE:
        if pc.count_distinct(col.slice(0, _STATS_DV_PROBE)).as_py() > _STATS_DV_MAX:
            return None
    u = pc.unique(col).drop_null()
    if len(u) > _STATS_DV_MAX or len(u) == 0:
        return None
    if pa.types.is_timestamp(t):
        mult = _TS_UNIT_TO_US[t.unit]
        raw = u.cast(pa.int64()).to_pylist()
        vals = [r // 1000 if mult is None else r * mult for r in raw]
    elif pa.types.is_date(t):
        vals = [date_value_days(v) for v in u.to_pylist()]
    elif pa.types.is_decimal(t):
        vals = [str(v) for v in u.to_pylist()]
    else:
        vals = u.to_pylist()
        if vals and isinstance(vals[0], str) and any(len(v) > _STATS_STR_MAX for v in vals):
            return None
    return sorted(vals)


def _payload_fs(path: str):
    """(filesystem, path) for payload I/O.  ``hdfs://``/``s3://``-style
    URIs route through pyarrow.fs so payload bytes land in the same
    storage as the Spark-written manifests; plain paths use POSIX I/O and
    REQUIRE a filesystem shared by driver and executors at the same
    mount point (the usual Iceberg warehouse assumption)."""
    if "://" in path:
        from pyarrow import fs as pafs

        f, p = pafs.FileSystem.from_uri(path)
        return f, p
    return None, path


class _TaskPayloadWriter:
    """Append-only payload file for one task attempt.  The file name is
    unique per attempt, so retried/speculative attempts never collide;
    files whose rows never reach the committed manifest are dead data
    (GC-able), exactly like uncommitted Iceberg data files.  ``close``
    fsyncs (POSIX path) BEFORE the task emits its manifest rows, so a
    committed manifest never points at payload bytes still in page cache."""

    def __init__(self, payload_dir: str):
        self._fs, self._dir = _payload_fs(payload_dir)
        self._fh = None
        self.name = ""
        self.offset = 0

    def write(self, payload: bytes) -> tuple[str, int, int]:
        if self._fh is None:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
            self.name = f"frag-{attempt}-{uuid.uuid4().hex[:8]}.bin"
            full = os.path.join(self._dir, self.name) if self._fs is None else f"{self._dir}/{self.name}"
            if self._fs is None:
                os.makedirs(self._dir, exist_ok=True)
                self._fh = open(full, "wb")
            else:
                self._fs.create_dir(self._dir, recursive=True)
                self._fh = self._fs.open_output_stream(full)
        off = self.offset
        self._fh.write(payload)
        self.offset += len(payload)
        return self.name, off, len(payload)

    def close(self) -> None:
        if self._fh is not None:
            if self._fs is None:
                self._fh.flush()
                os.fsync(self._fh.fileno())
            self._fh.close()


def _open_payload(payload_dir: str, fname: str):
    """Seekable read handle for a payload file via the same fs resolution
    as the writer."""
    f, d = _payload_fs(payload_dir)
    if f is None:
        return open(os.path.join(d, fname), "rb")
    return f.open_input_file(f"{d}/{fname}")


@dataclass
class EncodeJobConfig:
    output_dir: str
    key_col: str = "url"
    size_cols: tuple = ("text", "html")
    target_unit_bytes: int = 64 << 20
    sample_rows: int = 100_000
    run_id: str = ""
    # serialize-flush threshold: a task groups consecutive unit-slices
    # into one chunk until it holds this many rows.  Codec throughput and
    # ratio degrade sharply on tiny chunks (measured ~5x between 600-row
    # and 10k-row chunks), so chunk size must NOT depend on how many
    # units a task happens to touch.
    chunk_rows: int = 32768
    # per-task buffered-bytes cap: the encode stream flushes a grouped
    # chunk wave whenever buffered input crosses this, so task memory is
    # independent of the input split size (a 100 TB job can keep
    # map_tasks small without risking executor OOM).  256 MB default =
    # several full-size chunks per wave, no measurable ratio cost.
    max_buffer_bytes: int = 256 << 20
    # explicit map-task count for the parquet path (None = ~4 waves of
    # defaultParallelism).  Benchmarks pin this so every parallelism
    # level runs IDENTICAL per-task work — the way a real cluster scales.
    map_tasks: int | None = None
    # resume semantics: True (batch default) skips units already ok in
    # lineage; False (streaming append) encodes every input row, adding
    # fragments to existing units under this run's id.
    skip_completed: bool = True
    # idempotency tag recorded in lineage (streaming micro-batches use
    # "batch_<id>"): a replayed foreachBatch attempt is skipped when its
    # tag is already committed, and a torn attempt's fragments carry an
    # uncommitted run_id, so decode never sees duplicates.
    batch_tag: str = ""
    # "parquet": the input argument is a directory; work items come from
    # driver-side footer scans.  "iceberg": the input argument is a
    # catalog table name; work items come from the table's own manifests
    # (``<table>.files`` metadata table) as whole-file items whose row
    # groups the tasks expand themselves.
    input_format: str = "parquet"
    # row groups read ahead of the encode loop by a task-local reader
    # thread (pyarrow reads release the GIL, so the next group's
    # IO+decompress overlaps the current chunk's encode kernels).  Task
    # memory grows by at most depth x one decoded row group.  0 = serial.
    prefetch_depth: int = 2
    # how the (file, row-group) work list reaches tasks: "range" (default)
    # broadcasts the list and drives tasks from a JVM-native range source
    # — no python work-list relay in the encode stage; "rdd" is the old
    # parallelize+createDataFrame shape, kept as the measured A/B lever
    # (BENCH/workdist_ab.py).
    work_dist: str = "range"
    # write-time clustering (the Iceberg SortOrder analog): the DataFrame
    # encode path range-repartitions + sorts the input by these columns
    # before the map-side encode, and every unit-slice keeps the cluster
    # order as its in-chunk row order.  Chunks then cover NARROW cluster-
    # column ranges, so zone maps prune on a second dimension beyond the
    # key (e.g. key_col=url, cluster_by=("warc_ts",) makes time-range
    # scans skip payload), and runs on the cluster columns compress
    # further (RLE/FOR see whole-chunk runs instead of interleaved
    # values).  Costs ONE extra exchange up front — the standard price of
    # a sorted write, paid once at ingest and repaid on every filtered
    # read.  () = off (arrival order, no extra shuffle).  The direct-
    # parquet path inherits the files' existing order instead (sorting
    # there would mean shuffling raw rows through Python); cluster
    # already-written inputs via the DataFrame path.
    cluster_by: tuple = ()

    def __post_init__(self):
        if not self.run_id:
            self.run_id = uuid.uuid4().hex[:12]

    @classmethod
    def from_environment(cls) -> "EncodeJobConfig":
        """Build a config from ``UPES_ENCODE_*`` environment variables —
        the deployment-convenience path the reference provides for its DB
        config (``/root/reference/config/sqlserver_config.py:53-106``),
        including the same required-variable error contract."""
        env = os.environ
        missing = [v for v in ("UPES_ENCODE_OUTPUT_DIR",) if not env.get(v)]
        if missing:
            raise ValueError(
                "Missing required environment variables: " + ", ".join(missing)
            )
        size_cols = env.get("UPES_ENCODE_SIZE_COLS", "text,html")
        map_tasks = env.get("UPES_ENCODE_MAP_TASKS")
        return cls(
            output_dir=env["UPES_ENCODE_OUTPUT_DIR"],
            key_col=env.get("UPES_ENCODE_KEY_COL", "url"),
            size_cols=tuple(c for c in size_cols.split(",") if c),
            target_unit_bytes=int(env.get("UPES_ENCODE_TARGET_UNIT_BYTES", 64 << 20)),
            sample_rows=int(env.get("UPES_ENCODE_SAMPLE_ROWS", 100_000)),
            run_id=env.get("UPES_ENCODE_RUN_ID", ""),
            chunk_rows=int(env.get("UPES_ENCODE_CHUNK_ROWS", 32768)),
            max_buffer_bytes=int(env.get("UPES_ENCODE_MAX_BUFFER_BYTES", 256 << 20)),
            map_tasks=int(map_tasks) if map_tasks else None,
            input_format=env.get("UPES_ENCODE_INPUT_FORMAT", "parquet"),
            cluster_by=tuple(
                c for c in env.get("UPES_ENCODE_CLUSTER_BY", "").split(",") if c
            ),
        )


def _plan_path(output_dir: str) -> str:
    return os.path.join(output_dir, "plan.json")


def _persist_plan(plan: EncodePlan, output_dir: str) -> None:
    fs, root = _payload_fs(output_dir)
    if fs is None:
        path = _plan_path(root)
        os.makedirs(root, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(plan.to_json())
        os.replace(tmp, path)
    else:
        # same temp-write + atomic-move commit as the POSIX branch: a
        # reader (concurrent or resumed job) must never load a truncated
        # plan.json — unit identities would silently change
        fs.create_dir(root, recursive=True)
        tmp = f"{root}/plan.json.tmp{os.getpid()}"
        with fs.open_output_stream(tmp) as f:
            f.write(plan.to_json().encode())
        fs.move(tmp, f"{root}/plan.json")


def _load_plan(output_dir: str) -> EncodePlan | None:
    fs, root = _payload_fs(output_dir)
    if fs is None:
        path = _plan_path(root)
        if os.path.exists(path):
            with open(path) as f:
                return EncodePlan.from_json(f.read())
        return None
    from pyarrow.fs import FileType

    info = fs.get_file_info(f"{root}/plan.json")
    if info.type == FileType.NotFound:
        return None
    with fs.open_input_file(f"{root}/plan.json") as f:
        return EncodePlan.from_json(f.read().decode())


_MANIFEST_PTR = "manifest_current"


def manifest_dir(output_dir: str) -> str:
    """Resolve the CURRENT manifest directory via the version pointer —
    the Iceberg version-hint pattern.  ``manifest_current`` names the
    live manifest dir (``data`` by default; vacuum's rewrite creates
    ``data_v<N>`` and swaps the pointer atomically), so a reader never
    observes a missing or half-swapped directory: it sees either the old
    manifest (still on disk until the next horizoned sweep) or the new
    one, both complete."""
    fs, root = _payload_fs(output_dir)
    if fs is None:
        p = os.path.join(root, _MANIFEST_PTR)
        if os.path.exists(p):
            with open(p) as f:
                name = f.read().strip()
                if name:
                    return os.path.join(output_dir, name)
    else:
        from pyarrow.fs import FileType

        p = f"{root}/{_MANIFEST_PTR}"
        if fs.get_file_info(p).type == FileType.File:
            with fs.open_input_file(p) as f:
                name = f.read().decode().strip()
                if name:
                    return f"{output_dir}/{name}"
    return os.path.join(output_dir, "data")


def set_manifest_dir(output_dir: str, name: str) -> None:
    """Atomically point ``manifest_current`` at ``name`` (temp-write +
    rename/move — the same commit idiom as the plan file)."""
    fs, root = _payload_fs(output_dir)
    if fs is None:
        p = os.path.join(root, _MANIFEST_PTR)
        tmp = p + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)
    else:
        tmp = f"{root}/{_MANIFEST_PTR}.tmp{os.getpid()}"
        with fs.open_output_stream(tmp) as f:
            f.write(name.encode())
        fs.move(tmp, f"{root}/{_MANIFEST_PTR}")


def next_manifest_name(output_dir: str) -> str:
    """Fresh ``data_v<N>`` name above EVERY existing version dir — not
    current-pointer+1: a crashed or still-in-flight overwrite's
    unreferenced ``data_v<N>`` must never be reused (clobbering it would
    mix two writers' manifests).  Shared by the DataSource overwrite
    sink, compaction, and vacuum's manifest rewrite so concurrent
    version allocation is consistent."""
    fs, root = _payload_fs(output_dir)
    names: list[str] = []
    if fs is None:
        if os.path.isdir(root):
            names = os.listdir(root)
    else:
        from pyarrow.fs import FileSelector

        try:
            names = [i.base_name for i in fs.get_file_info(FileSelector(root))]
        except (FileNotFoundError, OSError):
            names = []
    top = 0
    for n in names:
        if n.startswith("data_v"):
            try:
                top = max(top, int(n[len("data_v"):]))
            except ValueError:
                pass
    return f"data_v{top + 1}"


def _dir_exists(path: str) -> bool:
    fs, p = _payload_fs(path)
    if fs is None:
        return os.path.isdir(p)
    from pyarrow.fs import FileType

    return fs.get_file_info(p).type == FileType.Directory


def load_or_build_plan(df, cfg: EncodeJobConfig) -> EncodePlan:
    """Reuse the persisted plan (stable unit identity across resumes) or
    build one from a deterministic sample."""
    plan = _load_plan(cfg.output_dir)
    if plan is not None:
        return plan
    plan = plan_encode(
        df,
        key_col=cfg.key_col,
        size_cols=[c for c in cfg.size_cols if c in df.columns],
        target_bytes=cfg.target_unit_bytes,
        sample_rows=cfg.sample_rows,
    )
    _persist_plan(plan, cfg.output_dir)
    return plan


def _parquet_work_items(input_dir: str) -> tuple[list[tuple[str, int]], int]:
    """(file, row-group) work-list + total row count from the footers.  At
    nominal (Iceberg) scale both come from the table's manifests instead
    of a directory listing."""
    import pyarrow.parquet as pq

    items: list[tuple[str, int]] = []
    total_rows = 0
    for fn in sorted(os.listdir(input_dir)):
        if not fn.endswith(".parquet"):
            continue
        full = os.path.join(input_dir, fn)
        md = pq.ParquetFile(full).metadata
        total_rows += md.num_rows
        items.extend((full, rg) for rg in range(md.num_row_groups))
    return items, total_rows


def _iceberg_work_items(spark, table: str) -> tuple[list[tuple[str, int]], int]:
    """Work-list + row count from an Iceberg table's own manifests via its
    ``<table>.files`` metadata table — no directory listing and no
    driver-side footer scan.  Each item is ``(file_path, -1)``; the map
    task expands ``-1`` to the file's row groups itself (footers are read
    where the data is — the Iceberg split-planning shape).

    Copy-on-write tables only: ``content`` classifies each manifest entry
    (0 = data, 1 = position deletes, 2 = equality deletes), and a v2
    merge-on-read snapshot stores row-level deletes as delete FILES that a
    plain file scan cannot apply — encoding such a table would silently
    resurrect deleted rows, so any delete file fails the job fast instead.

    Requires an Iceberg catalog configured on the session
    (``spark.sql.catalog.*``); the sandbox has none, so this branch is
    exercised by a mock of the metadata-table query
    (``tests/test_pipeline.py``), the same way the JDBC reader is tested
    without a database."""
    files = spark.sql(
        f"SELECT file_path, record_count, content FROM {table}.files"
    ).collect()
    n_deletes = sum(1 for r in files if int(r.content or 0) != 0)
    if n_deletes:
        raise ValueError(
            f"{table} has {n_deletes} delete file(s) in its current snapshot "
            "(merge-on-read row-level deletes); the encode scan reads data "
            "files directly and cannot apply them. Rewrite the table "
            "copy-on-write first (e.g. CALL rewrite_data_files / "
            "rewrite_position_delete_files) and re-run."
        )
    data = [r for r in files if int(r.content or 0) == 0]
    items = [(r.file_path, -1) for r in data]
    total_rows = int(sum(r.record_count for r in data))
    return items, total_rows


def _parquet_file(path: str):
    """pyarrow ParquetFile for a plain path or a filesystem URI (Iceberg
    manifests store fully-qualified URIs)."""
    import pyarrow.parquet as pq

    if "://" in path:
        from pyarrow import fs as pafs

        f, p = pafs.FileSystem.from_uri(path)
        return pq.ParquetFile(f.open_input_file(p))
    return pq.ParquetFile(path)


def _expand_row_groups(pf, rg: int):
    """A work item's row-group field: an explicit row group, or -1 for
    'every row group in the file' (Iceberg-manifest items)."""
    return range(pf.metadata.num_row_groups) if rg < 0 else (rg,)


def load_or_build_plan_parquet(
    spark, items: list[tuple[str, int]], total_rows: int, cfg: EncodeJobConfig
) -> EncodePlan:
    """Parquet-path planner: sample (key, row-size) from a deterministic
    subset of row groups, read IN PARALLEL by pyarrow inside Python
    workers — the full input is never scanned and no raw rows cross the
    JVM boundary (a DataFrame ``.sample()`` would scan everything)."""
    plan = _load_plan(cfg.output_dir)
    if plan is not None:
        return plan

    from ..plans.partitioning import plan_from_sample

    key_col = cfg.key_col
    size_cols = list(cfg.size_cols)
    pick = items[:: max(1, len(items) // 16)][:16]
    per_item = max(64, cfg.sample_rows // len(pick))

    def sample_rg(iterator):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for batch in iterator:
            for path, rg in zip(batch.column("path").to_pylist(), batch.column("rg").to_pylist()):
                tbl = _parquet_file(path).read_row_group(
                    max(rg, 0), columns=[key_col] + size_cols, use_threads=False
                )
                stride = max(1, tbl.num_rows // per_item)
                tbl = tbl.take(pa.array(range(0, tbl.num_rows, stride)))
                sz = None
                for c in size_cols:
                    ln = pc.coalesce(pc.binary_length(tbl.column(c)), pa.scalar(0)).cast("int64")
                    sz = ln if sz is None else pc.add(sz, ln)
                k = tbl.column(key_col).cast(pa.string()).combine_chunks()
                if isinstance(sz, pa.ChunkedArray):
                    sz = sz.combine_chunks()
                yield pa.RecordBatch.from_pydict({"k": k, "sz": sz})

    sample = (
        spark.createDataFrame(pick, "path string, rg int")
        .repartition(len(pick))
        .mapInArrow(sample_rg, "k string, sz long")
        .toPandas()
    )
    plan = plan_from_sample(sample, total_rows, key_col, cfg.target_unit_bytes)
    _persist_plan(plan, cfg.output_dir)
    return plan


def completed_units(spark, output_dir: str) -> np.ndarray:
    """Units whose lineage rows say 'ok' — skipped on resume.  Returned
    as a SORTED int64 numpy array fetched over Arrow (``toArrow``): no
    per-row Python objects on the driver, ~8 B/unit resident (13 MB for
    the 1.6 M units of a 100 TB / 64 MB dataset), broadcast as-is to the
    encode tasks for the sorted-searchsorted membership test
    (:func:`_resume_keep_mask`)."""
    lineage_dir = os.path.join(output_dir, "lineage")
    if not _dir_exists(lineage_dir):
        return np.array([], dtype=np.int64)
    tbl = (
        spark.read.parquet(lineage_dir)
        .where("status = 'ok'")
        .select("unit")
        .distinct()
        .toArrow()
    )
    return np.sort(tbl.column("unit").to_numpy(zero_copy_only=False).astype(np.int64))


def completed_batch_tags(spark, output_dir: str) -> set[str]:
    """Batch tags with committed lineage — a streaming sink checks this
    before encoding so micro-batch replays are no-ops (exactly-once at
    batch granularity)."""
    lineage_dir = os.path.join(output_dir, "lineage")
    if not _dir_exists(lineage_dir):
        return set()
    ldf = spark.read.parquet(lineage_dir)
    if "batch_tag" not in ldf.columns:
        return set()
    rows = (
        ldf.where("status = 'ok' AND batch_tag != ''").select("batch_tag").distinct().collect()
    )
    return {r.batch_tag for r in rows}


def _resume_keep_mask(units: np.ndarray, done_local: np.ndarray) -> np.ndarray:
    """True where ``units[i]`` is NOT in the (sorted) completed-unit
    list.  Sorted searchsorted membership is O(n log m) with no hash
    table rebuilt per batch, unlike ``np.isin`` — at 100 TB / 64 MB
    units the done list is ~1.6 M ids and this runs once per batch."""
    if not done_local.size:
        return np.ones(len(units), dtype=bool)
    pos = np.minimum(np.searchsorted(done_local, units), done_local.size - 1)
    return done_local[pos] != units


def _prefetched(iterable, depth: int = 2):
    """Yield from ``iterable`` with a bounded read-ahead thread: the
    producer (pyarrow row-group reads — IO + decompress in C++, GIL
    released) runs up to ``depth`` items ahead of the consumer (the
    encode kernels), so read time hides behind encode time instead of
    adding to it.  Exceptions propagate to the consumer; the queue bound
    caps task memory at depth x one item.  ``depth<=0`` degrades to the
    plain iterator (the A/B lever)."""
    if depth <= 0:
        yield from iterable
        return
    import queue as _queue
    import threading

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    _end = object()
    stop = threading.Event()

    def put_or_abandon(item) -> bool:
        # bounded put that notices consumer abandonment: a task that
        # dies mid-stream must not leave this thread blocked forever on
        # a full queue (pinning row groups) in a reused worker.  EVERY
        # pump-side put goes through here — the terminal _end/exception
        # puts included, since the consumer's finally-drain is one-pass
        # and a plain blocking put can land just after it finishes.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def pump():
        try:
            for item in iterable:
                if not put_or_abandon(item):
                    return
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            put_or_abandon(e)
            return
        put_or_abandon(_end)

    t = threading.Thread(target=pump, daemon=True, name="upes-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _end:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # unblock a pump waiting on a full queue
            try:
                q.get_nowait()
            except _queue.Empty:
                break


def _encode_stream(
    iterator,
    plan_local: EncodePlan,
    done_local: np.ndarray,
    key_col: str,
    payload_dir: str,
    chunk_rows: int = 32768,
    max_buffer_bytes: int = 256 << 20,
    stats: dict | None = None,
    cluster_cols: tuple = (),
    sort_units_at_flush: bool = False,
):
    """Core map-side combine: consume Arrow record batches, bucket rows
    into encode units, serialize runs of consecutive unit-slices as
    chunks of ~``chunk_rows`` rows into the task's payload file, and emit
    one manifest row per unit-slice (chunk location + row range).  Shared
    by the DataFrame input path and the direct-parquet input path.

    Task memory is BOUNDED by ``max_buffer_bytes``: whenever the buffered
    (referenced) bytes cross the cap, the whole buffer is flushed as a
    grouped wave — unit-sorted, consecutive unit-slices packed into
    ~``chunk_rows``-row chunks, identical to the end-of-input flush — and
    the buffer is cleared so the input batches it pinned are released.
    Flushing the whole wave (rather than one hot unit) matters because
    unit buffers hold zero-copy SLICES of input batches: releasing parent
    memory requires every slice of a parent to go, and a 256 MB wave
    still yields full-size chunks, so ratio/throughput are unaffected.
    Units touched by several waves simply get several manifest rows
    (fragments), which decode and resume already handle.  Resident set
    per task ≈ cap + one input batch + serialization temporaries,
    independent of the task's input split size — the 100 TB sizing rule
    is therefore just ``max_buffer_bytes``, not ``map_tasks``.

    ``stats`` (tests) receives ``peak_buffer_bytes`` and ``flush_waves``."""
    from ..plans.partitioning import _fixed_width

    from ..codecs._native import get_native

    buf: dict[int, list] = {}
    buf_bytes = 0
    peak_bytes = 0
    waves = 0
    fsst_tables: dict | None = None
    writer = _TaskPayloadWriter(payload_dir)
    # codec provenance: True when this worker process compiled/loaded the
    # C fast path, False on the pure-NumPy fallback (no compiler on the
    # host).  Recorded per fragment → aggregated into lineage, so a perf
    # delta on a heterogeneous cluster is attributable from metadata.
    native_flag = get_native() is not None
    rows: dict[str, list] = {
        k: []
        for k in (
            "unit", "first_key", "n_rows", "row_off", "bytes_in", "bytes_out",
            "wall_ms", "codecs", "file", "offset", "length", "stats", "native",
        )
    }

    def train_fsst():
        # train FSST tables ONCE per task, at the first flush, from the
        # largest buffered unit's string/binary columns (≥64 KiB sample by
        # construction); later fragments reuse them, and the per-fragment
        # trial still falls back to plain if a table fits poorly
        nonlocal fsst_tables
        if fsst_tables is not None:
            return
        fsst_tables = {}
        if not buf:
            return
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

    def flush_buffer():
        # grouped flush of the whole buffer: unit order, consecutive
        # unit-slices packed into ~chunk_rows-row chunks
        nonlocal buf, buf_bytes, waves
        if not buf:
            return
        train_fsst()
        waves += 1
        pending: list[tuple[int, list]] = []  # (unit, batches) in unit order
        pending_rows = 0

        def flush_chunk():
            nonlocal pending, pending_rows
            if not pending:
                return
            t0 = time.perf_counter()
            tbl = pa.Table.from_batches([b for _, bs in pending for b in bs])
            payload, report = serialize_chunk(tbl, fsst_tables)
            fname, off, length = writer.write(payload)
            stats_json = _chunk_stats(tbl)
            wall = (time.perf_counter() - t0) * 1000
            codecs = json.dumps({c["name"]: c["codec"] for c in report["columns"]})
            # prorate chunk-level byte/wall totals across its unit-slices
            # by row share; remainders land on the last slice so per-unit
            # sums in lineage stay exact
            row_off = 0
            rem_in, rem_out, rem_wall = report["bytes_in"], length, wall
            for i, (unit, bs) in enumerate(pending):
                n_u = sum(b.num_rows for b in bs)
                if i == len(pending) - 1:
                    b_in, b_out, w_u = rem_in, rem_out, rem_wall
                else:
                    frac = n_u / tbl.num_rows
                    b_in = int(report["bytes_in"] * frac)
                    b_out = int(length * frac)
                    w_u = wall * frac
                    rem_in -= b_in
                    rem_out -= b_out
                    rem_wall -= w_u
                rows["unit"].append(unit)
                rows["first_key"].append(bs[0].column(key_col)[0].as_py() if n_u else "")
                rows["n_rows"].append(n_u)
                rows["row_off"].append(row_off)
                rows["bytes_in"].append(b_in)
                rows["bytes_out"].append(b_out)
                rows["wall_ms"].append(w_u)
                rows["codecs"].append(codecs)
                rows["file"].append(fname)
                rows["offset"].append(off)
                rows["length"].append(length)
                rows["stats"].append(stats_json)
                rows["native"].append(native_flag)
                row_off += n_u
            pending = []
            pending_rows = 0

        for unit in sorted(buf):
            bs = buf[unit]
            if cluster_cols:
                # cluster mode: a unit whose wave-buffer exceeds
                # chunk_rows must SPLIT into ~chunk_rows chunks — the
                # plain packer only cuts between units, which would put
                # the whole sorted unit in one chunk and erase the
                # clustering's zone-map value.  Fragments per unit are
                # already the normal decode/resume shape.
                utbl = pa.Table.from_batches(bs)
                if sort_units_at_flush:
                    # retro-clustering (compaction): no shuffle
                    # pre-sorted this stream, so order the whole
                    # buffered unit here — transient cost is one
                    # combined table per unit within the already-
                    # bounded wave (the sort itself is Arrow C++)
                    utbl = utbl.sort_by([(c, "ascending") for c in cluster_cols])
                for s in range(0, utbl.num_rows, chunk_rows):
                    sl = utbl.slice(s, min(chunk_rows, utbl.num_rows - s))
                    pending.append((unit, sl.to_batches()))
                    pending_rows += sl.num_rows
                    if pending_rows >= chunk_rows:
                        flush_chunk()
                continue
            pending.append((unit, bs))
            pending_rows += sum(b.num_rows for b in bs)
            if pending_rows >= chunk_rows:
                flush_chunk()
        flush_chunk()
        buf = {}
        buf_bytes = 0

    try:
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            units = assign_units_arrow(batch.column(key_col), plan_local)
            keys = _fixed_width(batch.column(key_col))
            if done_local.size:
                keep = _resume_keep_mask(units, done_local)
                if not keep.all():
                    idx = np.flatnonzero(keep)
                    batch = batch.take(pa.array(idx))
                    units = units[keep]
                    keys = keys[keep]
            if len(units) == 0:
                continue
            if cluster_cols:
                # cluster mode: unit-major, then the cluster columns —
                # the batch arrives globally sorted by the cluster
                # columns (encode_job's range-repartition + sort pre-
                # pass), so a stable per-unit re-sort on the same keys
                # preserves that order inside every unit slice, and
                # concatenated slices of one unit across batches stay
                # sorted.  pyarrow sort_indices handles every zone-map
                # type (timestamps, decimals, strings) and puts nulls
                # last, which RLE then picks up as one run.
                sort_tbl = pa.table(
                    {"__unit__": pa.array(units)}
                    | {c: batch.column(c) for c in cluster_cols}
                )
                order = pa.compute.sort_indices(
                    sort_tbl,
                    sort_keys=[("__unit__", "ascending")]
                    + [(c, "ascending") for c in cluster_cols],
                ).to_numpy()
            else:
                order = np.lexsort((keys, units))
            batch = batch.take(pa.array(order))
            units = units[order]
            change = np.flatnonzero(units[1:] != units[:-1])
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(units)]))
            for s, e in zip(starts, ends):
                sl = batch.slice(s, e - s)
                buf.setdefault(int(units[s]), []).append(sl)
            buf_bytes += batch.nbytes
            peak_bytes = max(peak_bytes, buf_bytes)
            if buf_bytes >= max_buffer_bytes:
                flush_buffer()
        flush_buffer()
    finally:
        writer.close()
    if stats is not None:
        stats["peak_buffer_bytes"] = peak_bytes
        stats["flush_waves"] = waves
    if rows["unit"]:
        yield pa.RecordBatch.from_pydict(rows)


def encode_job(spark, df, cfg: EncodeJobConfig) -> dict:
    """Run (or resume) the encode job over an arbitrary DataFrame.

    Map-side combine: every input partition encodes its rows into
    per-unit *fragments* before the shuffle, so the exchange carries
    compressed bytes (~5x less traffic than shuffling raw rows — the
    difference between shuffling 100 TB and 20 TB at nominal scale).  The
    reduce side only concatenates fragments into the final per-unit
    container; nothing is re-encoded.  Fragment boundaries depend on input
    splits, so payload bytes may differ between runs at different
    parallelism — decoded data is identical (the north-rule invariant),
    and resume stays unit-atomic via lineage.

    For parquet-backed inputs prefer :func:`encode_parquet_job`: this
    DataFrame path pays a JVM->Python Arrow transfer of every raw row,
    which measurably anti-scales on fault-expensive kernels."""
    bad = [c for c in df.columns if "." in c or "`" in c]
    if bad:
        # Spark's mapInArrow resolves each input column by name and
        # parses dots as struct paths — fail loudly instead of
        # surfacing its cryptic resolution error.  The upe_encoded sink
        # (pure Arrow, no name resolution) handles such columns fine.
        raise ValueError(
            f"column names with '.' or '`' are unsupported by the DataFrame "
            f"encode path (Spark mapInArrow limitation): {bad}; rename them "
            "or write via df.write.format('upe_encoded')"
        )
    plan = load_or_build_plan(df, cfg)
    done = (
        completed_units(spark, cfg.output_dir)
        if cfg.skip_completed
        else np.array([], dtype=np.int64)
    )

    if cfg.cluster_by:
        missing = [c for c in cfg.cluster_by if c not in df.columns]
        if missing:
            raise ValueError(f"cluster_by columns not in input: {missing}")
        # clustered write: ONE range exchange so each map task owns a
        # narrow cluster-column range, then an in-partition sort (Spark's
        # external sort — spills, never OOMs).  Every chunk the task cuts
        # afterwards covers a tight cluster range, which is what makes
        # the zone maps on these columns selective.  The plan was built
        # from the pre-shuffle df (same rows, sampling is order-
        # insensitive), so unit boundaries are unaffected.
        n_part = cfg.map_tasks or spark.sparkContext.defaultParallelism
        cols = list(cfg.cluster_by)
        df = df.repartitionByRange(n_part, *cols).sortWithinPartitions(*cols)

    bplan = spark.sparkContext.broadcast(plan.to_json())
    bdone = spark.sparkContext.broadcast(done)
    key_col = cfg.key_col
    payload_dir = os.path.join(cfg.output_dir, "payload")
    chunk_rows = cfg.chunk_rows
    max_buf = cfg.max_buffer_bytes
    cluster_cols = cfg.cluster_by

    def map_encode(iterator):
        plan_local = EncodePlan.from_json(bplan.value)
        done_local = bdone.value
        yield from _encode_stream(
            iterator, plan_local, done_local, key_col, payload_dir, chunk_rows, max_buf,
            cluster_cols=cluster_cols,
        )

    frags = df.mapInArrow(map_encode, FRAG_SCHEMA)
    return _finish_encode(spark, frags, plan, done, cfg)


def encode_parquet_job(spark, input_dir: str, cfg: EncodeJobConfig, batch_rows: int = 65536) -> dict:
    """Run (or resume) the encode job reading parquet directly in the
    Python workers.

    The work-list is (file, row-group) pairs — at nominal (Iceberg) scale
    this list comes from the table's manifests; here it is built from file
    footers on the driver.  Each task opens its row groups with the Arrow
    C++ parquet reader, so raw rows NEVER cross the JVM<->Python boundary:
    the only Arrow-IPC traffic is the encoded fragments (~5x smaller).
    This is the scan topology a 1000-executor job wants — column chunks
    stream from storage straight into the encode kernels — and it is what
    `bench.py` measures.

    With ``cfg.input_format == "iceberg"``, ``input_dir`` is a catalog
    table name and the work-list comes from the table's manifests
    (:func:`_iceberg_work_items`) instead of a directory scan."""
    if cfg.input_format == "iceberg":
        items, total_rows = _iceberg_work_items(spark, input_dir)
    else:
        items, total_rows = _parquet_work_items(input_dir)
    if not items:
        raise ValueError(f"no parquet input in {input_dir}")
    plan = load_or_build_plan_parquet(spark, items, total_rows, cfg)
    done = (
        completed_units(spark, cfg.output_dir)
        if cfg.skip_completed
        else np.array([], dtype=np.int64)
    )

    bplan = spark.sparkContext.broadcast(plan.to_json())
    bdone = spark.sparkContext.broadcast(done)
    key_col = cfg.key_col
    payload_dir = os.path.join(cfg.output_dir, "payload")
    chunk_rows = cfg.chunk_rows
    max_buf = cfg.max_buffer_bytes

    prefetch = cfg.prefetch_depth

    # task granularity: cfg.map_tasks if pinned (benchmarks pin it so
    # every parallelism level runs identical per-task work), else ~4
    # waves of the current parallelism; chunking no longer ties fragment
    # size to this split, so the choice only balances scheduling overhead
    # against stragglers
    n_map = cfg.map_tasks or max(1, min(len(items), 4 * spark.sparkContext.defaultParallelism))
    n_map = min(n_map, len(items))
    # work distribution: the items list is BROADCAST (torrent-shipped
    # once per executor — ~50 MB for 100 TB of 64 MB row groups) and a
    # JVM-native range source carries only slice ids, so the encode
    # stage has NO python work-list relay in front of it.  The old shape
    # (`parallelize(items)` + `createDataFrame`) chained a second python
    # runner into the stage to unpickle the work rows — measured up to
    # ~40% slower at 8 single-core executors (BENCH/workdist_ab.py);
    # cfg.work_dist="rdd" keeps it as the A/B lever.
    bitems = spark.sparkContext.broadcast(items) if cfg.work_dist != "rdd" else None
    n_items = len(items)

    def map_encode_files(iterator):
        plan_local = EncodePlan.from_json(bplan.value)
        done_local = bdone.value

        def slice_items():
            if bitems is None:  # rdd mode: items arrive as input rows
                for batch in iterator:
                    paths = batch.column("path").to_pylist()
                    rgs = batch.column("rg").to_pylist()
                    yield from zip(paths, rgs)
                return
            all_items = bitems.value
            for batch in iterator:
                for s in batch.column("id").to_pylist():
                    s = int(s)
                    # the same contiguous equal slicing parallelize uses
                    yield from all_items[
                        n_items * s // n_map : n_items * (s + 1) // n_map
                    ]

        def tables():
            for path, rg in slice_items():
                pf = _parquet_file(path)
                for g in _expand_row_groups(pf, rg):
                    yield _timestamps_to_us(pf.read_row_group(g, use_threads=False))

        def batches():
            # read-ahead thread: the NEXT row group's IO+decompress
            # (GIL-released pyarrow C++) overlaps the current chunk's
            # encode kernels; bounded queue caps the extra task memory
            for tbl in _prefetched(tables(), prefetch):
                yield from tbl.to_batches(max_chunksize=batch_rows)

        yield from _encode_stream(
            batches(), plan_local, done_local, key_col, payload_dir, chunk_rows, max_buf
        )

    if cfg.work_dist == "rdd":
        work = spark.createDataFrame(
            spark.sparkContext.parallelize(items, n_map), "path string, rg int"
        )
    else:
        work = spark.range(n_map, numPartitions=n_map)
    frags = work.mapInArrow(map_encode_files, FRAG_SCHEMA)
    return _finish_encode(spark, frags, plan, done, cfg)


def _finish_encode(spark, frags, plan: EncodePlan, done: np.ndarray, cfg: EncodeJobConfig) -> dict:
    """Shared tail of the encode job: append MANIFEST rows (tagged with
    this run's id) — a NARROW stage, and the encoded bytes themselves were
    already written to payload files by the map tasks, so the JVM never
    touches them — then derive per-unit lineage from the committed
    manifest and aggregate metrics.  See the module docstring for why this
    is crash-safe without unit consolidation."""
    from pyspark.sql import functions as F

    n_units = plan.n_units
    data_dir = manifest_dir(cfg.output_dir)
    t_stage = time.perf_counter()
    (
        frags.withColumn("run_id", F.lit(cfg.run_id))
        .write.mode("append")
        .parquet(data_dir)
    )
    stage_wall = time.perf_counter() - t_stage

    # per-unit lineage from the COMMITTED manifest, this run's rows only;
    # `native` (codec provenance — C fast path vs NumPy fallback per
    # worker) aggregates as min(): False if ANY fragment fell back, so a
    # heterogeneous cluster's mixed-path units are attributable.  Guarded:
    # manifest dirs predating the column read back without it.
    sink = spark.read.parquet(data_dir).drop("first_key")
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
        F.sum("wall_ms").alias("wall_ms"),
        F.count("*").alias("n_fragments"),
        F.first("codecs").alias("codecs"),
    ]
    if "native" in sink.columns:
        aggs.append(F.min("native").alias("native"))
    new_units = sink.where(F.col("run_id") == cfg.run_id).groupBy("unit").agg(*aggs)
    lineage = (
        new_units.withColumn("run_id", F.lit(cfg.run_id))
        .withColumn("status", F.lit("ok"))
        .withColumn("batch_tag", F.lit(cfg.batch_tag))
        .withColumn("committed_at", F.current_timestamp())
    )
    lineage.write.mode("append").parquet(os.path.join(cfg.output_dir, "lineage"))

    agg = (
        spark.read.parquet(os.path.join(cfg.output_dir, "lineage"))
        .where("status = 'ok'")
        .agg(
            F.countDistinct("unit").alias("units"),
            F.sum("n_rows").alias("rows"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
        )
        .collect()[0]
    )
    return {
        "run_id": cfg.run_id,
        "plan_units": n_units,
        "resumed_units": int(done.size),
        "encoded_units": int(agg.units),
        "rows": int(agg.rows or 0),
        "bytes_in": int(agg.bytes_in or 0),
        "bytes_out": int(agg.bytes_out or 0),
        "ratio": (int(agg.bytes_out or 0) / int(agg.bytes_in)) if agg.bytes_in else None,
        # wall of the read→assign→encode→sink action alone (excludes
        # planning and lineage bookkeeping, which are O(1) driver work)
        "encode_stage_sec": round(stage_wall, 3),
    }


_FILTER_OPS = (
    "<", "<=", ">", ">=", "=", "==", "!=", "<>", "in", "not_in",
    "is_null", "not_null", "startswith", "endswith", "contains",
)


def _filter_groups(filters) -> list[list[tuple]]:
    """Normalize ``filters`` to OR-of-AND groups (pyarrow's DNF
    convention): a flat list of ``(col, op, value)`` TUPLES is one
    conjunction; a list of LISTS is a disjunction of conjunctions.
    A tuple element is a term, a list element is a group — mixing the
    two shapes is ambiguous and raises."""
    kinds = {isinstance(f, list) for f in filters}
    if kinds == {True}:
        groups = filters
    elif kinds == {False}:
        groups = [filters]
    else:
        raise ValueError(
            "filters must be all (col, op, value) terms (AND) or all "
            "lists of terms (OR of ANDs), not a mix"
        )
    for g in groups:
        if not g:
            raise ValueError("empty AND-group in filters")
        for t in g:
            if not (isinstance(t, tuple) and len(t) == 3):
                raise ValueError(
                    f"filter term must be a (col, op, value) tuple: {t!r}"
                )
    return groups


def key_range_from_terms(terms, key_col: str) -> tuple[str | None, str | None]:
    """Tightest ``[lo, hi]`` (None = open) the KEY-column terms of ONE
    conjunction imply: ``>``/``>=``/``=`` contribute ``lo`` (strict
    bounds stay a superset — the residual filter is exact), ``<``/
    ``<=``/``=`` contribute ``hi``, ``startswith p`` contributes
    ``lo = p`` only (every match is ≥ its own prefix; a sound upper
    bound needs prefix-successor arithmetic the unit pruner doesn't
    require), and a string IN-list contributes its [min, max].
    Non-string operands never contribute (the key domain is string).
    Shared by the ``upe_encoded`` reader's pushFilters path and
    :func:`decode_dataset`'s filter-driven unit pruning."""
    lo = hi = None
    for col, op, v in terms:
        if col != key_col:
            continue
        if op == "in" and isinstance(v, (tuple, list)) and v and all(
            isinstance(x, str) for x in v
        ):
            vlo, vhi = min(v), max(v)
            lo = vlo if lo is None or vlo > lo else lo
            hi = vhi if hi is None or vhi < hi else hi
            continue
        if not isinstance(v, str):
            continue
        if op in (">", ">=", "=", "=="):
            lo = v if lo is None or v > lo else lo
        if op in ("<", "<=", "=", "=="):
            hi = v if hi is None or v < hi else hi
        if op == "startswith":
            lo = v if lo is None or v > lo else lo
    return lo, hi


_JSON_PATH_SAFE = None  # compiled lazily (module import stays light)


def _exact_col(name: str):
    """Column reference resolving the EXACT name — backtick-quoted so a
    dotted name ("meta.lang") is never parsed as a struct path."""
    from pyspark.sql import functions as F

    return F.col("`" + name.replace("`", "``") + "`")


def _json_path_safe(name: str) -> bool:
    """True when ``name`` survives a ``get_json_object`` path segment
    verbatim (``$.<name>`` / ``$._nc.<name>``).  Dots, brackets,
    quotes, or other punctuation would be parsed as path STRUCTURE — a
    failed lookup must never be mistaken for recorded data."""
    global _JSON_PATH_SAFE
    if _JSON_PATH_SAFE is None:
        import re

        _JSON_PATH_SAFE = re.compile(r"^[A-Za-z0-9_]+$")
    return bool(_JSON_PATH_SAFE.match(name))


def _zone_bound_type(ftype: pa.DataType):
    """(spark cast type, value converter) for comparing a filter value
    against this column's recorded zone-map bounds: timestamps/dates
    become exact epoch ints, decimals re-type both sides to the column's
    own decimal (bounds are stored as exact strings — unscaled ints can
    overflow int64 at precision 38), ints/floats cast so comparisons
    stay in the right domain, strings compare lexicographically."""
    if pa.types.is_integer(ftype):
        return "long", lambda v: v
    if pa.types.is_floating(ftype):
        return "double", lambda v: v
    if pa.types.is_timestamp(ftype):
        return "long", ts_value_us
    if pa.types.is_date(ftype):
        return "long", date_value_days
    if pa.types.is_decimal(ftype):
        from decimal import Decimal

        return f"decimal({ftype.precision},{ftype.scale})", lambda v: Decimal(str(v))
    return None, lambda v: v


def _dv_array_col(c: str, ftype: pa.DataType, cast_to: str | None):
    """Spark Column parsing the stats ``_dv.<c>`` JSON array into the
    column's zone-map domain for ``array_contains`` membership, or None
    when this type records no distinct sets (floats).  Stored domains:
    ints for integer/timestamp/date (parse as array<bigint>), exact
    strings for decimal (parse as array<string>, transform-cast to the
    column's own decimal so '1.50' == 1.5), raw strings otherwise."""
    from pyspark.sql import functions as F

    if pa.types.is_floating(ftype):
        return None
    if pa.types.is_decimal(ftype):
        return F.expr(
            f"transform(from_json(get_json_object(stats, '$._dv.{c}'), "
            f"'array<string>'), x -> cast(x AS {cast_to}))"
        )
    if cast_to == "long":
        return F.from_json(
            F.get_json_object(F.col("stats"), f"$._dv.{c}"), "array<bigint>"
        )
    return F.from_json(
        F.get_json_object(F.col("stats"), f"$._dv.{c}"), "array<string>"
    )


def unit_id_ranges(units) -> list[tuple[int, int]]:
    """Collapse a unit-id list into inclusive contiguous ``(lo, hi)``
    ranges.  :func:`..plans.partitioning.units_for_key_range` returns a
    contiguous id span by construction (units are ordered by key range),
    so this is almost always ONE range — the point is that the pruning
    predicate stays O(ranges) literals, not O(units): at 10^12 docs /
    64 MB units an ``isin`` over ~10^6 ids would be a multi-megabyte
    expression tree Catalyst re-evaluates per manifest row."""
    ranges: list[list[int]] = []
    for u in sorted(set(int(x) for x in units)):
        if ranges and u == ranges[-1][1] + 1:
            ranges[-1][1] = u
        else:
            ranges.append([u, u])
    return [(a, b) for a, b in ranges]


def _units_condition(units):
    """Manifest-row predicate for a unit-id set, as OR-of-BETWEEN over
    the collapsed contiguous ranges (false literal for an empty set)."""
    from functools import reduce

    from pyspark.sql import functions as F

    ranges = unit_id_ranges(units)
    if not ranges:
        return F.lit(False)
    return reduce(
        lambda a, b: a | b,
        [F.col("unit").between(lo, hi) for lo, hi in ranges],
    )


def _union_probe_schema(payload_dir: str, probes: list[tuple[str, int]]) -> pa.Schema:
    """Union-by-name Arrow schema over one META-ONLY probe per distinct
    column-name set (container header + JSON, no payload decoded) — the
    engine's schema-evolution resolution, Iceberg-style: appends may ADD
    columns (older chunks null-pad on decode) or omit columns (newer
    rows null-pad), but a column present in two chunk generations must
    agree on type — a conflict is a loud error, never a silent cast.
    The base is the widest probe (stable tie-break on the name tuple);
    remaining fields append in that deterministic iteration order, so
    the union schema is identical across runs and partitionings."""
    from .container import read_chunk_schema

    schemas = []
    for fname, off in probes:
        fh = _open_payload(payload_dir, fname)
        try:
            fh.seek(off)
            schemas.append(read_chunk_schema(fh))
        finally:
            fh.close()
    schemas.sort(key=lambda s: (-len(s.names), tuple(s.names)))
    fields = list(schemas[0])
    seen = {f.name: _ddl_type(f.type) for f in fields}
    for s in schemas[1:]:
        for f in s:
            d = _ddl_type(f.type)
            if f.name in seen:
                if seen[f.name] != d:
                    raise ValueError(
                        f"schema conflict for column {f.name!r} across chunk "
                        f"generations: {seen[f.name]} vs {d}"
                    )
            else:
                fields.append(f)
                seen[f.name] = d
    return pa.schema(fields)


def _probe_rows(manifest_df) -> list:
    """One ``(file, offset)`` probe row per DISTINCT column-name set in a
    committed-manifest DataFrame, derived from the manifest's own codecs
    maps — probe count tracks schema GENERATIONS, never row count, and
    no payload byte is read to find them."""
    from pyspark.sql import functions as F

    return (
        manifest_df.groupBy(
            F.to_json(
                F.sort_array(F.map_keys(F.from_json(F.col("codecs"), "map<string,string>")))
            ).alias("_ns")
        )
        .agg(F.first("file").alias("file"), F.first("offset").alias("offset"))
        .collect()
    )


def _pad_table(tbl: pa.Table, fields: list) -> pa.Table:
    """Conform a decoded chunk to the union schema's requested fields:
    present columns pass through (decode order already matches), absent
    ones become typed all-null columns — rows written before a column
    existed read back as null, the Iceberg add-column semantics.  Shared
    columns are type-CHECKED (by normalized DDL, so large/small string
    and timestamp-unit differences stay benign): a type flip between
    chunk generations with identical column-name sets is invisible to
    the union probe (one probe per name set), so this per-chunk check is
    where it surfaces — a loud schema-conflict error, never a silent
    cast."""
    names = tbl.schema.names
    for f in fields:
        if f.name in names:
            have = _ddl_type(tbl.schema.field(f.name).type)
            want = _ddl_type(f.type)
            if have != want:
                raise ValueError(
                    f"schema conflict for column {f.name!r} across chunk "
                    f"generations: {have} vs {want}"
                )
    if names == [f.name for f in fields]:
        return tbl
    cols = []
    for f in fields:
        if f.name in names:
            cols.append(tbl.column(f.name))
        else:
            cols.append(pa.chunked_array([pa.nulls(tbl.num_rows, f.type)]))
    return pa.table(cols, names=[f.name for f in fields])


def decode_dataset(
    spark,
    output_dir: str,
    columns: list[str] | None = None,
    key_range: tuple[str | None, str | None] | None = None,
    filters: list[tuple[str, str, object]] | None = None,
    pruning_evidence: dict | None = None,
):
    """Read the encoded dataset back as a DataFrame of original rows.

    Only fragments whose (unit, run_id) is recorded ok in lineage are
    read: orphans from a run that crashed between the data commit and the
    lineage commit are silently skipped (their units were re-encoded by
    the resuming run).

    ``key_range=(lo, hi)`` (inclusive, None = unbounded) prunes the scan
    to the encode units whose range boundaries can contain such keys
    (:func:`..plans.partitioning.units_for_key_range`) — pruned units'
    payload bytes are never read, the engine's partition-pruning analog
    — then applies the exact full-precision filter on the decoded key
    column.  With ``columns``, the key column must be included (the
    residual filter needs it).

    ``filters=[(col, op, value), ...]`` (op in ``< <= > >= = == != <>
    in not_in is_null not_null startswith endswith contains``, terms
    AND-ed; ``endswith``/``contains`` (string columns) have no order
    relation to bounds and prune through the exact distinct-value sets
    only, mirroring the reader's ``StringEndsWith``/``StringContains``
    pushdown; ``in`` /
    ``not_in`` take a non-empty tuple/list; ``in`` prunes when no
    listed value fits the bounds; ``!=``/``not_in`` prune only through
    the distinct-value sets — a chunk whose recorded (exact, non-null)
    value set is a SUBSET of the rejected values matches nothing —
    plus the all-null rejection every comparison gets, because bounds
    can never prove inequality; ``startswith`` (string columns) prunes when no value in
    [min, max] can carry the prefix — the url-prefix scan shape —
    and on distinct-value-set membership when recorded;
    ``is_null``/``not_null`` ignore the value and prune on the recorded
    per-chunk null counts — an all-null chunk, including one whose
    generation predates the column under additive evolution, is also
    skipped for every null-rejecting comparison term) prunes CHUNKS by
    the per-chunk min/max zone maps the encoder
    records in the manifest (:func:`_chunk_stats` — the parquet
    row-group-statistics analog, orthogonal to key_range's unit
    pruning): a chunk whose recorded bounds cannot satisfy a term is
    skipped before any payload byte is read, a null/absent bound never
    prunes, and the exact predicate is re-applied to the decoded rows.
    Filter columns must be included in ``columns`` when both are given;
    datasets encoded before zone maps existed decode fine (no stats
    column → no pruning).

    Disjunctions use pyarrow's DNF shape: a list of LISTS of terms is
    an OR of AND-groups (``[[("lang", "=", "de")], [("lang", "=",
    "fr")]]``; the flat list stays one conjunction).  A chunk is
    pruned only when EVERY group's recorded stats disqualify it — a
    group containing any unprunable term keeps all chunks,
    conservatively disabling pruning for the whole disjunction — and
    the exact OR-of-AND predicate is re-applied to decoded rows.  The
    out-of-range-key scan (``key < a OR key >= b``) and the
    multi-category scan are the intended shapes.

    Terms on the PLAN's key column additionally prune whole encode
    UNITS (each group's implied key range via
    :func:`key_range_from_terms`, unioned across the disjunction) —
    the same layer an explicit ``key_range`` drives, fired before any
    chunk statistics are consulted; with ``pruning_evidence`` the
    unit-level counts ship as ``units_total``/``units_qualifying``.

    Schema evolution (additive): appends may add or omit columns — the
    output schema is the union-by-name over all chunk generations
    (meta-only probes), and generations that predate a column read back
    as nulls; a column whose TYPE differs between generations raises a
    schema-conflict error rather than casting silently."""
    from pyspark.sql import functions as F

    payload_dir = os.path.join(output_dir, "payload")
    enc, has_stats = _committed_manifest_df(spark, output_dir)
    # committed-but-unpruned view, captured BEFORE any key-range unit
    # filter: the schema probe must (a) survive a range that prunes every
    # unit (typed empty result) and (b) never land on an orphan manifest
    # row — after vacuum(rewrite_manifest=False), the documented
    # object-store mode, orphan rows outlive their deleted payload files
    # and a raw-manifest probe would raise FileNotFoundError
    enc_committed = enc
    key_col = None
    if key_range is not None:
        from ..plans.partitioning import units_for_key_range

        plan = _load_plan(output_dir)
        if plan is None:
            raise ValueError(f"no plan.json under {output_dir} for key-range pruning")
        key_col = plan.key_col
        if columns is not None and key_col not in columns:
            raise ValueError(
                f"key_range pruning needs the key column '{key_col}' in columns"
            )
        units = units_for_key_range(plan, key_range[0], key_range[1])
        enc = enc.where(_units_condition(units))

    # filter-driven UNIT pruning: terms on the plan's key column imply a
    # key range per DNF group; the union of each group's qualifying
    # units is a conservative superset of where matches can live (the
    # same algebra as the upe_encoded reader's pushFilters path),
    # applied before any chunk statistics are consulted.  A group whose
    # key terms leave both bounds open keeps every unit, disabling this
    # layer for the whole disjunction; datasets without a plan skip it.
    fgroups = _filter_groups(filters) if filters else []
    if fgroups:
        fplan = _load_plan(output_dir)
        if fplan is not None:
            from ..plans.partitioning import units_for_key_range

            funits: set | None = set()
            for g in fgroups:
                f_lo, f_hi = key_range_from_terms(g, fplan.key_col)
                if f_lo is None and f_hi is None:
                    funits = None
                    break
                funits.update(units_for_key_range(fplan, f_lo, f_hi))
            if funits is not None:
                if pruning_evidence is not None:
                    pruning_evidence["units_total"] = int(sum(fplan.salts))
                    pruning_evidence["units_qualifying"] = len(funits)
                enc = enc.where(_units_condition(sorted(funits)))

    # one meta-only probe per distinct column-name set (derived from the
    # manifest's own codecs maps — no payload read), unioned by name:
    # schema evolution means different chunk generations may carry
    # different column sets, and a single-chunk probe would miss columns
    probe_rows = _probe_rows(enc_committed)
    if not probe_rows:
        raise ValueError("empty encoded dataset")
    probe = _union_probe_schema(payload_dir, [(r.file, r.offset) for r in probe_rows])
    if columns:
        missing = [c for c in columns if c not in probe.names]
        if missing:
            raise ValueError(f"columns not in dataset: {missing}")
    out_schema = _arrow_to_ddl(probe, columns)
    want_fields = [probe.field(c) for c in columns] if columns else list(probe)

    if filters:
        for c, op, _v in (t for g in fgroups for t in g):
            if op not in _FILTER_OPS:
                raise ValueError(f"unsupported filter op {op!r} (use one of {_FILTER_OPS})")
            if op in ("in", "not_in") and not _v:
                raise ValueError(f"empty {op.upper()}-list for filter column {c!r}")
            if c not in probe.names:
                raise ValueError(f"filter column {c!r} not in dataset schema")
            if op in ("startswith", "endswith", "contains") and not (
                isinstance(_v, str)
                and (
                    pa.types.is_string(probe.field(c).type)
                    or pa.types.is_large_string(probe.field(c).type)
                )
            ):
                raise ValueError(
                    f"{op} needs a string value on a string column ({c!r})"
                )
            if columns is not None and c not in columns:
                raise ValueError(f"filters need column {c!r} in columns (residual filter)")
        if has_stats:
            # zone-map chunk pruning: keep a chunk unless its recorded
            # bounds PROVE the term can't match; null/absent bounds keep.
            # Bounds are typed from the probed schema so integer
            # comparisons stay exact (no double round-trip past 2^53).
            ncj = F.get_json_object(F.col("stats"), "$._nc")
            n_total = F.get_json_object(F.col("stats"), "$._n").cast("long")
            has_nc = ncj.isNotNull() & n_total.isNotNull()

            def _term_keep(c, op, v):
                if not _json_path_safe(c):
                    # a dotted/bracketed name breaks the get_json_object
                    # path and a failed _nc lookup would read as
                    # all-null and WRONGLY prune — skip manifest pruning
                    # for this column (the exact residual still applies)
                    return None
                # null-count pruning (the parquet null-count analog):
                # a column absent from a recorded _nc map is all-null in
                # that chunk — including generations that PREDATE the
                # column under additive evolution
                nc = F.get_json_object(F.col("stats"), f"$._nc.{c}").cast("long")
                not_all_null = (~has_nc) | (nc.isNotNull() & (nc < n_total))
                if op in ("is_null", "not_null"):
                    if op == "is_null":
                        term = (~has_nc) | nc.isNull() | (nc > F.lit(0))
                    else:
                        term = not_all_null
                    return F.col("stats").isNull() | term
                cast_to, conv = _zone_bound_type(probe.field(c).type)
                vs = [conv(x) for x in v] if op in ("in", "not_in") else [conv(v)]
                mn = F.get_json_object(F.col("stats"), f"$.{c}[0]")
                mx = F.get_json_object(F.col("stats"), f"$.{c}[1]")
                if cast_to:
                    mn, mx = mn.cast(cast_to), mx.cast(cast_to)
                if op == "startswith":
                    # every match is >= the prefix itself, and the min's
                    # length-prefix can't exceed it (the same algebra as
                    # the DataSource reader's _chunk_keep)
                    lit = F.lit(vs[0])
                    term = (mx.isNull() | (mx >= lit)) & (
                        mn.isNull() | (F.substring(mn, 1, len(vs[0])) <= lit)
                    )
                    dv_arr = _dv_array_col(c, probe.field(c).type, cast_to)
                    if dv_arr is not None:
                        member = F.exists(dv_arr, lambda x: x.startswith(vs[0]))
                        dvj = F.get_json_object(F.col("stats"), f"$._dv.{c}")
                        term = term & (dvj.isNull() | member)
                elif op in ("endswith", "contains"):
                    # no order relation to [min, max] — membership in
                    # the exact distinct-value set is the only pruner
                    # (plus the shared all-null rejection below)
                    term = F.lit(True)
                    dv_arr = _dv_array_col(c, probe.field(c).type, cast_to)
                    if dv_arr is not None:
                        if op == "endswith":
                            member = F.exists(dv_arr, lambda x: x.endswith(vs[0]))
                        else:
                            member = F.exists(dv_arr, lambda x: x.contains(vs[0]))
                        dvj = F.get_json_object(F.col("stats"), f"$._dv.{c}")
                        term = term & (dvj.isNull() | member)
                elif op in (">", ">="):
                    lit = F.lit(vs[0])
                    cmpc = mx > lit if op == ">" else mx >= lit
                    term = mx.isNull() | cmpc
                elif op in ("<", "<="):
                    lit = F.lit(vs[0])
                    cmpc = mn < lit if op == "<" else mn <= lit
                    term = mn.isNull() | cmpc
                elif op in ("!=", "<>", "not_in"):
                    # bounds can never prove inequality (the mn==mx==v
                    # constant chunk records dv={v} anyway), so prune
                    # purely on the distinct-value set: the chunk matches
                    # nothing when every recorded non-null value is
                    # rejected.  Absent set → keep; all-null rejection
                    # comes from the shared null-rejecting tail below.
                    term = F.lit(True)
                    dv_arr = _dv_array_col(c, probe.field(c).type, cast_to)
                    if dv_arr is not None:
                        # factory, not default-args: F.exists introspects
                        # the lambda's arity and passes one Column per
                        # PARAMETER, so extra params would become lambda
                        # variables
                        def _make_survives(_vs, _cast):
                            def _survives(e):
                                t = None
                                for x in _vs:
                                    litx = F.lit(x)
                                    if _cast and _cast.startswith("decimal"):
                                        litx = litx.cast(_cast)
                                    cmpx = e != litx
                                    t = cmpx if t is None else (t & cmpx)
                                return t

                            return _survives

                        dvj = F.get_json_object(F.col("stats"), f"$._dv.{c}")
                        term = dvj.isNull() | F.exists(
                            dv_arr, _make_survives(vs, cast_to)
                        )
                else:  # = / == / in: any listed value inside [mn, mx]
                    term = None
                    for x in vs:
                        lit = F.lit(x)
                        t = (mn.isNull() | (mn <= lit)) & (mx.isNull() | (mx >= lit))
                        term = t if term is None else (term | t)
                    # distinct-value set: when the chunk recorded its
                    # exact values (≤ _STATS_DV_MAX), equality prunes on
                    # MEMBERSHIP — the interleaved-categorical case
                    # bounds can never exclude.  Absent set → keep.
                    dv_arr = _dv_array_col(c, probe.field(c).type, cast_to)
                    if dv_arr is not None:
                        member = None
                        for x in vs:
                            litx = F.lit(x)
                            if cast_to and cast_to.startswith("decimal"):
                                litx = litx.cast(cast_to)
                            m = F.array_contains(dv_arr, litx)
                            member = m if member is None else (member | m)
                        dvj = F.get_json_object(F.col("stats"), f"$._dv.{c}")
                        term = term & (dvj.isNull() | member)
                # comparison/equality terms are null-rejecting: an
                # all-null chunk (evolution: column-predating chunks
                # included) can never satisfy them
                term = term & not_all_null
                return F.col("stats").isNull() | term

            # OR-of-AND composition (pyarrow DNF): a chunk survives when
            # ANY group's prunable terms all keep it.  A group with no
            # prunable term keeps every chunk, which conservatively
            # disables pruning for the whole disjunction.
            any_prunable = False
            keep = None
            for g in fgroups:
                gk = None
                for c, op, v in g:
                    t = _term_keep(c, op, v)
                    if t is not None:
                        any_prunable = True
                        gk = t if gk is None else (gk & t)
                gk = F.lit(True) if gk is None else gk
                keep = gk if keep is None else (keep | gk)
            if any_prunable:
                if pruning_evidence is not None:
                    # opt-in pruning audit (two tiny manifest-only jobs):
                    # chunk rows qualifying before/after the zone-map
                    # keep — the EXPLAIN analog for a filtered decode
                    pruning_evidence["total"] = enc.count()
                enc = enc.where(keep)
                if pruning_evidence is not None:
                    pruning_evidence["qualifying"] = enc.count()

    def decode(iterator):
        # several manifest rows (unit-slices) share one chunk; the input
        # is sorted by (file, offset) within the partition, so a
        # one-chunk cache deserializes each chunk exactly once
        handles: dict[str, object] = {}
        cur_key = None
        cur_tbl = None
        try:
            for batch in iterator:
                cols = [batch.column(i).to_pylist() for i in range(5)]
                for fname, off, ln, roff, nr in zip(*cols):
                    if (fname, off) != cur_key:
                        fh = handles.get(fname)
                        if fh is None:
                            fh = handles[fname] = _open_payload(payload_dir, fname)
                        fh.seek(off)
                        # column pruning happens INSIDE the container:
                        # excluded columns' buffers are skipped, never
                        # decompressed; columns a chunk generation
                        # predates are null-padded from the union schema
                        cur_tbl = _pad_table(
                            deserialize_chunk(fh.read(ln), columns, missing_ok=True),
                            want_fields,
                        )
                        cur_key = (fname, off)
                    for b in cur_tbl.slice(roff, nr).to_batches():
                        if b.num_rows:
                            yield _normalize_batch(b)
        finally:
            for fh in handles.values():
                fh.close()

    # the manifest is tiny (hundreds of rows in small files), so the scan
    # coalesces to ~1 partition; spread chunk workloads across the
    # cluster, keeping all slices of a chunk together (hash by chunk id)
    # so the one-chunk cache still gets a hit per slice
    par = spark.sparkContext.defaultParallelism
    out = (
        enc.select("file", "offset", "length", "row_off", "n_rows")
        .repartition(par, "file", "offset")
        .sortWithinPartitions("file", "offset", "row_off")
        .mapInArrow(decode, out_schema)
    )
    if key_range is not None:
        # exact residual on the full-precision key (unit pruning is a
        # conservative prefix-range superset)
        lo, hi = key_range
        if lo is not None:
            out = out.where(_exact_col(key_col) >= lo)
        if hi is not None:
            out = out.where(_exact_col(key_col) <= hi)
    if filters:
        # exact residual for every term (chunk pruning is conservative;
        # _exact_col keeps a dotted name from parsing as a struct path),
        # AND-ed within a group, OR-ed across groups
        def _term_expr(c, op, v):
            col = _exact_col(c)
            if op == "in":
                return col.isin(*v)
            if op == "not_in":
                # SQL NOT IN: null rows never match (same as the chunk
                # pruner's null-rejecting algebra)
                return ~col.isin(*v)
            if op in ("!=", "<>"):
                return col != v
            if op == "is_null":
                return col.isNull()
            if op == "not_null":
                return col.isNotNull()
            if op == "startswith":
                return col.startswith(v)
            if op == "endswith":
                return col.endswith(v)
            if op == "contains":
                return col.contains(v)
            return {
                "<": col < v, "<=": col <= v, ">": col > v, ">=": col >= v
            }.get(op, col == v)

        cond = None
        for g in fgroups:
            gc = None
            for c, op, v in g:
                e = _term_expr(c, op, v)
                gc = e if gc is None else (gc & e)
            cond = gc if cond is None else (cond | gc)
        out = out.where(cond)
    return out


def _committed_manifest_df(spark, output_dir: str):
    """``(enc, has_stats)`` — the committed manifest view shared by
    :func:`decode_dataset` and :func:`dataset_column_stats`: manifest
    fragment rows semi-joined to lineage ``status='ok'`` on
    ``(unit, run_id)``, so orphans from a run that crashed between its
    data and lineage commits are invisible to every reader."""
    from pyspark.sql import functions as F

    raw = spark.read.parquet(manifest_dir(output_dir))
    has_stats = "stats" in raw.columns
    sel = ["unit", "run_id", "file", "offset", "length", "row_off", "n_rows", "codecs"]
    if has_stats:
        sel.append("stats")
    committed = (
        spark.read.parquet(os.path.join(output_dir, "lineage"))
        .where("status = 'ok'")
        .select("unit", "run_id")
    )
    enc = raw.select(*sel).join(F.broadcast(committed), ["unit", "run_id"], "left_semi")
    return enc, has_stats


def dataset_column_stats(spark, output_dir: str, columns: list[str] | None = None):
    """Per-column statistics answered from manifest METADATA — the
    ``MIN/MAX(col)`` diagnostic shape (the reference's only aggregate
    diagnostic is ``MIN/MAX(order_date)``,
    /root/reference/examples/advanced_integration_example.py:168-169)
    without scanning or decoding a single payload chunk: one Spark
    aggregation over the committed manifest plus the usual meta-only
    schema probe (chunk header bytes, never chunk payload).

    Returns a DataFrame ``(column, min, max, min_exact, max_exact,
    null_count, row_count)``:

    - ``row_count`` — exact always (sum of committed slice rows);
    - ``null_count`` — exact when every chunk records null counts
      (``_nc``), else NULL (pre-null-count data);
    - ``min``/``max`` — rendered in the zone-map domain as strings
      (epoch-µs ints for timestamps, epoch-day ints for dates, exact
      decimal strings), aggregated in the column's own typed domain
      (never lexicographic for numerics);
    - ``min_exact``/``max_exact`` — True when every chunk either
      records that bound or is provably all-null for the column (SQL
      MIN/MAX ignore nulls, so all-null chunks cannot move the answer),
      and, for strings, no recorded minimum sits at the truncation cap
      (a capped minimum may be a truncated prefix — a valid lower
      bound, not the exact minimum).  Long-string columns and
      NaN-bearing float chunks record no bounds, so they surface as
      inexact rather than wrong.

    Two further never-wrong guards: a chunk whose committed slices
    cover FEWER rows than its recorded ``_n`` (compaction can supersede
    a subset of a multi-unit chunk) poisons exactness for every column
    — its whole-chunk statistics describe dead rows too — and a column
    whose name would break the ``get_json_object`` path (dots,
    brackets) reports unknown bounds/counts instead of misreading a
    failed lookup as data.
    """
    from pyspark.sql import functions as F

    enc, has_stats = _committed_manifest_df(spark, output_dir)
    if not has_stats:
        raise ValueError(f"dataset at {output_dir} predates zone-map statistics")
    probe_rows = _probe_rows(enc)
    if not probe_rows:
        raise ValueError("empty encoded dataset")
    probe = _union_probe_schema(
        os.path.join(output_dir, "payload"), [(r.file, r.offset) for r in probe_rows]
    )
    cols = list(columns) if columns else [f.name for f in probe]
    missing = [c for c in cols if c not in probe.names]
    if missing:
        raise ValueError(f"columns not in dataset: {missing}")

    n_rows_total = enc.agg(F.sum("n_rows")).collect()[0][0]
    # slices of one chunk share its stats: dedupe to chunks first,
    # keeping the LIVE row coverage per chunk — compaction can supersede
    # a subset of a multi-unit chunk's slices, after which the chunk's
    # whole-chunk _n/_nc/bounds describe MORE rows than are committed
    # through it, so a partially-covered chunk poisons exactness
    chunks = enc.groupBy("file", "offset").agg(
        F.first("stats").alias("stats"), F.sum("n_rows").alias("covered")
    )
    n_total = F.get_json_object(F.col("stats"), "$._n").cast("long")
    ncmap = F.get_json_object(F.col("stats"), "$._nc")
    partial = n_total.isNull() | (F.col("covered") < n_total)
    aggs = [F.sum(partial.cast("long")).alias("\x1fpartial")]
    safe_cols = [c for c in cols if _json_path_safe(c)]
    for c in safe_cols:
        ftype = probe.field(c).type
        cast_to, _ = _zone_bound_type(ftype)
        is_str = cast_to is None
        mnj = F.get_json_object(F.col("stats"), f"$.{c}[0]")
        mxj = F.get_json_object(F.col("stats"), f"$.{c}[1]")
        mn = mnj.cast(cast_to) if cast_to else mnj
        mx = mxj.cast(cast_to) if cast_to else mxj
        ncj = F.get_json_object(F.col("stats"), f"$._nc.{c}").cast("long")
        # recorded-null-count per chunk: absent key under a recorded map
        # means the column is absent from the chunk (all-null under
        # additive evolution); no map at all means unknown
        nc_eff = F.when(
            ncmap.isNull() | n_total.isNull(), F.lit(None).cast("long")
        ).otherwise(F.coalesce(ncj, n_total))
        all_null = (
            ncmap.isNotNull()
            & n_total.isNotNull()
            & (ncj.isNull() | (ncj >= n_total))
        )
        aggs += [
            F.min(mn).cast("string").alias(f"{c}\x1fmn"),
            F.max(mx).cast("string").alias(f"{c}\x1fmx"),
            F.sum((mn.isNull() & ~all_null).cast("long")).alias(f"{c}\x1fmiss_mn"),
            F.sum((mx.isNull() & ~all_null).cast("long")).alias(f"{c}\x1fmiss_mx"),
            F.sum(nc_eff).alias(f"{c}\x1fnc"),
            F.sum(nc_eff.isNull().cast("long")).alias(f"{c}\x1fnc_unknown"),
            F.max((F.length(mnj) >= _STATS_STR_MAX).cast("long")).alias(f"{c}\x1fat_cap")
            if is_str
            else F.max(F.lit(0)).alias(f"{c}\x1fat_cap"),
        ]
    row = chunks.agg(*aggs).collect()[0].asDict()
    any_partial = bool(row["\x1fpartial"])

    out_rows = []
    for c in cols:
        if c not in safe_cols:
            # a dotted/bracketed name breaks the get_json_object path —
            # surface unknown, never fabricated-exact
            out_rows.append((c, None, None, False, False, None, n_rows_total))
            continue
        g = lambda k: row[f"{c}\x1f{k}"]
        min_exact = g("miss_mn") == 0 and not (g("at_cap") or 0) and not any_partial
        max_exact = g("miss_mx") == 0 and not any_partial
        null_count = (
            None
            if (g("nc_unknown") or any_partial)
            else (g("nc") if g("nc") is not None else 0)
        )
        out_rows.append((c, g("mn"), g("mx"), min_exact, max_exact, null_count, n_rows_total))
    return spark.createDataFrame(
        out_rows,
        "column string, min string, max string, min_exact boolean, "
        "max_exact boolean, null_count long, row_count long",
    )


def q_stats_agg(spark, sf_dir: str):
    """Driver-contract query: metadata-only MIN/MAX/COUNT — the
    reference's ``MIN/MAX(order_date)`` diagnostic answered from the
    manifest without decoding any payload chunk
    (:func:`dataset_column_stats`).  The value hash certifies the
    metadata-derived numbers EQUAL the oracle's full-scan aggregate;
    the query raises unless the engine reports them exact."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_stat_")
    df = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("doc_key", F.lpad(F.col("doc_id").cast("string"), 8, "0"))
        .select("doc_key", "doc_id", "lang", "n_chars")
    )
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_key", size_cols=("doc_key",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    encode_job(spark, df, cfg)
    st = dataset_column_stats(spark, out, columns=["n_chars"]).collect()[0]
    if not (st.min_exact and st.max_exact and st.null_count is not None):
        raise RuntimeError(f"metadata stats not exact: {st}")
    return spark.createDataFrame(
        [(int(st.min), int(st.max), int(st.null_count), int(st.row_count))],
        "mn long, mx long, nulls long, n_rows long",
    )


def _timestamps_to_us(tbl: pa.Table) -> pa.Table:
    """Spark's INT96 parquet timestamps read back as ns; Spark's Arrow
    boundary only accepts µs (Spark timestamp semantics).  Lossless here —
    the source values are µs-precision."""
    fields = [
        pa.field(f.name, pa.timestamp("us", f.type.tz), f.nullable)
        if pa.types.is_timestamp(f.type) and f.type.unit != "us"
        else f
        for f in tbl.schema
    ]
    target = pa.schema(fields)
    return tbl.cast(target) if target != tbl.schema else tbl


def _ddl_type(t: pa.DataType) -> str:
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date32(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"array<{_ddl_type(t.value_type)}>"
    raise TypeError(f"unsupported type {t}")


def _arrow_to_ddl(schema: pa.Schema, columns: list[str] | None) -> str:
    def q(name: str) -> str:
        # backtick-quote so dotted names parse as one identifier
        return "`" + name.replace("`", "``") + "`"

    if columns:
        # requested order — must match deserialize_chunk's pruned order
        return ", ".join(f"{q(c)} {_ddl_type(schema.field(c).type)}" for c in columns)
    return ", ".join(f"{q(f.name)} {_ddl_type(f.type)}" for f in schema)


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
        elif pa.types.is_large_list(f.type) or pa.types.is_fixed_size_list(f.type):
            col = col.cast(pa.list_(f.type.value_type))
        elif pa.types.is_timestamp(f.type) and (f.type.unit, f.type.tz) != ("us", "UTC"):
            # one convention regardless of fragment provenance: µs UTC.
            # Naive inputs are UTC instants (Spark internal micros), and a
            # naive->aware cast attaches the zone without changing values.
            col = col.cast(pa.timestamp("us", "UTC"))
        cols.append(col)
        fields.append(pa.field(f.name, col.type, f.nullable))
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def q_encode_roundtrip(spark, sf_dir: str):
    """Driver-contract query: run the REAL encode engine over the
    documents table and decode it back — the oracle is a plain ``SELECT``
    from the source, so the driver's value-hash check asserts the
    engine's bit-identical round trip on independent data, not just our
    own fixtures (north-rule invariant; reference round-trip pattern
    /root/reference/tests/test_parquet_writer.py:38-58)."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_rt_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=4 << 20
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    dec = decode_dataset(spark, out)
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source", "n_chars"
    )


def q_encode_roundtrip_pruned(spark, sf_dir: str):
    """Driver-contract query: encode the documents table, then decode
    ONLY (doc_id, lang) — the container skips the text column's buffers
    by their recorded lengths without decompressing them
    (:func:`..container.deserialize_chunk`).  The oracle is a plain
    two-column SELECT, so the driver's value hash certifies that pruned
    decode is exact, not just non-crashing."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_rtq_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=4 << 20
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    dec = decode_dataset(spark, out, columns=["doc_id", "lang"])
    return dec.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


def q_decode_key_range(spark, sf_dir: str):
    """Driver-contract query: encode the documents table keyed by
    doc_id-as-string, then decode only the key range ['1', '3'] — the
    plan's range boundaries prune whole encode units before any payload
    byte is read, and the residual filter makes the result exact (string
    comparison semantics, mirrored by the oracle's VARCHAR predicate).
    The query raises if the plan had multiple units but pruning skipped
    none, so the driver's green row certifies the pruning path runs, not
    just the filter."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_krq_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=64 << 10
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    from ..plans.partitioning import units_for_key_range

    plan = _load_plan(out)
    pruned = units_for_key_range(plan, "1", "3")
    if plan.n_units > 1 and len(pruned) >= plan.n_units:
        raise RuntimeError(
            f"key-range pruning kept all {plan.n_units} units — pruning path not exercised"
        )
    dec = decode_dataset(spark, out, key_range=("1", "3"))
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )


def q_decode_key_range_open(spark, sf_dir: str):
    """Driver-contract query: open-ended key-range decode — ``['5', None)``
    prunes every unit strictly below bucket('5') and leaves the upper end
    unbounded, the common "resume the scan from key K" shape.  Same
    pruning-exercised guard as :func:`q_decode_key_range`; the oracle is
    the equivalent VARCHAR ``>=`` predicate."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_kro_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=64 << 10
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    from ..plans.partitioning import units_for_key_range

    plan = _load_plan(out)
    pruned = units_for_key_range(plan, "5", None)
    if plan.n_units > 1 and len(pruned) >= plan.n_units:
        raise RuntimeError(
            f"open key-range pruning kept all {plan.n_units} units — pruning path not exercised"
        )
    dec = decode_dataset(spark, out, key_range=("5", None))
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )


def q_decode_filters(spark, sf_dir: str):
    """Driver-contract query: zone-map filtered decode — a string bound
    on the key column (doc_id >= '5', which prunes chunks: keys are
    range-clustered into units) AND a numeric bound on n_chars (which
    exercises typed residual filtering).  The query raises unless the
    stats actually pruned manifest rows, so a green row certifies the
    pruning path ran, not just the residual.  Oracle: the equivalent
    VARCHAR + integer predicates."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_zmq_")
    # small chunk_rows: each task's chunks then cover CONTIGUOUS unit
    # sub-ranges (the stream flushes units in sorted order), so a key
    # bound inside the range genuinely prunes chunks even at sf0.001
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    # pruning evidence as ONE aggregation row — never a full-manifest
    # collect (a null max bound qualifies: unbounded never prunes)
    mx = F.get_json_object(F.col("stats"), "$.doc_id[1]")
    ev = (
        spark.read.parquet(os.path.join(out, "data"))
        .agg(
            F.count("*").alias("total"),
            F.sum((mx.isNull() | (mx >= "5")).cast("long")).alias("qualifying"),
        )
        .collect()[0]
    )
    if ev.total > 1 and ev.qualifying >= ev.total:
        raise RuntimeError(
            f"zone maps pruned nothing ({ev.qualifying}/{ev.total} chunks qualify)"
        )
    dec = decode_dataset(
        spark, out, filters=[("doc_id", ">=", "5"), ("n_chars", ">=", 200)]
    )
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )


def q_decode_filters_dv(spark, sf_dir: str):
    """Driver-contract query: DISTINCT-VALUE-SET equality pruning — an
    IN term on the interleaved categorical ``lang`` column mixing a
    present value with one ('eo') that sits strictly INSIDE every
    chunk's [min, max] lang bounds but occurs in no row.  Bounds can
    never exclude it; only the recorded exact value sets can, so the
    query raises unless the sets pruned the absent value's membership in
    some chunk — then returns the present value's rows for the oracle's
    value hash (exactness: pruning must not lose a single 'de' row
    sharing chunks with the pruned check).  Oracle: plain IN predicate."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_dvq_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    # evidence as ONE aggregation row: no chunk's recorded set holds 'eo'
    dvj = F.get_json_object(F.col("stats"), "$._dv.lang")
    member = F.array_contains(F.from_json(dvj, "array<string>"), F.lit("eo"))
    ev = (
        spark.read.parquet(os.path.join(out, "data"))
        .agg(
            F.count("*").alias("total"),
            F.sum((dvj.isNull() | member).cast("long")).alias("qualifying"),
        )
        .collect()[0]
    )
    if ev.total > 1 and ev.qualifying >= ev.total:
        raise RuntimeError(
            f"distinct-value sets pruned nothing ({ev.qualifying}/{ev.total})"
        )
    dec = decode_dataset(spark, out, filters=[("lang", "in", ["de", "eo"])])
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )


def q_decode_filters_ne(spark, sf_dir: str):
    """Driver-contract query: INEQUALITY pruning through the exact
    distinct-value sets — ``cat != 'en'`` over a categorical that is
    constant 'en' on key-contiguous runs (the boilerplate-language-strip
    shape: drop the dominant language).  Bounds can never prove
    inequality, so the all-'en' chunks (recorded set exactly ``['en']``)
    are the ONLY prunable evidence; the query raises unless some chunk
    was disqualified, then returns the surviving rows for the oracle's
    value hash (exactness: mixed chunks must survive and re-filter to
    the row).  Oracle: the same ``<>`` predicate as plain SQL."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_neq_")
    df = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("doc_key", F.lpad(F.col("doc_id").cast("string"), 8, "0"))
        .withColumn(
            "cat",
            F.when(F.col("doc_id") % 500 < 250, F.lit("en")).otherwise(F.col("lang")),
        )
        .select("doc_key", "doc_id", "cat", "n_chars")
    )
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_key", size_cols=("cat",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    encode_job(spark, df, cfg)
    # evidence as ONE aggregation row: some chunk's recorded value set
    # holds nothing but the rejected 'en' — disqualified for != 'en'
    dvj = F.get_json_object(F.col("stats"), "$._dv.cat")
    survivor = F.exists(
        F.from_json(dvj, "array<string>"), lambda x: x != F.lit("en")
    )
    ev = (
        spark.read.parquet(os.path.join(out, "data"))
        .agg(
            F.count("*").alias("total"),
            F.sum((dvj.isNull() | survivor).cast("long")).alias("qualifying"),
        )
        .collect()[0]
    )
    if ev.total > 1 and ev.qualifying >= ev.total:
        raise RuntimeError(
            f"inequality pruned nothing ({ev.qualifying}/{ev.total})"
        )
    dec = decode_dataset(spark, out, filters=[("cat", "!=", "en")])
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "cat", "n_chars"
    )


def q_encode_roundtrip_clustered(spark, sf_dir: str):
    """Driver-contract query: WRITE-TIME CLUSTERING
    (``EncodeJobConfig.cluster_by`` — the Iceberg SortOrder analog the
    reference's arbitrary-cursor-order export lacks).  The documents
    table arrives lang-interleaved (every chunk of a plain write holds
    most languages); clustering by (lang, n_chars) range-repartitions +
    sorts before encode so chunks collapse to single-language distinct
    sets, and the decode's ``lang = 'de'`` equality PRUNES chunk payload
    — the query raises unless ``pruning_evidence`` proves it did.
    Oracle: the same equality as plain SQL; the value hash certifies the
    clustered write reorders rows WITHOUT losing or altering one (the
    north-rule bit-identity, under a permutation)."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_clusq_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",),
        target_unit_bytes=64 << 10, chunk_rows=64, map_tasks=8,
        cluster_by=("lang", "n_chars"),
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    ev: dict = {}
    dec = decode_dataset(
        spark, out, filters=[("lang", "=", "de")], pruning_evidence=ev
    )
    if ev["total"] > 1 and ev["qualifying"] >= ev["total"]:
        raise RuntimeError(
            f"clustered write pruned nothing ({ev['qualifying']}/{ev['total']})"
        )
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "n_chars"
    )


def q_decode_filters_null(spark, sf_dir: str):
    """Driver-contract query: NULL-COUNT pruning — ``IS NOT NULL`` on a
    column that is null on a key-contiguous half of the table (nulls
    clustered by the zero-padded key, so whole chunks are all-null —
    min/max bounds say nothing about nulls, only the recorded per-chunk
    null counts can disqualify).  The query raises unless the counts
    actually pruned chunks, then returns the non-null rows for the
    oracle's value hash (exactness: chunks MIXING null and non-null rows
    must survive pruning and re-filter exactly).  Oracle: the same
    predicate as plain SQL."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_ncq_")
    df = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("doc_key", F.lpad(F.col("doc_id").cast("string"), 8, "0"))
        .withColumn(
            "opt_lang",
            F.when(F.col("doc_id") % 500 < 250, F.lit(None)).otherwise(F.col("lang")),
        )
        .select("doc_key", "doc_id", "opt_lang", "n_chars")
    )
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_key", size_cols=("opt_lang",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    encode_job(spark, df, cfg)
    # evidence as ONE aggregation row: some chunk is all-null in
    # opt_lang (nc == _n), i.e. disqualified for IS NOT NULL
    nc = F.get_json_object(F.col("stats"), "$._nc.opt_lang").cast("long")
    n_total = F.get_json_object(F.col("stats"), "$._n").cast("long")
    survives = nc.isNotNull() & (nc < n_total)
    ev = (
        spark.read.parquet(os.path.join(out, "data"))
        .agg(
            F.count("*").alias("total"),
            F.sum(survives.cast("long")).alias("qualifying"),
        )
        .collect()[0]
    )
    if ev.total > 1 and ev.qualifying >= ev.total:
        raise RuntimeError(
            f"null counts pruned nothing ({ev.qualifying}/{ev.total})"
        )
    dec = decode_dataset(spark, out, filters=[("opt_lang", "not_null", None)])
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "opt_lang", "n_chars"
    )


def q_decode_filters_prefix(spark, sf_dir: str):
    """Driver-contract query: STRING-PREFIX pruning — ``startswith`` on
    the zero-padded key column (the url-prefix scan shape over a
    url-keyed Common-Crawl table: keys are clustered, so narrow
    per-chunk [min, max] key bounds disqualify every chunk outside the
    prefix's range).  Raises unless the bounds actually pruned chunks,
    then returns the matching rows for the oracle's value hash.
    Oracle: the equivalent integer BETWEEN."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_pfx_")
    df = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("doc_key", F.lpad(F.col("doc_id").cast("string"), 8, "0"))
        .select("doc_key", "doc_id", "lang", "n_chars")
    )
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_key", size_cols=("doc_key",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    encode_job(spark, df, cfg)
    # evidence as ONE aggregation row: most chunks' key bounds exclude
    # the prefix '0000012' (doc_ids 120-129)
    mn = F.get_json_object(F.col("stats"), "$.doc_key[0]")
    mx = F.get_json_object(F.col("stats"), "$.doc_key[1]")
    pfx = F.lit("0000012")
    survives = (
        (mx.isNull() | (mx >= pfx))
        & (mn.isNull() | (F.substring(mn, 1, 7) <= pfx))
    )
    ev = (
        spark.read.parquet(os.path.join(out, "data"))
        .agg(
            F.count("*").alias("total"),
            F.sum(survives.cast("long")).alias("qualifying"),
        )
        .collect()[0]
    )
    if ev.total > 1 and ev.qualifying >= ev.total:
        raise RuntimeError(
            f"prefix bounds pruned nothing ({ev.qualifying}/{ev.total})"
        )
    dec = decode_dataset(spark, out, filters=[("doc_key", "startswith", "0000012")])
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )


def q_decode_filters_or(spark, sf_dir: str):
    """Driver-contract query: DISJUNCTIVE (DNF) filtered decode — the
    out-of-range scan ``key < a OR key >= b`` over a key-clustered
    dataset.  Filters in pyarrow's list-of-lists shape are OR-ed across
    groups; a chunk survives when ANY group's bounds keep it, so the
    chunks covering the middle of the key range are skipped before any
    payload byte.  Raises unless that pruning actually fired; the
    oracle is the plain OR predicate, so a green row certifies both
    halves of the union arrive exactly once (no loss, no duplication
    across groups)."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_dnf_")
    df = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("doc_key", F.lpad(F.col("doc_id").cast("string"), 8, "0"))
        .select("doc_key", "doc_id", "lang", "n_chars")
    )
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_key", size_cols=("doc_key",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    encode_job(spark, df, cfg)
    ev: dict = {}
    dec = decode_dataset(
        spark,
        out,
        filters=[[("doc_key", "<", "00000100")], [("doc_key", ">=", "00000400")]],
        pruning_evidence=ev,
    )
    if ev["total"] > 1 and ev["qualifying"] >= ev["total"]:
        raise RuntimeError(
            f"disjunctive bounds pruned nothing ({ev['qualifying']}/{ev['total']})"
        )
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )


def q_decode_filters_ts(spark, sf_dir: str):
    """Driver-contract query: TIMESTAMP zone-map pruning — the canonical
    Common-Crawl range filter (``warc_ts``-shaped; SURVEY §1.2, and the
    reference's only range diagnostic is ``MIN/MAX(order_date)``,
    /root/reference/examples/advanced_integration_example.py:168-169).
    The events table is keyed by zero-padded event_id (corr ≈ 1 with
    ``ts``), so chunks carry narrow epoch-µs ts bounds; the query raises
    unless the bounds actually disqualify chunks, certifying the
    timestamp pruning path ran — not just the exact residual.  Oracle:
    the same half-month window as plain SQL."""
    import tempfile
    from datetime import datetime

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_zts_")
    df = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .withColumn("event_key", F.lpad(F.col("event_id").cast("string"), 10, "0"))
    )
    cfg = EncodeJobConfig(
        output_dir=out, key_col="event_key", size_cols=("props",),
        target_unit_bytes=64 << 10, chunk_rows=128,
    )
    encode_job(spark, df, cfg)
    lo = datetime(2024, 1, 8)
    hi = datetime(2024, 1, 15)
    # pruning evidence as ONE aggregation row (no manifest collect):
    # a chunk survives iff its recorded [min,max] epoch-µs window can
    # intersect [lo, hi]; null bounds keep (unbounded never prunes)
    mn = F.get_json_object(F.col("stats"), "$.ts[0]").cast("long")
    mx = F.get_json_object(F.col("stats"), "$.ts[1]").cast("long")
    qual = (mx.isNull() | (mx >= ts_value_us(lo))) & (mn.isNull() | (mn <= ts_value_us(hi)))
    ev = (
        spark.read.parquet(manifest_dir(out))
        .agg(F.count("*").alias("total"), F.sum(qual.cast("long")).alias("qualifying"))
        .collect()[0]
    )
    if ev.total > 1 and ev.qualifying >= ev.total:
        raise RuntimeError(
            f"timestamp zone maps pruned nothing ({ev.qualifying}/{ev.total} chunks qualify)"
        )
    dec = decode_dataset(spark, out, filters=[("ts", ">=", lo), ("ts", "<=", hi)])
    # µs epoch ints: identical across engines regardless of how each
    # stringifies timestamps (same convention as events_agg); doubles
    # rounded to 2dp like every other raw-double query column
    return dec.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_type",
        F.round(F.col("value"), 2).alias("value"),
    )


def q_encode_roundtrip_embeddings(spark, sf_dir: str):
    """Driver-contract query: round-trip the ``embeddings`` table —
    ``array<float>`` vectors plus int ids — through the REAL engine,
    then explode each vector to (vec_id, label, pos, val) scalars so the
    driver's value-hash compares every element positionally (nested
    arrays don't sort/hash portably across engines).  Certifies that
    list columns survive the codec layer bit-identically — the payload
    an LLM-data engine stores most after text."""
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="upes_rte_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="vec_id", size_cols=(), target_unit_bytes=1 << 20
    )
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).withColumn(
        "vec_id", F.col("vec_id").cast("string")
    )
    encode_job(spark, df, cfg)
    dec = decode_dataset(spark, out)
    return dec.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    )

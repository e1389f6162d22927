"""Spark Python DataSource (``upe_encoded``) over the engine's containers.

Makes an encoded dataset a FIRST-CLASS Spark format instead of a
function-call API — the integration surface the reference exposes
through pandas ``to_parquet`` files (``/root/reference/src/export/
parquet_writer.py:17``), re-expressed as Spark's own source/sink
protocol (pyspark 4.1 ``pyspark.sql.datasource``):

    from universal_parquet_exporter_spark.sources.spark_datasource import register
    register(spark)                       # also enables Python filter pushdown

    spark.read.format("upe_encoded").load(out_dir)          # full scan
    spark.read.format("upe_encoded").option("columns", "url,lang") \
         .load(out_dir).where("url >= 'https://h'")         # pruned scan

    df.write.format("upe_encoded").option("key_col", "url") \
      .mode("append").save(out_dir)                          # encode sink

    stream.writeStream.format("upe_encoded").option("key_col", "url") \
      .option("checkpointLocation", ck).start(out_dir)       # streaming sink

    spark.readStream.format("upe_encoded").load(out_dir)      # streaming READ:
        # tail the dataset's commits as micro-batches (offset = cursor in
        # the (committed_at, run_id) total order — see _EncodedStreamReader)

What Catalyst's v2 pushdown buys here, mechanically:

- **Filter pushdown** (``DataSourceReader.pushFilters``): predicates from
  any ``.where``/SQL reach the reader BEFORE planning.  Key-column
  predicates prune whole encode units via the persisted plan's range
  boundaries (:func:`..plans.partitioning.units_for_key_range`), and
  every stats-covered column prunes chunks via the manifest zone maps —
  both BEFORE a single payload byte is read.  Pruning is conservative
  (bounds are supersets), so ALL filters are returned to Spark for the
  exact residual — the same contract parquet row-group statistics have.
- **Partition planning**: committed manifest rows (lineage semi-join, so
  orphans from torn runs are invisible — identical to
  :func:`..encode.pipeline.decode_dataset`) are grouped per chunk and
  packed into ~``partition_target_bytes`` scan partitions by payload
  locality.  Planning reads ONLY metadata (manifest + lineage parquet,
  plan.json) with pyarrow — it runs in Spark's planning worker where no
  SparkSession exists, exactly like a JVM DSv2 ``ScanBuilder``.
- **Write commit protocol** (``DataSourceArrowWriter``): tasks encode
  their Arrow batches with the engine's own stream
  (:func:`..encode.pipeline._encode_stream` — codec auto-selection,
  bounded buffering, payload files written straight to storage) and
  return their manifest rows as the task's ``WriterCommitMessage``; only
  the driver's ``commit()`` appends manifest + lineage.  A failed or
  speculative task leaves at most an uncommitted payload file — dead
  bytes that ``vacuum`` sweeps — so the sink inherits the engine's
  exactly-once-at-job-granularity story through Spark's OWN commit
  protocol instead of beside it.  ``mode("overwrite")`` is ATOMIC: the
  new manifest is written to a fresh ``data_v<N>`` directory and the
  ``manifest_current`` pointer swaps last (Iceberg version-hint
  pattern); readers see the old or the new dataset, never a mix.
- **Streaming sink** (``DataSourceStreamArrowWriter``): each micro-batch
  commits under a ``ds_epoch_<batchId>`` lineage tag with a
  batch-unique run id; a replayed epoch (failure between sink commit
  and checkpoint write) is detected by its already-committed tag and
  skipped — exactly-once at batch granularity, the same guarantee the
  ``foreachBatch`` path (:mod:`...streaming.jobs`) provides, now native.

Writes require the dataset plan (``plan.json``) to exist — create it
with :func:`..encode.pipeline.load_or_build_plan` (or any prior
``encode_job``) first, the create-table-then-append model: unit
identity must be global and deterministic, and a per-task writer cannot
sample the whole input.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)

from ..encode.container import deserialize_chunk
from ..encode.pipeline import (
    _arrow_to_ddl,
    _ddl_type,
    _encode_stream,
    _load_plan,
    _normalize_batch,
    _open_payload,
    _pad_table,
    _payload_fs,
    _union_probe_schema,
    date_value_days,
    key_range_from_terms,
    manifest_dir,
    next_manifest_name as _next_manifest_name,
    set_manifest_dir,
    ts_value_us,
)
from ..plans.partitioning import EncodePlan, units_for_key_range

FORMAT_NAME = "upe_encoded"
_PUSHDOWN_CONF = "spark.sql.python.filterPushdown.enabled"


def register(spark, enable_filter_pushdown: bool = True) -> None:
    """Register the ``upe_encoded`` format on a session.  Python-source
    filter pushdown is OFF by default in Spark and a reader implementing
    ``pushFilters`` hard-fails without it, so this also flips the conf
    (runtime-settable; verified on 4.1.2)."""
    if enable_filter_pushdown:
        spark.conf.set(_PUSHDOWN_CONF, "true")
    spark.dataSource.register(EncodedContainerDataSource)


# ---------------------------------------------------------------------------
# driver/planning-side metadata access (pyarrow only — no SparkSession)
# ---------------------------------------------------------------------------


def _read_meta_table(path: str, columns: list[str]) -> pa.Table | None:
    """A Spark-written parquet directory as one Arrow table (``_SUCCESS``
    markers ignored by pyarrow.dataset's default ``ignore_prefixes``);
    None when the directory doesn't exist yet."""
    import pyarrow.dataset as pads

    try:
        dset = pads.dataset(path, format="parquet")
    except (FileNotFoundError, OSError):
        return None
    names = [c for c in columns if c in dset.schema.names]
    return dset.to_table(columns=names)


def _meta_state_token(output_dir: str) -> tuple | None:
    """Cheap freshness token for the planning-side manifest cache: the
    (mtime_ns, size-ish) of the manifest dir, lineage dir, and version
    pointer.  Any committed write touches at least one of them (new
    parquet file → directory mtime on POSIX; pointer swap → file mtime).
    Remote (non-POSIX) paths return None — never cached."""
    if "://" in output_dir:
        return None
    parts = []
    for p in (
        manifest_dir(output_dir),
        os.path.join(output_dir, "lineage"),
        os.path.join(output_dir, "manifest_current"),
    ):
        try:
            st = os.stat(p)
            parts.append((p, st.st_mtime_ns, st.st_size))
        except OSError:
            parts.append((p, None, None))
    return tuple(parts)


_MANIFEST_CACHE: dict[str, tuple[tuple, pa.Table]] = {}


def _committed_manifest(output_dir: str) -> pa.Table:
    """Committed manifest rows (the lineage ``status='ok'`` semi-join on
    ``(unit, run_id)``) — the planning-side twin of
    :func:`..encode.pipeline.decode_dataset`'s ``enc`` DataFrame.  At
    nominal scale this is manifest METADATA (fragment rows, not data),
    but it is ~10^7 rows at 100 TB, so the join runs entirely in Arrow
    (hash semi-join in C++, zero per-row Python objects) and the result
    is cached per (path, dir-mtime token): ``schema()``, ``partitions()``
    and the append-schema guard share one load per plan instead of
    re-reading per call."""
    token = _meta_state_token(output_dir)
    if token is not None:
        hit = _MANIFEST_CACHE.get(output_dir)
        if hit is not None and hit[0] == token:
            return hit[1]
    man = _read_meta_table(
        manifest_dir(output_dir),
        ["unit", "run_id", "file", "offset", "length", "row_off", "n_rows", "stats", "codecs"],
    )
    lin = _read_meta_table(os.path.join(output_dir, "lineage"), ["unit", "run_id", "status"])
    if man is None or lin is None or man.num_rows == 0:
        out = pa.table(
            {
                "unit": pa.array([], pa.int64()),
                "run_id": pa.array([], pa.string()),
                "file": pa.array([], pa.string()),
                "offset": pa.array([], pa.int64()),
                "length": pa.array([], pa.int64()),
                "row_off": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "stats": pa.array([], pa.string()),
            }
        )
    else:
        import pyarrow.compute as pc

        ok = (
            lin.filter(pc.equal(lin.column("status"), "ok"))
            .select(["unit", "run_id"])
            .group_by(["unit", "run_id"])
            .aggregate([])  # distinct — join keys must be unique
        )
        out = man.join(ok, keys=["unit", "run_id"], join_type="left semi")
    if token is not None:
        # re-validate: a write racing this load invalidates via mtime
        if _meta_state_token(output_dir) == token:
            _MANIFEST_CACHE[output_dir] = (token, out)
            if len(_MANIFEST_CACHE) > 64:
                _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
    return out


def _probe_chunk_schema(output_dir: str, man: pa.Table) -> pa.Schema:
    """Union-by-name schema over committed chunks (orphan-safe — rows
    came through the lineage semi-join): one meta-only probe per
    distinct column-name set, the same evolution-aware resolution
    ``decode_dataset`` uses (column sets come from the manifest's own
    codecs maps; distinct codecs STRINGS are deduped before any JSON
    parse, so planning cost tracks codec diversity, not row count)."""
    if man.num_rows == 0:
        raise ValueError(f"empty encoded dataset at {output_dir}")
    payload_dir = os.path.join(output_dir, "payload")
    files = man.column("file").to_pylist()
    offsets = man.column("offset").to_pylist()
    codecs = man.column("codecs").to_pylist() if "codecs" in man.schema.names else [None] * man.num_rows
    by_ns: dict[tuple, tuple[str, int]] = {}
    seen_cj: set = set()
    for i, cj in enumerate(codecs):
        if cj in seen_cj:
            continue
        seen_cj.add(cj)
        ns = tuple(sorted(json.loads(cj).keys())) if cj else ("",)
        by_ns.setdefault(ns, (files[i], offsets[i]))
    return _union_probe_schema(payload_dir, sorted(by_ns.values()))


# ---------------------------------------------------------------------------
# filter → pruning terms
# ---------------------------------------------------------------------------

_CMP_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _terms_from_filters(filters) -> list[tuple[str, str, object]]:
    """Catalyst filters → conjunctive pruning terms ``(col, op, value)``.
    Unsupported shapes are simply absent (they still reach Spark's
    residual — we return every filter as unhandled)."""
    terms = []
    for f in filters:
        if isinstance(f, Not):
            # Catalyst pushes `col != v` as Not(EqualTo) and `NOT IN` as
            # Not(In); both prune through the distinct-value sets
            inner = f.child
            attr = getattr(inner, "attribute", None)
            if not (isinstance(attr, tuple) and len(attr) == 1):
                continue
            if isinstance(inner, EqualTo):
                terms.append((attr[0], "!=", inner.value))
            elif isinstance(inner, In):
                terms.append((attr[0], "not_in", tuple(inner.value)))
            continue
        attr = getattr(f, "attribute", None)
        if not (isinstance(attr, tuple) and len(attr) == 1):
            continue  # nested paths don't exist in chunk schemas
        col = attr[0]
        op = _CMP_OPS.get(type(f))
        if op is not None:
            terms.append((col, op, f.value))
        elif isinstance(f, In):
            terms.append((col, "in", tuple(f.value)))
        elif isinstance(f, StringStartsWith):
            terms.append((col, "startswith", f.value))
        elif isinstance(f, StringEndsWith):
            # no order relation to bounds — prunes via distinct-value
            # sets only (and the null-rejecting all-null rule)
            terms.append((col, "endswith", f.value))
        elif isinstance(f, StringContains):
            terms.append((col, "contains", f.value))
        elif isinstance(f, EqualNullSafe):
            # col <=> NULL is IS NULL; with a non-null operand it prunes
            # exactly like equality (null rows can't match a value)
            if f.value is None:
                terms.append((col, "is_null", None))
            else:
                terms.append((col, "=", f.value))
        elif isinstance(f, IsNull):
            terms.append((col, "is_null", None))
        elif isinstance(f, IsNotNull):
            # Catalyst pushes IsNotNull beside almost every comparison,
            # so all-null chunks (evolution: column-predating
            # generations) prune on any filtered scan
            terms.append((col, "not_null", None))
    return terms


def _key_range_from_terms(terms, key_col: str) -> tuple[str | None, str | None]:
    """One algebra for both scan paths: delegates to the engine's
    :func:`~..encode.pipeline.key_range_from_terms` (also used by
    ``decode_dataset``'s filter-driven unit pruning)."""
    return key_range_from_terms(terms, key_col)


def _normalize_terms(terms, schema: pa.Schema):
    """Convert term values to the zone-map domain ONCE per scan (not per
    chunk): timestamps → epoch-µs ints, dates → epoch-days ints,
    decimals → ``Decimal`` (their bounds are stored as exact strings and
    re-typed in :func:`_chunk_keep`).  Terms whose column is absent from
    the schema or whose value can't convert are dropped from PRUNING
    (Spark still applies them as the residual — conservative)."""
    from datetime import date, datetime
    from decimal import Decimal

    out = []
    for col, op, v in terms:
        if col not in schema.names:
            continue
        if op in ("is_null", "not_null"):
            # value-less terms skip the domain conversion entirely
            out.append((col, op, None))
            continue
        t = schema.field(col).type
        try:
            if pa.types.is_timestamp(t):
                if op in ("in", "not_in"):
                    v = tuple(ts_value_us(x) for x in v)
                elif isinstance(v, datetime):
                    v = ts_value_us(v)
                else:
                    continue
            elif pa.types.is_date(t):
                if op in ("in", "not_in"):
                    v = tuple(date_value_days(x) for x in v)
                elif isinstance(v, date):
                    v = date_value_days(v)
                else:
                    continue
            elif pa.types.is_decimal(t):
                if op in ("in", "not_in"):
                    v = tuple(Decimal(str(x)) for x in v)
                else:
                    v = Decimal(str(v))
        except (TypeError, ValueError, ArithmeticError):
            continue
        out.append((col, op, v))
    return out


def _chunk_keep(stats_json: str | None, terms, schema: pa.Schema) -> bool:
    """Zone-map verdict for ONE chunk: False only when the recorded
    bounds PROVE a term can't match (missing/partial bounds keep — the
    same conservative algebra as ``decode_dataset``'s SQL form, from
    which the driver's value-hash gate certifies the semantics).  Terms
    must be pre-normalized (:func:`_normalize_terms`); decimal bounds
    are stored as exact strings and re-typed here."""
    from decimal import Decimal

    if not stats_json:
        return True
    try:
        stats = json.loads(stats_json)
    except (TypeError, ValueError):
        return True
    dv_map = stats.get("_dv")
    if not isinstance(dv_map, dict):
        dv_map = {}
    nc_map = stats.get("_nc")
    n_total = stats.get("_n")
    have_nc = isinstance(nc_map, dict) and isinstance(n_total, int)
    for col, op, v in terms:
        # null-count pruning (the parquet null-count analog): a column
        # absent from a recorded _nc map is all-null in this chunk —
        # including chunks whose generation PREDATES the column under
        # additive evolution; comparison/equality/prefix terms are
        # null-rejecting, so all-null prunes those too
        if have_nc:
            nc = nc_map.get(col)
            all_null = not isinstance(nc, int) or nc >= n_total
            if op == "is_null":
                if isinstance(nc, int) and nc == 0:
                    return False
                continue
            if op == "not_null":
                if all_null:
                    return False
                continue
            if all_null:
                return False
        elif op in ("is_null", "not_null"):
            continue
        # exact distinct-value sets (≤ _STATS_DV_MAX values recorded):
        # equality/IN/prefix prune on MEMBERSHIP — the interleaved-
        # categorical case min/max bounds can never exclude
        dv = dv_map.get(col)
        if dv is not None and op in ("!=", "not_in"):
            # inequality prunes ONLY through the exact value set: the
            # chunk matches nothing when every recorded non-null value
            # is rejected (all-null rejection already returned above)
            rejected = v if op == "not_in" else (v,)
            if schema is not None and col in schema.names and pa.types.is_decimal(
                schema.field(col).type
            ):
                try:
                    dv = [Decimal(str(x)) for x in dv]
                except ArithmeticError:
                    dv = None
            try:
                if dv is not None and all(x in rejected for x in dv):
                    return False
            except TypeError:
                pass  # cross-type membership: never prune on it
            continue
        if dv is not None and op in ("=", "in", "startswith", "endswith", "contains"):
            if schema is not None and col in schema.names and pa.types.is_decimal(
                schema.field(col).type
            ):
                try:
                    dv = [Decimal(str(x)) for x in dv]
                except ArithmeticError:
                    dv = None
            try:
                if dv is None:
                    pass
                elif op == "=" and v not in dv:
                    return False
                elif op == "in" and not any(x in dv for x in v):
                    return False
                elif op == "startswith" and all(isinstance(x, str) for x in dv) and not any(
                    x.startswith(v) for x in dv
                ):
                    return False
                elif op == "endswith" and all(isinstance(x, str) for x in dv) and not any(
                    x.endswith(v) for x in dv
                ):
                    return False
                elif op == "contains" and all(isinstance(x, str) for x in dv) and not any(
                    v in x for x in dv
                ):
                    return False
            except TypeError:
                pass  # cross-type membership: never prune on it
        bounds = stats.get(col)
        if not isinstance(bounds, (list, tuple)) or len(bounds) != 2:
            continue
        mn, mx = bounds
        if schema is not None and col in schema.names and pa.types.is_decimal(schema.field(col).type):
            try:
                mn = None if mn is None else Decimal(str(mn))
                mx = None if mx is None else Decimal(str(mx))
            except ArithmeticError:
                continue
        try:
            if op in (">", ">="):
                if mx is not None and not (mx > v if op == ">" else mx >= v):
                    return False
            elif op in ("<", "<="):
                if mn is not None and not (mn < v if op == "<" else mn <= v):
                    return False
            elif op == "=":
                if (mn is not None and mn > v) or (mx is not None and mx < v):
                    return False
            elif op == "in":
                if mn is not None and mx is not None and not any(
                    mn <= x <= mx for x in v
                ):
                    return False
            elif op == "startswith":
                # all matches are >= v and share v's length-prefix
                if mx is not None and mx < v:
                    return False
                if mn is not None and isinstance(mn, str) and mn[: len(v)] > v:
                    return False
        except TypeError:
            continue  # cross-type comparison: never prune on it
    return True


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class _ChunkScanPartition(InputPartition):
    """One scan task: a locality-packed run of chunks.  ``chunks`` is
    ``[(file, offset, length, [(row_off, n_rows), ...]), ...]`` sorted by
    (file, offset) so the read loop deserializes each chunk once.
    ``fields`` are the output Arrow fields (union schema restricted to
    the requested columns) — chunks predating a column null-pad to it."""

    def __init__(self, payload_dir: str, columns: list[str] | None, chunks: list, fields: list):
        self.payload_dir = payload_dir
        self.columns = columns
        self.chunks = chunks
        self.fields = fields


class _EncodedReader(DataSourceReader):
    """Plain reader (no ``pushFilters`` method — Spark hard-fails a
    reader that declares one while the pushdown conf is off)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("upe_encoded requires a path: .load(<output_dir>)")
        cols = options.get("columns")
        self.columns = [c.strip() for c in cols.split(",") if c.strip()] if cols else None
        self.target_bytes = int(options.get("partition_target_bytes", 64 << 20))
        self._terms: list[tuple[str, str, object]] = []

    def partitions(self):
        man = _committed_manifest(self.path)
        payload_dir = os.path.join(self.path, "payload")
        if man.num_rows == 0:
            return [_ChunkScanPartition(payload_dir, self.columns, [], [])]
        probe_schema = _probe_chunk_schema(self.path, man)
        want_fields = (
            [probe_schema.field(c) for c in self.columns]
            if self.columns
            else list(probe_schema)
        )

        units = man.column("unit").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.ones(man.num_rows, dtype=bool)
        if self._terms:
            plan = _load_plan(self.path)
            if plan is not None:
                lo, hi = _key_range_from_terms(self._terms, plan.key_col)
                if lo is not None or hi is not None:
                    allowed = np.asarray(units_for_key_range(plan, lo, hi), dtype=np.int64)
                    keep &= np.isin(units, allowed)
                for col, op, v in self._terms:
                    # IN on the key: union of point ranges — the
                    # point-lookup-list pattern prunes to just the
                    # units that could hold any listed key
                    if col == plan.key_col and op == "in" and all(
                        isinstance(x, str) for x in v
                    ):
                        pts: set[int] = set()
                        for x in v:
                            pts.update(units_for_key_range(plan, x, x))
                        keep &= np.isin(units, np.asarray(sorted(pts), dtype=np.int64))

        if not keep.all():
            man = man.filter(pa.array(keep))
        norm_terms = _normalize_terms(self._terms, probe_schema) if self._terms else []
        return _pack_chunk_partitions(
            man, payload_dir, self.columns, want_fields,
            self.target_bytes, norm_terms, probe_schema,
        )

    def read(self, partition: _ChunkScanPartition):
        return _read_chunk_partition(partition)


def _pack_chunk_partitions(
    man: pa.Table,
    payload_dir: str,
    columns: list[str] | None,
    want_fields: list,
    target_bytes: int,
    norm_terms: list,
    probe_schema: pa.Schema,
) -> list[_ChunkScanPartition]:
    """Group manifest rows (unit-slices) by their chunk, VECTORIZED:
    the (file, offset, row_off) sort runs in Arrow C++, chunk boundaries
    come from one numpy change-point scan, and per-chunk metadata is
    gathered with ``take`` on the boundary indices — planning cost is
    O(rows) in C plus O(chunks) in Python, never O(rows) Python objects
    (at 100 TB the committed manifest is ~10^7 fragment rows).  The
    zone-map test runs once per CHUNK (slices of a chunk share its
    stats).  Shared by the batch reader and the stream reader — the
    stream plans the same way over the manifest rows of one offset
    range."""
    man = man.sort_by(
        [("file", "ascending"), ("offset", "ascending"), ("row_off", "ascending")]
    )
    offsets = man.column("offset").to_numpy(zero_copy_only=False)
    lengths = man.column("length").to_numpy(zero_copy_only=False)
    row_offs = man.column("row_off").to_numpy(zero_copy_only=False)
    n_rows_a = man.column("n_rows").to_numpy(zero_copy_only=False)
    fdict = man.column("file").combine_chunks().dictionary_encode()
    fcodes = fdict.indices.to_numpy(zero_copy_only=False)
    fnames = fdict.dictionary.to_pylist()
    if man.num_rows:
        change = np.flatnonzero(
            (fcodes[1:] != fcodes[:-1]) | (offsets[1:] != offsets[:-1])
        )
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [man.num_rows]))
    else:  # every chunk pruned
        starts = ends = np.array([], dtype=np.int64)
    if "stats" in man.schema.names:
        chunk_stats = man.column("stats").take(pa.array(starts)).to_pylist()
    else:
        chunk_stats = [None] * len(starts)

    ordered = []
    for i, (s, e) in enumerate(zip(starts, ends)):
        if norm_terms and not _chunk_keep(chunk_stats[i], norm_terms, probe_schema):
            continue
        slices = np.stack((row_offs[s:e], n_rows_a[s:e]), axis=1).tolist()
        ordered.append((fnames[fcodes[s]], int(offsets[s]), int(lengths[s]), slices))

    # pack chunk runs into ~target_bytes partitions, preserving file
    # locality (consecutive chunks of one payload file stay together)
    parts: list[_ChunkScanPartition] = []
    cur: list = []
    cur_bytes = 0
    for ch in ordered:
        cur.append(ch)
        cur_bytes += ch[2]
        if cur_bytes >= target_bytes:
            parts.append(_ChunkScanPartition(payload_dir, columns, cur, want_fields))
            cur, cur_bytes = [], 0
    if cur or not parts:
        parts.append(_ChunkScanPartition(payload_dir, columns, cur, want_fields))
    return parts


def _read_chunk_partition(partition: _ChunkScanPartition):
    """Executor-side scan of one packed chunk run (shared by the batch
    and stream readers): each chunk deserializes ONCE, its unit-slices
    yield as Arrow batches."""
    handles: dict[str, object] = {}
    try:
        for fname, off, length, slices in partition.chunks:
            fh = handles.get(fname)
            if fh is None:
                fh = handles[fname] = _open_payload(partition.payload_dir, fname)
            fh.seek(off)
            tbl = _pad_table(
                deserialize_chunk(fh.read(length), partition.columns, missing_ok=True),
                partition.fields,
            )
            for roff, nr in slices:
                for b in tbl.slice(roff, nr).to_batches():
                    if b.num_rows:
                        yield _normalize_batch(b)
    finally:
        for fh in handles.values():
            fh.close()


class _EncodedPushdownReader(_EncodedReader):
    def pushFilters(self, filters):
        """Record prunable terms; return EVERY filter (pruning is a
        conservative superset — zone maps and unit ranges — so Spark
        must keep the exact residual, the parquet-statistics contract)."""
        fl = list(filters)
        self._terms = _terms_from_filters(fl)
        return fl


# ---------------------------------------------------------------------------
# streaming read: tail an encoded dataset's commits as micro-batches
# ---------------------------------------------------------------------------


def _current_generation(path: str) -> str:
    """The dataset's live manifest-generation name (``data`` or
    ``data_v<N>`` after an atomic overwrite/vacuum pointer swap)."""
    return os.path.basename(manifest_dir(path).rstrip("/"))


def _committed_run_order(path: str) -> list[tuple[int, str]]:
    """Committed runs as a TOTAL ORDER ``(committed_at_µs, run_id)`` —
    the stream's cursor space.  ``committed_at`` is stamped once per
    commit (``F.current_timestamp()`` is query-constant; the DataSource
    sink stamps one ``datetime.now`` per commit), so a run collapses to
    one cursor point; ``run_id`` (uuid hex) breaks µs ties
    deterministically.  Runs predating the ``committed_at`` column sort
    at epoch 0 — an old dataset replays entirely in the first batch,
    ordered by run id, which is the only order its metadata can
    support."""
    import pyarrow.compute as pc

    lin = _read_meta_table(
        os.path.join(path, "lineage"), ["run_id", "status", "committed_at"]
    )
    if lin is None or lin.num_rows == 0:
        return []
    lin = lin.filter(pc.equal(lin.column("status"), "ok"))
    if "committed_at" in lin.schema.names:
        ts = pc.fill_null(lin.column("committed_at").cast(pa.int64()), 0)
        lin = lin.set_column(lin.schema.get_field_index("committed_at"), "committed_at", ts)
    else:
        lin = lin.append_column("committed_at", pa.array([0] * lin.num_rows, pa.int64()))
    runs = lin.group_by("run_id").aggregate([("committed_at", "max")])
    out = sorted(
        zip(
            runs.column("committed_at_max").to_pylist(),
            runs.column("run_id").to_pylist(),
        )
    )
    return [(int(t), r) for t, r in out]


class _EncodedStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("upe_encoded")`` — tail a dataset's
    COMMITS.  Completes the source matrix (batch read, batch sink,
    stream sink): an encoded dataset becomes a message-log-like input
    for downstream Structured Streaming jobs, the Delta/Iceberg
    streaming-table pattern re-expressed over this engine's
    manifest+lineage commit protocol.

    Offsets are ``{"gen", "ts", "run"}``: the manifest GENERATION the
    stream is pinned to plus the high-water cursor in the total order
    ``(committed_at_µs, run_id)`` over committed runs
    (:func:`_committed_run_order`).  A micro-batch is the half-open
    cursor interval ``(start, end]`` → the manifest fragments of exactly
    those runs, planned into locality-packed chunk partitions by the
    same vectorized planner the batch reader uses
    (:func:`_pack_chunk_partitions`).  Lineage is append-only within a
    generation, so a replayed ``(start, end]`` rebuilds byte-identical
    batches — exactly-once through Spark's own offset log, with no
    reader-side state.

    Determinism contract (documented, enforced where cheap): commits to
    a streamed dataset must come through this engine's commit paths
    (they stamp ``committed_at`` from one clock per commit).  A manifest
    REWRITE — ``mode("overwrite")``, compaction pointer swap — changes
    the generation and invalidates every outstanding cursor; rather
    than silently re-emitting rewritten history, ``partitions()`` fails
    loudly and the stream must restart from a fresh checkpoint (the
    Iceberg streaming-read rule).  ``initialOffset`` honors
    ``option("starting", "earliest"|"latest")`` — earliest (default)
    replays the dataset's full committed history as batch 0."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("upe_encoded requires a path: .load(<output_dir>)")
        cols = options.get("columns")
        self.columns = [c.strip() for c in cols.split(",") if c.strip()] if cols else None
        self.target_bytes = int(options.get("partition_target_bytes", 64 << 20))
        self.starting = options.get("starting", "earliest").lower()
        if self.starting not in ("earliest", "latest"):
            raise ValueError(f"starting must be earliest|latest, got {self.starting!r}")
        # admission control (the maxFilesPerTrigger analog): cap each
        # micro-batch at this many COMMITS.  The Python stream protocol
        # requests latestOffset BEFORE the initial/checkpoint cursor is
        # visible to the reader (measured: in every trigger mode,
        # including the availableNow single-batch fallback), so the
        # FIRST batch of each query run is necessarily uncapped —
        # capping blind would return an offset possibly BEHIND the
        # checkpoint, which regresses the offset log and re-emits data.
        # The cap therefore bounds STEADY-STATE admission: once the
        # cursor is known (initialOffset, a planned interval, or a
        # previous latestOffset), each further batch admits at most
        # max_runs commits (0 = unlimited).
        self.max_runs = int(options.get("max_runs_per_batch", 0))
        self._cursor: tuple[int, str] | None = None

    # -- offsets -------------------------------------------------------
    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return self.latestOffset()
        self._cursor = (-1, "")
        return {"gen": _current_generation(self.path), "ts": -1, "run": ""}

    def latestOffset(self) -> dict:
        gen = _current_generation(self.path)
        order = _committed_run_order(self.path)
        if not order:
            self._cursor = (-1, "")
            return {"gen": gen, "ts": -1, "run": ""}
        ts, run = order[-1]
        if self.max_runs > 0 and self._cursor is not None:
            pending = [x for x in order if x > self._cursor]
            if pending:
                ts, run = pending[min(self.max_runs, len(pending)) - 1]
            else:
                ts, run = self._cursor
        self._cursor = (ts, run)
        return {"gen": gen, "ts": ts, "run": run}

    # -- planning (driver) ----------------------------------------------
    def partitions(self, start: dict, end: dict):
        import pyarrow.compute as pc

        gen = _current_generation(self.path)
        for off in (start, end):
            if off.get("gen") != gen:
                raise ValueError(
                    f"encoded dataset {self.path} was rewritten (manifest "
                    f"generation {off.get('gen')!r} -> {gen!r}, e.g. by "
                    "mode('overwrite'), compaction, or vacuum's pointer "
                    "swap) while a stream was reading it; its offsets no "
                    "longer name the same data. Restart the stream with a "
                    "fresh checkpointLocation to re-baseline."
                )
        lo = (int(start.get("ts", -1)), start.get("run", ""))
        hi = (int(end.get("ts", -1)), end.get("run", ""))
        if self._cursor is None or hi > self._cursor:
            # restart replay: Spark re-plans the checkpointed interval
            # before asking for a new offset — seed the admission-control
            # cursor from it so the NEXT batch caps from the right place
            self._cursor = hi
        runs = [r for t, r in _committed_run_order(self.path) if lo < (t, r) <= hi]
        payload_dir = os.path.join(self.path, "payload")
        man = _committed_manifest(self.path)
        if man.num_rows == 0 or not runs:
            return [_ChunkScanPartition(payload_dir, self.columns, [], [])]
        # the OUTPUT schema is the full dataset's union (fixed at stream
        # start by Spark) — probe it from the whole manifest, then plan
        # scan partitions from this interval's fragments only
        probe_schema = _probe_chunk_schema(self.path, man)
        want_fields = (
            [probe_schema.field(c) for c in self.columns]
            if self.columns
            else list(probe_schema)
        )
        batch_man = man.filter(pc.is_in(man.column("run_id"), pa.array(runs, pa.string())))
        return _pack_chunk_partitions(
            batch_man, payload_dir, self.columns, want_fields,
            self.target_bytes, [], probe_schema,
        )

    # -- executor side ---------------------------------------------------
    def read(self, partition: _ChunkScanPartition):
        return _read_chunk_partition(partition)

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; nothing reader-side to GC
        pass


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------


_MANIFEST_PA_SCHEMA = pa.schema(
    [
        ("unit", pa.int64()),
        ("first_key", pa.string()),
        ("n_rows", pa.int64()),
        ("row_off", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("wall_ms", pa.float64()),
        ("codecs", pa.string()),
        ("file", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
        ("stats", pa.string()),
        ("native", pa.bool_()),
        ("run_id", pa.string()),
    ]
)

_LINEAGE_PA_SCHEMA = pa.schema(
    [
        ("unit", pa.int64()),
        ("n_rows", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("wall_ms", pa.float64()),
        ("n_fragments", pa.int64()),
        ("codecs", pa.string()),
        ("run_id", pa.string()),
        ("status", pa.string()),
        ("batch_tag", pa.string()),
        ("committed_at", pa.timestamp("us", "UTC")),
        ("native", pa.bool_()),
    ]
)


def _write_parquet_file(dir_path: str, name: str, tbl: pa.Table) -> None:
    """One parquet file into a metadata directory, atomically (temp name
    prefixed ``.`` — invisible to Spark/pyarrow listings — then rename)."""
    import pyarrow.parquet as pq

    fs, root = _payload_fs(dir_path)
    if fs is None:
        os.makedirs(root, exist_ok=True)
        tmp = os.path.join(root, f".tmp-{name}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(root, name))
    else:
        fs.create_dir(root, recursive=True)
        tmp = f"{root}/.tmp-{name}"
        with fs.open_output_stream(tmp) as out:
            pq.write_table(tbl, out)
        fs.move(tmp, f"{root}/{name}")


class _FragMessage(WriterCommitMessage):
    """One task's manifest rows (fragment bookkeeping, ~100 B/row — the
    payload bytes themselves went straight to storage)."""

    def __init__(self, rows: list[dict]):
        self.rows = rows


def _check_append_schema(output_dir: str, schema) -> None:
    """Additive schema evolution, type-stable: an append may ADD columns
    (older rows null-pad on decode) or OMIT columns (new rows null-pad),
    but a column shared with any existing chunk generation must keep its
    type — a silent type flip would poison the union probe for every
    future reader, so it fails here, at write planning time."""
    man = _committed_manifest(output_dir)
    if man.num_rows == 0:
        return
    union = _probe_chunk_schema(output_dir, man)
    for f in schema.fields:
        if f.name not in union.names:
            continue
        have = _ddl_type(union.field(f.name).type)
        got = f.dataType.simpleString().replace("bigint", "long")
        if got != have:
            raise ValueError(
                f"type conflict appending column {f.name!r}: dataset has "
                f"{have}, append writes {got} (schema evolution is additive "
                "only — cast upstream or use a new column name)"
            )


class _EncodedWriterBase:
    """Shared executor-side encode + driver-side commit bookkeeping."""

    def __init__(self, options, schema):
        schema_names = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("upe_encoded requires a path: .save(<output_dir>)")
        self.key_col = options.get("key_col", "url")
        if self.key_col not in schema_names:
            raise ValueError(
                f"key_col {self.key_col!r} not in the written schema {schema_names}; "
                "set .option('key_col', <column>)"
            )
        plan = _load_plan(self.path)
        if plan is None:
            raise ValueError(
                f"no plan.json under {self.path}: encoded datasets are "
                "created-then-appended (unit identity must be global). "
                "Initialize once with load_or_build_plan(df, EncodeJobConfig"
                f"(output_dir={self.path!r}, key_col={self.key_col!r})) or a "
                "prior encode_job."
            )
        self.plan_json = plan.to_json()
        if plan.key_col != self.key_col:
            raise ValueError(
                f"dataset plan partitions on {plan.key_col!r}, not {self.key_col!r}"
            )
        self.chunk_rows = int(options.get("chunk_rows", 32768))
        self.max_buffer_bytes = int(options.get("max_buffer_bytes", 256 << 20))
        # .option("cluster_by", "col1,col2"): the sink-side half of
        # write-time clustering (EncodeJobConfig.cluster_by).  A Spark
        # DataSource writer cannot repartition its own input, so the
        # caller pre-clusters (df.repartitionByRange(...).sortWithin
        # Partitions(...)) and this option keeps that order INSIDE every
        # unit slice instead of re-sorting by key — chunk zone maps on
        # the cluster columns stay narrow either way (they follow the
        # flush wave), this preserves the RLE/FOR run structure too.
        cb = options.get("cluster_by", "")
        self.cluster_cols = tuple(c for c in cb.split(",") if c)
        missing = [c for c in self.cluster_cols if c not in schema_names]
        if missing:
            raise ValueError(f"cluster_by columns not in the written schema: {missing}")
        self.run_id = uuid.uuid4().hex[:12]

    # -- executor side ------------------------------------------------
    def write(self, iterator):
        plan_local = EncodePlan.from_json(self.plan_json)
        out = list(
            _encode_stream(
                iterator,
                plan_local,
                np.array([], dtype=np.int64),
                self.key_col,
                os.path.join(self.path, "payload"),
                self.chunk_rows,
                self.max_buffer_bytes,
                cluster_cols=self.cluster_cols,
            )
        )
        return _FragMessage(out[0].to_pylist() if out else [])

    # -- commit side (Spark's Python planning worker: pyarrow only) -----
    def _commit_rows(self, rows: list[dict], data_dir: str, run_id: str, batch_tag: str = "") -> None:
        """The engine's two-step commit, from pre-collected manifest rows:
        append ONE manifest parquet file (tagged with this commit's run
        id), then the lineage file that makes its rows visible — derived
        here from the same in-hand rows (``_finish_encode`` re-reads the
        manifest because its rows never leave the cluster; a commit
        message's rows are already local).  Spark's commit hook runs in
        the Python planning worker where no SparkSession exists, so both
        files are written with pyarrow — plain int64/double/utf8/µs-UTC
        columns that Spark reads interchangeably with its own files —
        via the temp-write + rename idiom (a concurrent reader never
        sees a torn footer)."""
        from datetime import datetime, timezone

        tagged = [{**r, "run_id": run_id} for r in rows]
        man_tbl = pa.Table.from_pylist(tagged, schema=_MANIFEST_PA_SCHEMA)
        _write_parquet_file(data_dir, f"part-ds-{run_id}-manifest.parquet", man_tbl)

        per_unit: dict[int, dict] = {}
        for r in rows:
            u = per_unit.setdefault(
                r["unit"],
                {"unit": r["unit"], "n_rows": 0, "bytes_in": 0, "bytes_out": 0,
                 "wall_ms": 0.0, "n_fragments": 0, "codecs": r["codecs"],
                 "native": True},
            )
            u["n_rows"] += r["n_rows"]
            u["bytes_in"] += r["bytes_in"]
            u["bytes_out"] += r["bytes_out"]
            u["wall_ms"] += r["wall_ms"]
            u["n_fragments"] += 1
            # provenance: min() semantics — False if ANY fragment of the
            # unit came off the pure-NumPy fallback path
            u["native"] = u["native"] and bool(r.get("native", False))
        now = datetime.now(timezone.utc)
        lin_rows = [
            {**u, "run_id": run_id, "status": "ok", "batch_tag": batch_tag, "committed_at": now}
            for u in per_unit.values()
        ]
        lin_tbl = pa.Table.from_pylist(lin_rows, schema=_LINEAGE_PA_SCHEMA)
        _write_parquet_file(
            os.path.join(self.path, "lineage"), f"part-ds-{run_id}-lineage.parquet", lin_tbl
        )

    def _drop_payload(self, messages) -> None:
        """Best-effort removal of aborted/duplicate tasks' payload files;
        anything missed is an orphan the vacuum sweep collects."""
        payload_dir = os.path.join(self.path, "payload")
        fs, root = _payload_fs(payload_dir)
        for m in messages or []:
            for name in {r["file"] for r in getattr(m, "rows", []) or []}:
                try:
                    if fs is None:
                        os.unlink(os.path.join(root, name))
                    else:
                        fs.delete_file(f"{root}/{name}")
                except (FileNotFoundError, OSError):
                    pass


class _EncodedBatchWriter(_EncodedWriterBase, DataSourceArrowWriter):
    def __init__(self, options, schema, overwrite: bool):
        super().__init__(options, schema)
        self.overwrite = overwrite
        # the additive-evolution type guard protects the UNION probe of
        # data that will still be visible after this write — which an
        # overwrite supersedes entirely, so only append checks it (a
        # type-changing overwrite is a legitimate full replacement)
        if not overwrite:
            _check_append_schema(self.path, schema)
        # target manifest dir is fixed at PLANNING time; the pointer swap
        # in commit() is what publishes it
        self.data_dir = (
            os.path.join(self.path, _next_manifest_name(self.path))
            if overwrite
            else manifest_dir(self.path)
        )

    def commit(self, messages):
        rows = [r for m in messages if m is not None for r in m.rows]
        self._commit_rows(rows, self.data_dir, self.run_id)
        if self.overwrite:
            # atomic publish: readers resolve the old manifest until this
            # rename-backed pointer lands; superseded payload/manifest
            # bytes age out under vacuum's horizon
            set_manifest_dir(self.path, os.path.basename(self.data_dir))

    def abort(self, messages):
        self._drop_payload(messages)


class _EncodedStreamWriter(_EncodedWriterBase, DataSourceStreamArrowWriter):
    """Micro-batch sink with replay-proof commits: the lineage tag
    ``ds_epoch_<query_token>_<batchId>`` plus a batch-unique run id give
    exactly-once at batch granularity (the native twin of
    :func:`...streaming.jobs.streaming_encode_ingest`).

    The tag is SCOPED by a token derived from the query's checkpoint
    location: restarts from the same checkpoint share the token (and
    Spark keeps their batchIds monotonic), while a NEW query (fresh
    checkpoint) writing to a dataset that already received epochs gets a
    fresh token — its batchId 0 can never collide with an earlier
    query's committed epoch 0 and be misread as a replay (which would
    silently drop its payload)."""

    def __init__(self, options, schema):
        super().__init__(options, schema)
        # streaming epochs are appends — the additive-evolution guard
        # always applies here
        _check_append_schema(self.path, schema)
        ck = options.get("checkpointLocation")
        if ck:
            import hashlib

            norm = ck if "://" in ck else os.path.abspath(ck)
            self._query_token = hashlib.sha1(norm.encode()).hexdigest()[:12]
        else:
            # no checkpoint → Spark cannot replay an epoch; a per-writer
            # token keeps the tags unique without replay semantics
            self._query_token = self.run_id

    def _tag(self, batch_id: int) -> str:
        return f"ds_epoch_{self._query_token}_{batch_id}"

    def _committed_tags(self) -> set[str]:
        lin = _read_meta_table(os.path.join(self.path, "lineage"), ["batch_tag", "status"])
        if lin is None:
            return set()
        return {
            t
            for t, s in zip(lin.column("batch_tag").to_pylist(), lin.column("status").to_pylist())
            if t and s == "ok"
        }

    def commit(self, messages, batchId: int):
        tag = self._tag(batchId)
        if tag in self._committed_tags():
            # replayed epoch (sink committed, checkpoint didn't): the
            # rerun's payload files are duplicates — drop, don't commit
            self._drop_payload(messages)
            return
        rows = [r for m in messages if m is not None for r in m.rows]
        self._commit_rows(rows, manifest_dir(self.path), f"{self.run_id}-b{batchId}", tag)

    def abort(self, messages, batchId: int):
        self._drop_payload(messages)


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


def q_source_read_filtered(spark, sf_dir: str):
    """Driver-contract query: encode the documents table, then read it
    back through the registered ``upe_encoded`` Spark format with a
    key-range + zone-map predicate — the filters reach the reader via
    Catalyst's pushFilters, prune units/chunks before payload reads, and
    Spark applies the exact residual.  The oracle is the same predicate
    as plain SQL over the source, so the driver's value hash certifies
    the DataSource read path end to end (pushdown included), not just
    the function-call decode."""
    import tempfile

    from pyspark.sql import functions as F

    from ..encode.pipeline import EncodeJobConfig, encode_job

    out = tempfile.mkdtemp(prefix="upes_dsr_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",),
        target_unit_bytes=256 << 10, chunk_rows=128,
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)
    register(spark)
    r = (
        spark.read.format("upe_encoded")
        .load(out)
        .where((F.col("doc_id") >= "10") & (F.col("doc_id") <= "24") & (F.col("n_chars") > 200))
    )
    return r.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "n_chars"
    )


def q_source_write_roundtrip(spark, sf_dir: str):
    """Driver-contract query: write the documents table through the
    ``upe_encoded`` SINK (Spark's commit protocol carrying the engine's
    manifest rows as task commit messages) and read it back through the
    same format.  A plain SELECT oracle certifies that the
    protocol-committed dataset is bit-identical to the source — the
    DataSource twin of ``encode_roundtrip``."""
    import tempfile

    from pyspark.sql import functions as F

    from ..encode.pipeline import EncodeJobConfig, load_or_build_plan

    out = tempfile.mkdtemp(prefix="upes_dsw_")
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    load_or_build_plan(
        df,
        EncodeJobConfig(output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=1 << 20),
    )
    register(spark)
    df.write.format("upe_encoded").option("key_col", "doc_id").mode("append").save(out)
    dec = spark.read.format("upe_encoded").load(out)
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source", "n_chars"
    )


def q_source_stream_read(spark, sf_dir: str):
    """Driver-contract query: two separate commits into an encoded
    dataset (an engine ``encode_job`` then a DataSource append), then
    the WHOLE history consumed through the ``upe_encoded`` STREAMING
    READER (``availableNow``) — each micro-batch lands in a parquet
    staging dir via ``foreachBatch``, and the returned DataFrame is
    the union of the emitted batches.  A plain SELECT oracle certifies
    that tailing the commit log reproduces the dataset exactly (no row
    lost, none duplicated across the offset intervals) — the
    stream-read twin of ``source_write_roundtrip``."""
    import tempfile

    from pyspark.sql import functions as F

    from ..encode.pipeline import EncodeJobConfig, encode_job

    out = tempfile.mkdtemp(prefix="upes_dsr_stream_")
    staging = tempfile.mkdtemp(prefix="upes_dsr_stage_")
    ck = tempfile.mkdtemp(prefix="upes_dsr_ck_")
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    cfg = EncodeJobConfig(output_dir=out, key_col="doc_id", size_cols=("text",))
    encode_job(spark, df.where("doc_id < '25'"), cfg)
    register(spark)
    df.where("doc_id >= '25'").write.format("upe_encoded").option(
        "key_col", "doc_id"
    ).mode("append").save(out)

    q = (
        spark.readStream.format("upe_encoded")
        .load(out)
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(staging)
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(staging)
    return got.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source", "n_chars"
    )


def q_evolve_roundtrip(spark, sf_dir: str):
    """Driver-contract query: two appends with DIFFERENT schemas —
    generation 1 keeps the base columns, generation 2 drops ``source``
    and adds ``score`` — then a full decode through the evolved union
    schema.  The oracle is the equivalent UNION ALL with typed NULLs, so
    the driver's value hash certifies the null-padded evolution
    semantics end to end (meta-only union probe, per-chunk padding),
    not just that it runs."""
    import tempfile

    from pyspark.sql import functions as F

    from ..encode.pipeline import EncodeJobConfig, decode_dataset, load_or_build_plan

    out = tempfile.mkdtemp(prefix="upes_evo_")
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    load_or_build_plan(
        df,
        EncodeJobConfig(output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=1 << 20),
    )
    register(spark)
    old = df.where("doc_id < '25'")
    new = (
        df.where("doc_id >= '25'")
        .drop("source")
        .withColumn("score", F.col("n_chars").cast("double") / 10.0)
    )
    old.write.format("upe_encoded").option("key_col", "doc_id").mode("append").save(out)
    new.write.format("upe_encoded").option("key_col", "doc_id").mode("append").save(out)
    dec = decode_dataset(spark, out)
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
        "score",
    )


class EncodedContainerDataSource(DataSource):
    """``spark.read.format("upe_encoded")`` / ``df.write.format("upe_encoded")``.

    Read options: ``columns`` (comma-separated decode pruning — excluded
    columns' buffers are skipped un-decompressed), ``partition_target_bytes``
    (scan-task payload size, default 64 MB).
    Write options: ``key_col`` (must match the dataset plan), ``chunk_rows``,
    ``max_buffer_bytes``.  See the module docstring for semantics."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("upe_encoded requires a path: .load(<output_dir>)")
        man = _committed_manifest(path)
        probe = _probe_chunk_schema(path, man)
        cols = self.options.get("columns")
        columns = [c.strip() for c in cols.split(",") if c.strip()] if cols else None
        if columns:
            missing = [c for c in columns if c not in probe.names]
            if missing:
                raise ValueError(f"columns not in dataset: {missing}")
        return _arrow_to_ddl(probe, columns)

    def reader(self, schema):
        # a reader DECLARING pushFilters hard-fails when the conf is off,
        # so the capability is chosen by the live conf (driver-side here)
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        enabled = False
        if spark is not None:
            enabled = str(spark.conf.get(_PUSHDOWN_CONF, "false")).lower() == "true"
        cls = _EncodedPushdownReader if enabled else _EncodedReader
        return cls(self.options)

    def writer(self, schema, overwrite: bool):
        return _EncodedBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError("upe_encoded streaming supports append mode only")
        return _EncodedStreamWriter(self.options, schema)

    def streamReader(self, schema):
        return _EncodedStreamReader(self.options)

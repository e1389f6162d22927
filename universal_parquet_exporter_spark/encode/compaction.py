"""Compaction: rewrite fragmented encode units into full-size chunks.

Append commits and streaming epochs add FRAGMENTS to existing units
(the design that makes them cheap and crash-safe), so a long-lived
dataset ingested in small batches drifts toward many small chunks —
and small chunks are measurably bad: the codec layer runs ~5× slower
per byte below ~10k rows and compresses worse (BENCH/BASELINE.md §3),
the exact drift Iceberg's ``rewrite_data_files`` action exists to
repair.  :func:`compact` is the engine's analog:

1. **Select** committed units whose average slice is smaller than
   ``min_avg_slice_rows`` (default ``chunk_rows // 2``) — work is
   proportional to the FRAGMENTED data only, never the healthy bulk.
2. **Rewrite** those units through the engine's own stream: tasks
   decode their units' slices straight from storage (Arrow, payload
   bytes never enter the JVM — only manifest rows cross the exchange),
   re-encode them as fresh ~``chunk_rows``-row chunks with freshly
   trained FSST tables and zone maps, and append new payload files.
3. **Publish atomically** with the same versioned-manifest pointer
   swap vacuum's rewrite uses: the new ``data_v<N>`` dir holds every
   surviving row (non-compacted units verbatim — their committed
   lineage stays valid — plus in-flight runs' young uncommitted rows,
   which must outlive the rewrite) and the compacted units' new rows;
   lineage for the new run is committed BEFORE the pointer lands, so a
   reader resolves either the old complete manifest or the new one.

Crash windows mirror the encode job's: payload written but lineage
missing → orphan files vacuum sweeps; lineage written but pointer not
swapped → an unreferenced ``data_v<N>`` dir that ages out under
:func:`~.maintenance.vacuum`'s retired-manifest horizon.  Superseded
payload chunks of compacted units become dead only when NO surviving
manifest row references them (multi-unit chunks shared with healthy
units stay live) — the next vacuum reclaims the rest.

Concurrency contract = vacuum's: run while no encode job is writing,
or rely on the kept-young-rows rule above plus a later horizoned
vacuum.  The reference has no analog (one file per export run,
``/root/reference/examples/basic_integration_example.py:101-116``);
this is 100 TB hygiene the north rule's resumable-ingest design makes
necessary.
"""

from __future__ import annotations

import os
import uuid

import numpy as np

from .container import deserialize_chunk
from .pipeline import (
    FRAG_SCHEMA,
    _encode_stream,
    _load_plan,
    _open_payload,
    _pad_table,
    _probe_rows,
    _union_probe_schema,
    manifest_dir,
    next_manifest_name,
    set_manifest_dir,
)


def compact(
    spark,
    output_dir: str,
    *,
    chunk_rows: int = 32768,
    min_avg_slice_rows: int | None = None,
    max_buffer_bytes: int = 256 << 20,
    dry_run: bool = False,
    cluster_by: tuple = (),
) -> dict:
    """Merge fragmented units' slices into full-size chunks; see module
    docstring.  Returns selection + rewrite counters; decoded data is
    unchanged by construction (pytest- and driver-oracle-gated).

    ``cluster_by`` additionally RE-SORTS each rewritten unit's rows by
    the given columns before re-chunking (Iceberg's sort-strategy
    ``rewrite_data_files``): a dataset ingested in interleaved arrival
    order gains narrow per-chunk zone maps on those columns
    retroactively, without re-reading the source.  Selection is
    unchanged — pair with a large ``min_avg_slice_rows`` to re-cluster
    every multi-slice unit, not just fragmented ones."""
    from pyspark.sql import functions as F

    from ..plans.partitioning import EncodePlan

    threshold = min_avg_slice_rows if min_avg_slice_rows is not None else chunk_rows // 2
    plan = _load_plan(output_dir)
    if plan is None:
        raise ValueError(f"no plan.json under {output_dir}: not an encoded dataset")
    data_dir = manifest_dir(output_dir)
    lineage_dir = os.path.join(output_dir, "lineage")
    payload_dir = os.path.join(output_dir, "payload")

    manifest = spark.read.parquet(data_dir)
    committed = (
        spark.read.parquet(lineage_dir).where("status = 'ok'").select("unit", "run_id")
    )
    committed_rows = manifest.join(F.broadcast(committed), ["unit", "run_id"], "left_semi")

    per_unit = committed_rows.groupBy("unit").agg(
        F.count("*").alias("n_slices"),
        F.sum("n_rows").alias("rows"),
        F.sum("bytes_out").alias("bytes_out"),
    )
    frag_cond = (F.col("n_slices") > 1) & ((F.col("rows") / F.col("n_slices")) < threshold)
    # selection report as ONE aggregation row — the unit ids themselves
    # never reach the driver (at 100 TB the fragmented set can be
    # millions of units); targets flow into the rewrite as a DataFrame
    # through broadcast semi/anti joins below
    ev = per_unit.agg(
        F.count("*").alias("units_total"),
        F.sum(frag_cond.cast("long")).alias("units_compacted"),
        F.sum(F.when(frag_cond, F.col("n_slices"))).alias("slices_before"),
        F.sum(F.when(frag_cond, F.col("bytes_out"))).alias("bytes_before"),
    ).collect()[0]
    n_targets = int(ev.units_compacted or 0)
    report = {
        "units_total": int(ev.units_total or 0),
        "units_compacted": n_targets,
        "slices_before": int(ev.slices_before or 0),
        "slices_after": 0,
        "bytes_before": int(ev.bytes_before or 0),
        "bytes_after": 0,
        "manifest_rewritten": False,
        "dry_run": dry_run,
    }
    if cluster_by:
        # validate against the DATASET's union schema (meta-only probes
        # over committed rows) before any early return, so a typo'd
        # column fails loudly even when selection is empty
        ds_probes = _probe_rows(committed_rows.select("codecs", "file", "offset"))
        ds_names = [
            f.name
            for f in _union_probe_schema(
                payload_dir, sorted((r.file, r.offset) for r in ds_probes)
            )
        ]
        missing_cols = [c for c in cluster_by if c not in ds_names]
        if missing_cols:
            raise ValueError(
                f"cluster_by columns not in the dataset schema: {missing_cols}"
            )
    if not n_targets or dry_run:
        return report
    target_units = per_unit.where(frag_cond).select("unit")

    run_id = "compact-" + uuid.uuid4().hex[:12]
    bplan = spark.sparkContext.broadcast(plan.to_json())
    key_col = plan.key_col

    # schema evolution: a target unit may hold chunks from several
    # generations (different column sets).  The rewrite merges their rows
    # into shared chunks, so each decoded chunk is padded to the
    # generations' UNION schema first (typed nulls, same union-by-name
    # resolution decode uses — absent-column rows read back as null
    # before and after compaction).  One meta-only probe per distinct
    # name set over the TARGET slices finds that union; a type flip
    # between generations fails loudly here, not mid-rewrite.
    target_slices_df = committed_rows.join(F.broadcast(target_units), "unit", "left_semi")
    probes = _probe_rows(target_slices_df.select("codecs", "file", "offset"))
    union_fields = list(
        _union_probe_schema(payload_dir, sorted((r.file, r.offset) for r in probes))
    )

    def rewrite(iterator):
        """Decode this task's slices (one-chunk cache, slices arrive
        sorted by (file, offset)) and feed the rows straight back
        through the encode stream — payload in and out via storage."""
        plan_local = EncodePlan.from_json(bplan.value)

        def decoded():
            handles: dict[str, object] = {}
            cur_key, cur_tbl = None, None
            try:
                for batch in iterator:
                    cols = [batch.column(i).to_pylist() for i in range(5)]
                    for fname, off, ln, roff, nr in zip(*cols):
                        if (fname, off) != cur_key:
                            fh = handles.get(fname)
                            if fh is None:
                                fh = handles[fname] = _open_payload(payload_dir, fname)
                            fh.seek(off)
                            cur_tbl = _pad_table(deserialize_chunk(fh.read(ln)), union_fields)
                            cur_key = (fname, off)
                        for b in cur_tbl.slice(roff, nr).to_batches():
                            if b.num_rows:
                                yield b
            finally:
                for fh in handles.values():
                    fh.close()

        yield from _encode_stream(
            decoded(),
            plan_local,
            np.array([], dtype=np.int64),
            key_col,
            payload_dir,
            chunk_rows,
            max_buffer_bytes,
            cluster_cols=cluster_by,
            sort_units_at_flush=True,
        )

    # a unit's slices must meet in one task (so it re-packs into the
    # fewest chunks); partition the SLICE MANIFEST by unit — the only
    # exchange in the job, and it carries bookkeeping rows, not payload
    n_part = max(1, min(n_targets, spark.sparkContext.defaultParallelism))
    slices = (
        target_slices_df
        .select("file", "offset", "length", "row_off", "n_rows", "unit")
        .repartition(n_part, "unit")
        .sortWithinPartitions("file", "offset", "row_off")
        .drop("unit")
    )
    new_frags = slices.mapInArrow(rewrite, FRAG_SCHEMA).withColumn("run_id", F.lit(run_id))

    # surviving manifest = everything except the compacted units'
    # COMMITTED rows: non-target units verbatim, and in-flight runs'
    # young uncommitted rows (even of target units) must outlive the
    # rewrite — they commit their lineage later
    # anti/semi joins move their key columns first — re-project both
    # legs to the manifest's column order before the positional union
    survivors = (
        manifest.join(F.broadcast(committed), ["unit", "run_id"], "left_anti")
        .select(*manifest.columns)
        .union(
            committed_rows.join(F.broadcast(target_units), "unit", "left_anti")
            .select(*manifest.columns)
        )
    )

    # version allocation scans EXISTING data_v* dirs (next_manifest_name),
    # never current-pointer+1: a crashed or in-flight DataSource
    # overwrite's unreferenced dir must not be clobbered or appended into
    new_name = next_manifest_name(output_dir)
    new_dir = (
        os.path.join(output_dir, new_name)
        if "://" not in output_dir
        else f"{output_dir}/{new_name}"
    )
    survivors.unionByName(new_frags, allowMissingColumns=True).write.mode(
        "overwrite"
    ).parquet(new_dir)

    # lineage first (the new rows' visibility key), pointer swap last —
    # until the swap, readers resolve the old manifest, which the new
    # lineage rows cannot touch (their rows exist only in the new dir)
    new_manifest = spark.read.parquet(new_dir)
    lin_aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
        F.sum("wall_ms").alias("wall_ms"),
        F.count("*").alias("n_fragments"),
        F.first("codecs").alias("codecs"),
    ]
    if "native" in new_manifest.columns:
        lin_aggs.append(F.min("native").alias("native"))
    new_units = (
        new_manifest.where(F.col("run_id") == run_id).groupBy("unit").agg(*lin_aggs)
    )
    (
        new_units.withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("ok"))
        .withColumn("batch_tag", F.lit("compact"))
        .withColumn("committed_at", F.current_timestamp())
        .write.mode("append")
        .parquet(lineage_dir)
    )
    set_manifest_dir(output_dir, new_name)

    after = (
        new_manifest.where(F.col("run_id") == run_id)
        .agg(F.count("*").alias("n"), F.sum("bytes_out").alias("b"))
        .collect()[0]
    )
    report["slices_after"] = int(after.n or 0)
    report["bytes_after"] = int(after.b or 0)
    report["manifest_rewritten"] = True
    return report


def q_compact_roundtrip(spark, sf_dir: str):
    """Driver-contract query: ingest the documents table in FOUR small
    appends (the fragment drift a streaming table accrues), compact, and
    decode through the rewritten manifest.  The oracle is a plain
    SELECT, so the driver's value hash certifies the rewrite moved every
    row bit-identically; the query itself also asserts the rewrite
    actually merged fragments (fewer slices after than before)."""
    import tempfile

    from pyspark.sql import functions as F

    from .pipeline import EncodeJobConfig, decode_dataset, encode_job

    out = tempfile.mkdtemp(prefix="upes_cmpq_")
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    for i in range(4):
        part = df.where(F.crc32(F.col("doc_id")) % 4 == i)
        cfg = EncodeJobConfig(
            output_dir=out,
            key_col="doc_id",
            size_cols=("text",),
            target_unit_bytes=4 << 20,
            chunk_rows=64,
            skip_completed=False,
            batch_tag=f"append_{i}",
        )
        encode_job(spark, part, cfg)

    rep = compact(spark, out, chunk_rows=32768)
    if not rep["units_compacted"] or rep["slices_after"] >= rep["slices_before"]:
        raise RuntimeError(f"compaction merged nothing: {rep}")
    dec = decode_dataset(spark, out)
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source", "n_chars"
    )


def q_compact_filtered(spark, sf_dir: str):
    """Driver-contract query: zone-map pruning STILL WORKS after a
    compaction rewrite — fragments carry stats, the rewrite re-encodes
    target units into fresh chunks with freshly computed stats
    (:func:`~.pipeline._chunk_stats` runs inside ``_encode_stream``
    unconditionally), and a filtered decode over the rewritten manifest
    must still skip chunks.  The query raises unless (a) compaction
    merged fragments and (b) the post-compact manifest's bounds actually
    disqualify chunks for the predicate — so a green row certifies stats
    survival through the rewrite, not just row identity."""
    import tempfile

    from pyspark.sql import functions as F

    from .pipeline import EncodeJobConfig, decode_dataset, encode_job, manifest_dir

    out = tempfile.mkdtemp(prefix="upes_cmpf_")
    # zero-padded key: lexicographic unit order == numeric id order, so
    # post-compact chunks carry NARROW key bounds a bound can disqualify.
    # small units (64 KiB) → many units; three random-third appends give
    # each unit ~3 under-filled slices (a unit's wave flushes as one
    # chunk, so fragmentation here is slices-per-unit, not chunk splits)
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.lpad(F.col("doc_id").cast("string"), 8, "0")
    )
    for i in range(3):
        part = df.where(F.crc32(F.col("doc_id")) % 3 == i)
        cfg = EncodeJobConfig(
            output_dir=out,
            key_col="doc_id",
            size_cols=("text",),
            target_unit_bytes=16 << 10,
            chunk_rows=64,
            skip_completed=False,
            batch_tag=f"append_{i}",
        )
        encode_job(spark, part, cfg)
    rep = compact(spark, out, chunk_rows=64, min_avg_slice_rows=64)
    if not rep["units_compacted"] or rep["slices_after"] >= rep["slices_before"]:
        raise RuntimeError(f"compaction merged nothing: {rep}")

    # pruning evidence on the REWRITTEN manifest, as one aggregation row
    bound = "00000300"
    mx = F.get_json_object(F.col("stats"), "$.doc_id[1]")
    ev = (
        spark.read.parquet(manifest_dir(out))
        .agg(
            F.count("*").alias("total"),
            F.sum((mx.isNull() | (mx >= bound)).cast("long")).alias("qualifying"),
        )
        .collect()[0]
    )
    if ev.total > 1 and ev.qualifying >= ev.total:
        raise RuntimeError(
            f"post-compact zone maps pruned nothing ({ev.qualifying}/{ev.total} qualify)"
        )
    dec = decode_dataset(spark, out, filters=[("doc_id", ">=", bound)])
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source", "n_chars"
    )


def q_compact_clustered(spark, sf_dir: str):
    """Driver-contract query: RETRO-CLUSTERING (``compact(cluster_by=…)``,
    Iceberg's sort-strategy ``rewrite_data_files``) end to end.  A
    dataset ingested in interleaved arrival order — every chunk mixes
    all languages, so ``lang = 'de'`` can prune nothing — is rewritten
    in place with ``cluster_by=("lang",)``; the query raises unless the
    rewrite ran AND the post-rewrite equality decode actually skipped
    chunks (distinct-value-set membership on now-narrow chunks), and the
    oracle is the plain predicate, so a green row certifies both the
    pruning evidence and bit-identical values through the re-sort."""
    import tempfile

    from pyspark.sql import functions as F

    from .pipeline import EncodeJobConfig, decode_dataset, encode_job

    out = tempfile.mkdtemp(prefix="upes_cmpc_")
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.lpad(F.col("doc_id").cast("string"), 8, "0")
    )
    # two hash-split appends: each unit gets ~2 slices (selectable) and
    # every chunk interleaves languages (nothing for equality to prune)
    for i in range(2):
        part = df.where(F.crc32(F.col("doc_id")) % 2 == i)
        cfg = EncodeJobConfig(
            output_dir=out,
            key_col="doc_id",
            size_cols=("text",),
            target_unit_bytes=16 << 10,
            chunk_rows=64,
            skip_completed=False,
            batch_tag=f"append_{i}",
        )
        encode_job(spark, part, cfg)

    ev_pre: dict = {}
    decode_dataset(
        spark, out, filters=[("lang", "=", "de")], pruning_evidence=ev_pre
    )
    # min_avg_slice_rows above any slice size selects every multi-slice
    # unit — re-clustering is the goal here, not fragment repair.
    # chunk_rows=16 < rows-per-lang-per-unit so the sorted rewrite yields
    # mostly single-language chunks (pruning needs chunks narrower than
    # the language mix)
    rep = compact(
        spark,
        out,
        chunk_rows=16,
        min_avg_slice_rows=1 << 30,
        cluster_by=("lang",),
    )
    if not rep["units_compacted"] or not rep["manifest_rewritten"]:
        raise RuntimeError(f"retro-clustering rewrote nothing: {rep}")
    ev: dict = {}
    dec = decode_dataset(spark, out, filters=[("lang", "=", "de")], pruning_evidence=ev)
    if ev["qualifying"] >= ev["total"]:
        raise RuntimeError(
            f"retro-clustered equality decode pruned nothing ({ev}, pre {ev_pre})"
        )
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )

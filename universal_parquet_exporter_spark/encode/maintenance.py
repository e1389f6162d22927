"""Maintenance sweep for encoded datasets: vacuum dead payload files and
orphan manifest rows.

The encode job's crash-safety design (see :mod:`.pipeline` module
docstring) deliberately leaves garbage instead of blocking on cleanup:

- a task attempt that ran but whose manifest rows never committed (job
  crash, speculative/retried attempt that lost) leaves a **dead payload
  file** — present in ``payload/`` but referenced by no committed
  manifest row;
- a run that crashed between the manifest commit and the lineage commit
  leaves **orphan manifest rows** — present in ``data/`` but whose
  ``(unit, run_id)`` has no ``status='ok'`` lineage row.  Decode already
  semi-joins them away; they only cost manifest-scan bytes.

Neither is ever read, but a long-running 100 TB table accumulates them
forever; :func:`vacuum` is the engine's analog of Iceberg's
``remove_orphan_files`` + ``rewrite_manifests`` maintenance actions (the
reference side-steps the problem with self-contained per-run output
dirs, ``/root/reference/examples/advanced_integration_example.py:37-51``).

Concurrency contract (same as Iceberg's): run vacuum while no encode
job is writing, **or** pass ``older_than_sec`` greater than the longest
possible in-flight job so a live task's payload file (written, not yet
committed) is never swept.  Production default should be hours-to-days;
0 is for tests and known-quiet tables.

Scale notes: the live-file set is one ``file`` value per committed task
attempt — collected to the driver it is bounded by total task count
(~1.6 M for 100 TB at 64 MB units), a few tens of MB.  The payload-dir
listing is the same driver-side listing Iceberg's action does.  Deletes
fan out through the cluster above a small threshold so the sweep is not
bottlenecked on one filesystem client.
"""

from __future__ import annotations

import os
import time

from .pipeline import _payload_fs, manifest_dir, next_manifest_name, set_manifest_dir


def _list_payload_files(payload_dir: str) -> list[tuple[str, int, float]]:
    """(name, size, mtime_epoch) for every payload file."""
    fs, root = _payload_fs(payload_dir)
    out = []
    if fs is None:
        if not os.path.isdir(root):
            return []
        # regular files only, matching the pyarrow branch's FileType.File
        # filter — a stray subdirectory must not be classified as a dead
        # payload file (os.unlink on it would crash the sweep)
        for entry in os.scandir(root):
            if not entry.is_file(follow_symlinks=False):
                continue
            st = entry.stat()
            out.append((entry.name, st.st_size, st.st_mtime))
    else:
        from pyarrow.fs import FileSelector, FileType

        sel = FileSelector(root, allow_not_found=True)
        for info in fs.get_file_info(sel):
            if info.type == FileType.File:
                # missing mtime (some object stores) = age unknowable:
                # treat as infinitely YOUNG so horizons protect the file
                # rather than sweep it (0.0 would invert the safety)
                mtime = info.mtime.timestamp() if info.mtime is not None else float("inf")
                out.append((info.base_name, info.size, mtime))
    return out


def _delete_files(payload_dir: str, names: list[str], spark=None) -> None:
    """Delete payload files; fan out through the cluster for large sweeps
    so one filesystem client isn't the bottleneck."""
    if spark is not None and len(names) > 256:
        def rm(it):
            fs, root = _payload_fs(payload_dir)
            for n in it:
                try:
                    if fs is None:
                        os.unlink(os.path.join(root, n))
                    else:
                        fs.delete_file(f"{root}/{n}")
                except FileNotFoundError:
                    pass

        spark.sparkContext.parallelize(names, max(1, len(names) // 1024)).foreachPartition(rm)
        return
    fs, root = _payload_fs(payload_dir)
    for n in names:
        try:
            if fs is None:
                os.unlink(os.path.join(root, n))
            else:
                fs.delete_file(f"{root}/{n}")
        except FileNotFoundError:
            pass


def _storage_now(output_dir: str) -> float:
    """'Now' on the STORAGE clock: write a marker file next to the
    dataset, read back its mtime, delete it.  ``older_than_sec`` horizons
    compare against storage mtimes, so anchoring now to the driver's
    ``time.time()`` silently erodes the 'never sweep an in-flight payload
    file' margin by however far the driver and storage clocks disagree —
    on object stores that skew is unbounded.  One marker round-trip pins
    the comparison to a single clock.  Falls back to driver time if the
    store exposes no mtime (then the horizon must also absorb worst-case
    skew — documented in :func:`vacuum`)."""
    fs, root = _payload_fs(output_dir)
    name = ".vacuum_clock_probe"
    try:
        if fs is None:
            os.makedirs(root, exist_ok=True)
            path = os.path.join(root, name)
            with open(path, "wb") as f:
                f.write(b"x")
            mtime = os.stat(path).st_mtime
            os.unlink(path)
            return mtime
        path = f"{root}/{name}"
        with fs.open_output_stream(path) as f:
            f.write(b"x")
        info = fs.get_file_info(path)
        fs.delete_file(path)
        if info.mtime is not None:
            return info.mtime.timestamp()
    except OSError:
        pass
    return time.time()


def _heal_interrupted_swap(data_dir: str) -> None:
    """Recover from a vacuum killed mid-swap.  States the two-rename
    swap can leave: (a) crash between the renames — ``data/`` missing,
    ``data.vacuum_old`` present: roll the old dir back; (b) crash before
    the first rename or after the second — stray ``.vacuum_tmp`` /
    ``.vacuum_old`` beside an intact ``data/``: delete the strays.
    Idempotent; called at every vacuum start."""
    import shutil

    fs, d = _payload_fs(data_dir)
    old, tmp = d + ".vacuum_old", d + ".vacuum_tmp"
    if fs is None:
        if not os.path.isdir(d) and os.path.isdir(old):
            os.rename(old, d)
        if os.path.isdir(d):
            shutil.rmtree(old, ignore_errors=True)
            shutil.rmtree(tmp, ignore_errors=True)
    else:
        from pyarrow.fs import FileType

        d_t = fs.get_file_info(d).type
        old_t = fs.get_file_info(old).type
        if d_t == FileType.NotFound and old_t == FileType.Directory:
            fs.move(old, d)
            old_t = FileType.NotFound
        if fs.get_file_info(d).type == FileType.Directory:
            if old_t == FileType.Directory:
                fs.delete_dir(old)
            if fs.get_file_info(tmp).type == FileType.Directory:
                fs.delete_dir(tmp)


def _ptr_mtime(output_dir: str) -> float | None:
    """mtime of the manifest_current pointer file, or None if absent."""
    fs, root = _payload_fs(output_dir)
    if fs is None:
        p = os.path.join(root, "manifest_current")
        return os.path.getmtime(p) if os.path.exists(p) else None
    from pyarrow.fs import FileType

    info = fs.get_file_info(f"{root}/manifest_current")
    if info.type != FileType.File:
        return None
    if info.mtime is None:
        # mtime-less store: retirement age is UNKNOWABLE — signal the
        # sweeper to protect retired dirs rather than treating them as
        # infinitely old (0.0 would invert the reader-safety horizon)
        return float("inf")
    return info.mtime.timestamp()


def _sweep_retired_manifests(
    output_dir: str, current_dir: str, now: float, older_than_sec: float,
    dry_run: bool = False,
) -> int:
    """Delete manifest directories no longer referenced by the pointer —
    retired by a rewrite, or left by a rewrite that crashed before its
    pointer swap — once old enough that any reader which resolved them
    has had ``older_than_sec`` to finish.  Age is measured from the
    NEWEST of the pointer mtime (= last swap, when dirs retire) and the
    dir's own newest file (covers crashed unreferenced rewrites)."""
    import re
    import shutil

    cur_name = os.path.basename(current_dir.rstrip("/"))
    ptr_m = _ptr_mtime(output_dir)
    fs, root = _payload_fs(output_dir)
    names: list[str] = []
    if fs is None:
        if os.path.isdir(root):
            names = [e.name for e in os.scandir(root) if e.is_dir(follow_symlinks=False)]
    else:
        from pyarrow.fs import FileSelector, FileType

        names = [
            i.base_name
            for i in fs.get_file_info(FileSelector(root, allow_not_found=True))
            if i.type == FileType.Directory
        ]
    swept = 0
    for name in names:
        if name == cur_name or not re.fullmatch(r"data(_v\d+)?", name):
            continue
        # listing goes through the scheme-qualified path (so URI datasets
        # resolve the right filesystem); deletion uses the resolved one
        d_list = (
            os.path.join(output_dir, name) if "://" not in output_dir
            else f"{output_dir}/{name}"
        )
        newest = max((m for _n, _s, m in _list_payload_files(d_list)), default=0.0)
        if ptr_m is not None:
            newest = max(newest, ptr_m)
        if (now - newest) < older_than_sec:
            continue
        if not dry_run:
            if fs is None:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            else:
                fs.delete_dir(f"{root}/{name}")
        swept += 1
    return swept


def vacuum(
    spark,
    output_dir: str,
    *,
    older_than_sec: float = 0.0,
    rewrite_manifest: bool = True,
    dry_run: bool = False,
) -> dict:
    """Sweep an encoded dataset: delete payload files referenced by no
    committed manifest row, and (optionally) compact orphan manifest rows
    out of ``data/``.

    ``older_than_sec`` is the safety horizon applied to BOTH sweeps:
    payload files younger than it survive, and orphan manifest rows are
    only compacted out when the manifest part-file holding them is older
    than it — an in-flight run that has committed its manifest but not
    yet its lineage is exactly a young orphan, and dropping its rows
    would lose data it is about to commit.  ``rewrite_manifest``
    writes the orphan-free manifest to a NEW versioned directory
    (``data_v<N>``) and atomically swaps the ``manifest_current``
    pointer to it — the Iceberg version-hint pattern: a concurrent
    reader resolves either the old manifest (kept on disk) or the new
    one, both complete, and a crash mid-rewrite leaves the pointer on
    the old manifest with only an unreferenced new dir behind (swept
    later).  Retired manifest dirs are deleted by a LATER vacuum once
    the pointer is older than the horizon — guaranteeing every reader
    that resolved them has had ``older_than_sec`` to finish.
    ``dry_run`` reports without deleting.

    Returns counts + reclaimed bytes; decode results are unchanged by
    construction (only never-read data is touched — pytest-gated by a
    crash-mid-commit round trip in ``tests/test_maintenance.py``)."""
    from pyspark.sql import functions as F

    data_dir = manifest_dir(output_dir)
    lineage_dir = os.path.join(output_dir, "lineage")
    payload_dir = os.path.join(output_dir, "payload")
    # the horizon compares against STORAGE mtimes, so 'now' comes from the
    # storage clock (marker-file round trip) — driver/storage skew must
    # not erode the in-flight safety margin.  If the store exposes no
    # mtime, this falls back to driver time and older_than_sec must
    # exceed the longest in-flight job PLUS worst-case clock skew.
    now = _storage_now(output_dir)
    # heal pre-pointer two-rename leftovers (legacy layout upgrades)
    _heal_interrupted_swap(data_dir)
    # dry_run still COUNTS would-be-swept retired dirs (report without
    # deleting, same as every other counter)
    retired_swept = _sweep_retired_manifests(
        output_dir, data_dir, now, older_than_sec, dry_run=dry_run
    )

    committed = (
        spark.read.parquet(lineage_dir).where("status = 'ok'").select("unit", "run_id")
    )
    # per-part-file mtimes give orphan rows their age (each manifest
    # append writes fresh part files, so file mtime ≈ that run's commit
    # time); rows in young part files are NEVER treated as orphans
    part_mtimes = {name: m for name, _sz, m in _list_payload_files(data_dir)}
    old_parts = {n for n, m in part_mtimes.items() if (now - m) >= older_than_sec}
    manifest = spark.read.parquet(data_dir).withColumn(
        "__part", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    base_cols = [c for c in manifest.columns if c != "__part"]
    uncommitted = manifest.join(F.broadcast(committed), ["unit", "run_id"], "left_anti")
    is_old_part = F.col("__part").isin(list(old_parts) or [""])
    # the anti-join moves its key columns first; re-project to the
    # manifest's column order so exceptAll aligns positionally
    orphans = uncommitted.where(is_old_part).select(*base_cols)
    young_uncommitted = uncommitted.where(~is_old_part)
    live = manifest.select(*base_cols).exceptAll(orphans)

    # payload liveness: referenced by a committed row OR by any
    # uncommitted-but-young row (an in-flight run's files) — plus the
    # payload file's own mtime horizon, belt and braces.  The driver
    # collects only the DEAD list (what it must delete anyway, bounded
    # by actual garbage) via an anti-join against the live references —
    # never the full live-file set, which at 100 TB is ~10^6 names of
    # healthy data the sweep doesn't touch
    committed_rows = manifest.join(F.broadcast(committed), ["unit", "run_id"], "left_semi")
    keep_refs = (
        committed_rows.select("file").union(young_uncommitted.select("file")).distinct()
    )
    listed = _list_payload_files(payload_dir)
    aged = [(name, int(size)) for name, size, mtime in listed if (now - mtime) >= older_than_sec]
    dead: list[tuple[str, int]] = []
    if aged:
        aged_df = spark.createDataFrame(aged, "file string, size long")
        dead = [
            (r.file, r.size)
            for r in aged_df.join(keep_refs, "file", "left_anti").collect()
        ]
    reclaimed = sum(s for _, s in dead)
    if dead and not dry_run:
        _delete_files(payload_dir, [n for n, _ in dead], spark)

    orphan_rows = int(orphans.count())
    rewrote = False
    if orphan_rows and rewrite_manifest and not dry_run:
        # versioned rewrite + atomic pointer swap: write the orphan-free
        # manifest to data_v<N+1>, then flip manifest_current.  The old
        # dir stays on disk (readers that already resolved it finish
        # unharmed) and is deleted by a later horizoned vacuum.
        # allocate above every EXISTING data_v* dir (not pointer+1) so a
        # crashed/in-flight overwrite's unreferenced dir is never reused
        new_name = next_manifest_name(output_dir)
        new_dir = (
            os.path.join(output_dir, new_name)
            if "://" not in output_dir
            else f"{output_dir}/{new_name}"
        )
        live.write.mode("overwrite").parquet(new_dir)
        set_manifest_dir(output_dir, new_name)
        rewrote = True

    # stale temp files from crashed commits: plan.json.tmp* (planner) and
    # manifest_current.tmp* (pointer swap) — both fs paths write the same
    # tmp names
    def _is_stale_tmp(name: str) -> bool:
        return name.startswith("plan.json.tmp") or name.startswith("manifest_current.tmp")

    stale_tmp = []
    fs, root = _payload_fs(output_dir)
    if fs is None:
        if os.path.isdir(root):
            stale_tmp = [
                f for f in os.listdir(root)
                if _is_stale_tmp(f)
                and (now - os.path.getmtime(os.path.join(root, f))) >= older_than_sec
            ]
            if not dry_run:
                for f in stale_tmp:
                    os.unlink(os.path.join(root, f))
    else:
        from pyarrow.fs import FileSelector, FileType

        for info in fs.get_file_info(FileSelector(root, allow_not_found=True)):
            if info.type != FileType.File or not _is_stale_tmp(info.base_name):
                continue
            # missing mtime → protect (an in-flight pointer swap's tmp
            # must never be deleted from under its fs.move)
            mt = info.mtime.timestamp() if info.mtime is not None else float("inf")
            if (now - mt) >= older_than_sec:
                stale_tmp.append(info.base_name)
                if not dry_run:
                    fs.delete_file(f"{root}/{info.base_name}")

    return {
        "payload_files": len(listed),
        "live_files": int(keep_refs.count()),
        "deleted_files": len(dead),
        "reclaimed_bytes": int(reclaimed),
        "orphan_manifest_rows": orphan_rows,
        "manifest_rewritten": rewrote,
        "retired_manifest_dirs": retired_swept,
        "stale_plan_tmp": len(stale_tmp),
        "dry_run": dry_run,
    }


def q_vacuum_roundtrip(spark, sf_dir: str):
    """Driver-contract query: encode the documents table, simulate a run
    that crashed between the manifest commit and the lineage commit
    (orphan manifest rows pointing at copied dead payload files, plus a
    payload-only casualty from a lost task attempt), :func:`vacuum` the
    dataset, and decode it back.  The oracle is a plain SELECT, so the
    driver's value hash certifies that the sweep deletes ONLY never-read
    data — the same crash pattern `tests/test_maintenance.py` gates,
    here re-proven against independent data every round."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .pipeline import EncodeJobConfig, decode_dataset, encode_job

    out = tempfile.mkdtemp(prefix="upes_vacq_")
    cfg = EncodeJobConfig(
        output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=4 << 20
    )
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    encode_job(spark, df, cfg)

    data_dir = os.path.join(out, "data")
    pdir = os.path.join(out, "payload")
    torn = spark.read.parquet(data_dir).withColumn("run_id", F.lit("deadbeef0000"))
    renames = {
        r.file: f"frag-torn-{i:04d}.bin"
        for i, r in enumerate(torn.select("file").distinct().collect())
    }
    for src, dst in renames.items():
        shutil.copyfile(os.path.join(pdir, src), os.path.join(pdir, dst))
    mapping = F.create_map([F.lit(x) for kv in renames.items() for x in kv])
    torn.withColumn("file", mapping[F.col("file")]).write.mode("append").parquet(data_dir)
    with open(os.path.join(pdir, "frag-lost-attempt.bin"), "wb") as f:
        f.write(b"\x00" * 1024)

    rep = vacuum(spark, out)
    if not rep["deleted_files"] or not rep["manifest_rewritten"]:
        raise RuntimeError(f"vacuum swept nothing: {rep}")
    dec = decode_dataset(spark, out)
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source", "n_chars"
    )

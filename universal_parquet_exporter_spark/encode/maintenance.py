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

from .pipeline import _payload_fs


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
                mtime = info.mtime.timestamp() if info.mtime is not None else 0.0
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
    rewrites ``data/`` without the old-enough orphan rows via a
    temp-dir + two-rename swap; the swap is crash-RECOVERABLE, not
    atomic (vacuum heals an interrupted swap on its next run, and
    ``_heal_interrupted_swap`` can be called directly), and a reader
    racing the swap window can momentarily see a missing dir — run the
    rewrite in a maintenance window, or leave it False on object stores
    and let orphan rows age out as scan noise.  ``dry_run`` reports
    without deleting.

    Returns counts + reclaimed bytes; decode results are unchanged by
    construction (only never-read data is touched — pytest-gated by a
    crash-mid-commit round trip in ``tests/test_maintenance.py``)."""
    from pyspark.sql import functions as F

    data_dir = os.path.join(output_dir, "data")
    lineage_dir = os.path.join(output_dir, "lineage")
    payload_dir = os.path.join(output_dir, "payload")
    # the horizon compares against STORAGE mtimes, so 'now' comes from the
    # storage clock (marker-file round trip) — driver/storage skew must
    # not erode the in-flight safety margin.  If the store exposes no
    # mtime, this falls back to driver time and older_than_sec must
    # exceed the longest in-flight job PLUS worst-case clock skew.
    now = _storage_now(output_dir)
    _heal_interrupted_swap(data_dir)

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
    # payload file's own mtime horizon, belt and braces
    committed_rows = manifest.join(F.broadcast(committed), ["unit", "run_id"], "left_semi")
    keep_files = {
        r.file
        for r in committed_rows.select("file")
        .union(young_uncommitted.select("file"))
        .distinct()
        .collect()
    }

    listed = _list_payload_files(payload_dir)
    dead = [
        (name, size)
        for name, size, mtime in listed
        if name not in keep_files and (now - mtime) >= older_than_sec
    ]
    reclaimed = sum(s for _, s in dead)
    if dead and not dry_run:
        _delete_files(payload_dir, [n for n, _ in dead], spark)

    orphan_rows = int(orphans.count())
    rewrote = False
    if orphan_rows and rewrite_manifest and not dry_run:
        tmp_dir = data_dir + ".vacuum_tmp"
        old_dir = data_dir + ".vacuum_old"
        live.write.mode("overwrite").parquet(tmp_dir)
        fs, _ = _payload_fs(data_dir)
        if fs is None:
            os.rename(data_dir, old_dir)
            os.rename(tmp_dir, data_dir)
            import shutil

            shutil.rmtree(old_dir, ignore_errors=True)
        else:
            _, d = _payload_fs(data_dir)
            _, t = _payload_fs(tmp_dir)
            _, o = _payload_fs(old_dir)
            fs.move(d, o)
            fs.move(t, d)
            fs.delete_dir(o)
        rewrote = True

    # stale plan.json temp files from crashed planners (both fs paths —
    # the pyarrow.fs plan commit writes the same tmp names)
    stale_tmp = []
    fs, root = _payload_fs(output_dir)
    if fs is None:
        if os.path.isdir(root):
            stale_tmp = [
                f for f in os.listdir(root)
                if f.startswith("plan.json.tmp")
                and (now - os.path.getmtime(os.path.join(root, f))) >= older_than_sec
            ]
            if not dry_run:
                for f in stale_tmp:
                    os.unlink(os.path.join(root, f))
    else:
        from pyarrow.fs import FileSelector, FileType

        for info in fs.get_file_info(FileSelector(root, allow_not_found=True)):
            if info.type != FileType.File or not info.base_name.startswith("plan.json.tmp"):
                continue
            mt = info.mtime.timestamp() if info.mtime is not None else 0.0
            if (now - mt) >= older_than_sec:
                stale_tmp.append(info.base_name)
                if not dry_run:
                    fs.delete_file(f"{root}/{info.base_name}")

    return {
        "payload_files": len(listed),
        "live_files": len(keep_files),
        "deleted_files": len(dead),
        "reclaimed_bytes": int(reclaimed),
        "orphan_manifest_rows": orphan_rows,
        "manifest_rewritten": rewrote,
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

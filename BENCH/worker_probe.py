"""Head-to-head, interleaved: the IDENTICAL per-task encode work run
(a) inside Spark local-cluster python workers and (b) in a plain mp
pool, on the same cores, same input, alternating — with per-task
python CPU vs wall so starvation (wall >> cpu) separates from genuine
extra CPU burn.  Usage: python BENCH/worker_probe.py <n_exec> <input>"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402

import bench  # noqa: E402
from BENCH import mp_control  # noqa: E402
from universal_parquet_exporter_spark.sources.session import build_session  # noqa: E402

N_MAP = 16
OUT_SCHEMA = "task int, cpu_ms long, wall_ms long, read_ms long, nbytes long"


def _task_body(args):
    """One task: pyarrow row-group reads -> _encode_stream to tmpfs —
    the encode job's map task, instrumented."""
    task_id, items, plan_json, payload_dir = args
    import universal_parquet_exporter_spark  # noqa: F401  (malloc tuning)
    from universal_parquet_exporter_spark.encode.pipeline import (
        _encode_stream,
        _parquet_file,
        _timestamps_to_us,
    )
    from universal_parquet_exporter_spark.plans.partitioning import EncodePlan

    t0, c0 = time.perf_counter(), time.process_time()
    read_s = 0.0
    plan_local = EncodePlan.from_json(plan_json)

    def batches():
        nonlocal read_s
        for path, rg in items:
            r0 = time.perf_counter()
            pf = _parquet_file(path)
            tbl = pf.read_row_group(rg, use_threads=False)
            tbl = _timestamps_to_us(tbl)
            read_s += time.perf_counter() - r0
            yield from tbl.to_batches(max_chunksize=8192)

    nbytes = 0
    for row in _encode_stream(
        batches(), plan_local, np.array([], dtype=np.int64), "url", payload_dir, 32768
    ):
        nbytes += 1
    # CPU-delivery probe: calibrated 100 ms burn inside THIS worker —
    # separates "worker gets slow cores" from "worker does more work"
    b0 = time.perf_counter()
    spins = 0
    while time.perf_counter() - b0 < 0.1:
        spins += sum(range(200))
    try:
        n_aff = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        n_aff = -1
    return {
        "task": task_id,
        "cpu_ms": int((time.process_time() - c0) * 1e3),
        "wall_ms": int((time.perf_counter() - t0) * 1e3),
        "read_ms": int(read_s * 1e3),
        "nbytes": nbytes,
        "spins": spins,
        "n_aff": n_aff,
        "pid": os.getpid(),
    }


def _summarize(label, rows, wall):
    cpu = sorted(r["cpu_ms"] / 1e3 for r in rows)
    tw = sorted(r["wall_ms"] / 1e3 for r in rows)
    rd = sorted(r["read_ms"] / 1e3 for r in rows)
    sp = sorted(r.get("spins", 0) for r in rows)
    print(
        "WPJSON "
        + json.dumps(
            {
                "mode": label,
                "wall": round(wall, 2),
                "task_wall_med": tw[len(tw) // 2],
                "task_wall_max": tw[-1],
                "task_cpu_med": cpu[len(cpu) // 2],
                "task_read_med": rd[len(rd) // 2],
                "cpu_sum": round(sum(cpu), 1),
                "spin_med": sp[len(sp) // 2],
                "spin_min": sp[0],
                "n_aff": sorted({r.get("n_aff") for r in rows}),
                "n_pids": len({r.get("pid") for r in rows}),
            }
        ),
        flush=True,
    )


def main() -> None:
    n_exec = int(sys.argv[1])
    input_parquet = sys.argv[2]
    host_n = os.cpu_count() or 8
    exec_cores = set(range(n_exec))
    driver_cores = set(range(host_n - bench.DRIVER_CORES, host_n))
    try:
        os.sched_setaffinity(0, exec_cores | driver_cores)
    except (AttributeError, OSError):
        pass
    bench._preread(input_parquet)

    items, total_rows = [], 0
    import pyarrow.parquet as pq

    for fn in sorted(os.listdir(input_parquet)):
        if fn.endswith(".parquet"):
            p = os.path.join(input_parquet, fn)
            md = pq.ParquetFile(p).metadata
            total_rows += md.num_rows
            for g in range(md.num_row_groups):
                items.append((p, g))
    plan_json = mp_control._build_plan(items, total_rows).to_json()
    per = (len(items) + N_MAP - 1) // N_MAP
    slices = [items[i * per : (i + 1) * per] for i in range(N_MAP)]

    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="wp_", dir="/dev/shm")

    os.environ["PYTHONPATH"] = REPO_DIR + ":" + os.environ.get("PYTHONPATH", "")
    spark = build_session(
        app_name=f"wp-{n_exec}",
        cpus=n_exec,
        master=f"local-cluster[{n_exec},1,4096]",
        extra_conf={
            "spark.executor.memory": "3g",
            "spark.executorEnv.PYTHONPATH": REPO_DIR,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench._pin_cluster_jvms(n_exec, exec_cores, driver_cores)
    bench.warm_workers(spark, n_exec)
    bench._pin_cluster_jvms(n_exec, exec_cores, driver_cores)

    def spark_run(label):
        pd_dir = os.path.join(work, label)
        os.makedirs(pd_dir, exist_ok=True)

        def mapper(iterator):
            rows = []
            for b in iterator:
                for tid in b.column("task").to_pylist():
                    rows.append(_task_body((tid, slices[tid], plan_json, pd_dir)))
            yield pa.RecordBatch.from_pylist(rows, schema=pa.schema(
                [("task", pa.int32()), ("cpu_ms", pa.int64()), ("wall_ms", pa.int64()),
                 ("read_ms", pa.int64()), ("nbytes", pa.int64())]))

        df = spark.createDataFrame([(i,) for i in range(N_MAP)], "task int").repartition(N_MAP, "task")
        t0 = time.perf_counter()
        rows = [r.asDict() for r in df.mapInArrow(mapper, OUT_SCHEMA).collect()]
        _summarize(f"spark{n_exec}-{label}", rows, time.perf_counter() - t0)
        shutil.rmtree(pd_dir, ignore_errors=True)

    def mp_run(label):
        pd_dir = os.path.join(work, label)
        os.makedirs(pd_dir, exist_ok=True)
        ctx = mp.get_context("spawn")
        with ctx.Pool(n_exec, initializer=_pin_child, initargs=(tuple(exec_cores),)) as pool:
            pool.map(mp_control._warm, range(n_exec))
            t0 = time.perf_counter()
            rows = pool.map(
                _task_body,
                [(i, slices[i], plan_json, pd_dir) for i in range(N_MAP)],
            )
            _summarize(f"mp{n_exec}-{label}", rows, time.perf_counter() - t0)
        shutil.rmtree(pd_dir, ignore_errors=True)

    # warm spark pass, then interleave
    spark_run("w")
    for r in range(2):
        mp_run(f"a{r}")
        spark_run(f"a{r}")
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


def _pin_child(cores):
    try:
        os.sched_setaffinity(0, set(cores))
    except (AttributeError, OSError):
        pass


if __name__ == "__main__":
    main()

"""Decompose the 8-executor slowdown: time a SCAN-ONLY stage (JVM
parquet read -> Arrow -> python pass-through, no encode) and an
ENCODE-FROM-SCAN stage on the same input/topology, with per-task
metrics.  Usage: python BENCH/scan_probe.py <n_exec> <input> [local]"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

import pyarrow as pa  # noqa: E402

import bench  # noqa: E402
from universal_parquet_exporter_spark.sources.session import build_session  # noqa: E402


def main() -> None:
    n_exec = int(sys.argv[1])
    input_parquet = sys.argv[2]
    single_jvm = len(sys.argv) > 3 and sys.argv[3] == "local"
    n_map = 16

    host_n = os.cpu_count() or 8
    exec_cores = set(range(n_exec))
    driver_cores = set(range(host_n - bench.DRIVER_CORES, host_n))
    try:
        os.sched_setaffinity(0, exec_cores | driver_cores)
    except (AttributeError, OSError):
        pass
    bench._preread(input_parquet)

    os.environ["PYTHONPATH"] = REPO_DIR + ":" + os.environ.get("PYTHONPATH", "")
    if single_jvm:
        spark = build_session(app_name=f"scan-local-{n_exec}", cpus=n_exec)
        try:
            os.sched_setaffinity(0, exec_cores | driver_cores)
        except (AttributeError, OSError):
            pass
    else:
        spark = build_session(
            app_name=f"scan-lc-{n_exec}",
            cpus=n_exec,
            master=f"local-cluster[{n_exec},1,4096]",
            extra_conf={
                "spark.executor.memory": "3g",
                "spark.executorEnv.PYTHONPATH": REPO_DIR,
            },
        )
        bench._pin_cluster_jvms(n_exec, exec_cores, driver_cores)
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_workers(spark, n_exec)
    if not single_jvm:
        bench._pin_cluster_jvms(n_exec, exec_cores, driver_cores)

    out_schema = "nbytes long, cpu_ms long, wall_ms long"

    def passthrough(it):
        t0 = time.perf_counter()
        c0 = time.process_time()
        nb = 0
        for b in it:
            nb += b.nbytes
        yield pa.RecordBatch.from_pydict(
            {
                "nbytes": [nb],
                "cpu_ms": [int((time.process_time() - c0) * 1e3)],
                "wall_ms": [int((time.perf_counter() - t0) * 1e3)],
            }
        )

    df = spark.read.parquet(input_parquet).repartition(n_map)
    # warm pass
    df.mapInArrow(passthrough, out_schema).collect()
    for rep in range(2):
        t0 = time.perf_counter()
        rows = df.mapInArrow(passthrough, out_schema).collect()
        wall = time.perf_counter() - t0
        nb = sum(r.nbytes for r in rows)
        cpu = sorted(r.cpu_ms / 1e3 for r in rows)
        twall = sorted(r.wall_ms / 1e3 for r in rows)
        print(
            "SCANJSON "
            + json.dumps(
                {
                    "mode": "local" if single_jvm else "lc",
                    "n_exec": n_exec,
                    "rep": rep,
                    "wall": round(wall, 2),
                    "gbps": round(nb / wall / 1e9, 3),
                    "task_wall_med": twall[len(twall) // 2],
                    "task_wall_max": twall[-1],
                    "task_pycpu_med": cpu[len(cpu) // 2],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()

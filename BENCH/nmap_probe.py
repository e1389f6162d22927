"""Does task granularity fix the 8-executor variance?  One pinned
local-cluster[8] session; alternate timed encodes at map_tasks 16 / 48
with a capacity probe before each.  Straggler amplification at 2
waves/slot predicts: n_map=48 (6 waves/slot) has tighter reps and a
higher median.  Usage: python BENCH/nmap_probe.py <input> [n_exec]"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

import bench  # noqa: E402
from universal_parquet_exporter_spark.sources.session import build_session  # noqa: E402


def main() -> None:
    input_parquet = sys.argv[1]
    n_exec = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    host_n = os.cpu_count() or 8
    exec_cores = set(range(n_exec))
    driver_cores = set(range(host_n - bench.DRIVER_CORES, host_n))
    try:
        os.sched_setaffinity(0, exec_cores | driver_cores)
    except (AttributeError, OSError):
        pass
    bench._preread(input_parquet)
    work = tempfile.mkdtemp(prefix="nmap_", dir="/dev/shm")

    os.environ["PYTHONPATH"] = REPO_DIR + ":" + os.environ.get("PYTHONPATH", "")
    spark = build_session(
        app_name=f"nmap-{n_exec}",
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
    warm = bench.encode_bench(spark, input_parquet, work, "w", map_tasks=16)
    shutil.rmtree(warm["output_dir"], ignore_errors=True)

    out: dict[int, list] = {16: [], 48: []}
    for rep in range(4):
        for nm in (16, 48):
            os.sync()
            try:
                os.sched_setaffinity(0, exec_cores)
            except OSError:
                pass
            cap = bench.host_capacity(n_exec)
            try:
                os.sched_setaffinity(0, driver_cores)
            except OSError:
                pass
            m = bench.encode_bench(spark, input_parquet, work, f"r{rep}n{nm}", map_tasks=nm)
            shutil.rmtree(m["output_dir"], ignore_errors=True)
            out[nm].append((m["gbps"], round(cap)))
            print(f"NMAP rep={rep} n_map={nm} gbps={m['gbps']} cap={round(cap)}", flush=True)
    print("NMAPJSON " + json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""A/B: work-list distribution "rdd" (parallelize+createDataFrame — a
python unpickle runner chained into the encode stage) vs "range"
(JVM-native range source + broadcast items), alternating in one pinned
local-cluster session.
Usage: python BENCH/workdist_ab.py <input> [n_exec] [reps]"""

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
from universal_parquet_exporter_spark.encode.pipeline import (  # noqa: E402
    EncodeJobConfig,
    encode_parquet_job,
)
from universal_parquet_exporter_spark.sources.session import build_session  # noqa: E402


def main() -> None:
    input_parquet = sys.argv[1]
    n_exec = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    host_n = os.cpu_count() or 8
    exec_cores = set(range(n_exec))
    driver_cores = set(range(host_n - bench.DRIVER_CORES, host_n))
    try:
        os.sched_setaffinity(0, exec_cores | driver_cores)
    except (AttributeError, OSError):
        pass
    bench._preread(input_parquet)
    work = tempfile.mkdtemp(prefix="pfab_", dir="/dev/shm")
    os.environ["PYTHONPATH"] = REPO_DIR + ":" + os.environ.get("PYTHONPATH", "")
    spark = build_session(
        app_name="pfab",
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

    out: dict[str, list] = {"rdd": [], "range": []}
    first = True
    for rep in range(reps):
        for mode in ("rdd", "range"):
            os.sync()
            d = os.path.join(work, f"r{rep}m{mode}")
            cfg = EncodeJobConfig(
                output_dir=d, target_unit_bytes=64 << 20, map_tasks=16, work_dist=mode
            )
            t0 = time.perf_counter()
            m = encode_parquet_job(spark, input_parquet, cfg)
            gbps = m["bytes_in"] / m["encode_stage_sec"] / 1e9
            shutil.rmtree(d, ignore_errors=True)
            if first:
                first = False  # discard the cold first run
            else:
                out[mode].append(round(gbps, 4))
            print(f"WDAB rep={rep} mode={mode} gbps={gbps:.4f} stage={m['encode_stage_sec']:.2f}", flush=True)
    print("WDABJSON " + json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Where do slow 8-executor encode samples spend their time?  Runs the
REAL encode_parquet_job repeatedly in one local-cluster[8] session;
for each sample, splits per-task duration (REST task metrics) into
codec-serialize time (manifest wall_ms summed per payload file = per
task) and 'other' (pyarrow read + arrow slicing + stats + idle).
Usage: python BENCH/stall_probe.py <input> [n_reps]"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request
from collections import defaultdict

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

import bench  # noqa: E402
from universal_parquet_exporter_spark.sources.session import build_session  # noqa: E402


def _rest(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    input_parquet = sys.argv[1]
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_exec, n_map = 8, 16
    host_n = os.cpu_count() or 8
    exec_cores = set(range(n_exec))
    driver_cores = set(range(host_n - bench.DRIVER_CORES, host_n))
    try:
        os.sched_setaffinity(0, exec_cores | driver_cores)
    except (AttributeError, OSError):
        pass
    bench._preread(input_parquet)
    import tempfile

    work = tempfile.mkdtemp(prefix="stall_", dir="/dev/shm")
    os.environ["PYTHONPATH"] = REPO_DIR + ":" + os.environ.get("PYTHONPATH", "")
    spark = build_session(
        app_name="stall-8",
        cpus=n_exec,
        master=f"local-cluster[{n_exec},1,4096]",
        extra_conf={
            "spark.executor.memory": "3g",
            "spark.executorEnv.PYTHONPATH": REPO_DIR,
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench._pin_cluster_jvms(n_exec, exec_cores, driver_cores)
    bench.warm_workers(spark, n_exec)
    bench._pin_cluster_jvms(n_exec, exec_cores, driver_cores)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    seen_stages = set()
    for rep in range(n_reps):
        os.sync()
        bw = bench.host_bandwidth(n_exec)
        m = bench.encode_bench(spark, input_parquet, work, f"r{rep}", map_tasks=n_map)
        out = m.pop("output_dir")
        # codec-serialize seconds per task (= per payload file)
        from pyspark.sql import functions as F

        man = (
            spark.read.parquet(os.path.join(out, "data"))
            .groupBy("file")
            .agg(F.sum("wall_ms").alias("ser_ms"))
            .collect()
        )
        ser = sorted(r.ser_ms / 1e3 for r in man)
        shutil.rmtree(out, ignore_errors=True)
        stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        cand = [
            s for s in stages
            if s.get("numCompleteTasks") == n_map and s["stageId"] not in seen_stages
            and "parquet" in (s.get("name") or "")
        ]
        cand.sort(key=lambda s: -s["stageId"])
        row = {
            "rep": rep,
            "gbps": m["gbps"],
            "stage_sec": m["stage_sec"],
            "bw_probe": round(bw, 1),
            "ser_med": round(ser[len(ser) // 2], 2),
            "ser_max": round(ser[-1], 2),
        }
        if cand:
            sid = cand[0]["stageId"]
            seen_stages.update(s["stageId"] for s in stages)
            det = _rest(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}/0?details=true&taskStatus=SUCCESS"
            )
            tasks = list(det.get("tasks", {}).values())
            dur = sorted(t["duration"] / 1e3 for t in tasks)
            row["task_dur_med"] = round(dur[len(dur) // 2], 2)
            row["task_dur_max"] = round(dur[-1], 2)
            row["other_med"] = round(row["task_dur_med"] - row["ser_med"], 2)
        print("STALLJSON " + json.dumps(row), flush=True)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

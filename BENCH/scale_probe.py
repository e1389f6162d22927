"""Diagnostic: WHERE does the 8-executor encode stage lose time?

Runs one local-cluster leg exactly like bench.py's scaling harness
(same pinning, same warm-up, same fixture, payload on tmpfs), then
pulls TASK-LEVEL metrics from the Spark UI REST API for the timed
encode stage: per-task duration, executorRunTime, schedulerDelay,
launch-time gaps, deserialize time, and the stage's wall vs the
busiest-slot busy time.  This separates

  - per-task slowdown (CPU/memory contention: tasks themselves slower)
  - scheduling/launch overhead (gaps between waves)
  - straggler tail (max-task >> median-task in the last wave)

Usage: python BENCH/scale_probe.py <n_exec> <input_parquet> <workdir>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

import bench  # noqa: E402  (pinning + session helpers)
from universal_parquet_exporter_spark.sources.session import build_session  # noqa: E402


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    n_exec = int(sys.argv[1])
    input_parquet = sys.argv[2]
    workdir = sys.argv[3]
    n_map = int(os.environ.get("PROBE_N_MAP", "16"))

    host_n = os.cpu_count() or 8
    exec_cores = set(range(n_exec))
    driver_cores = set(range(host_n - bench.DRIVER_CORES, host_n))
    try:
        os.sched_setaffinity(0, exec_cores | driver_cores)
    except (AttributeError, OSError):
        pass
    bench._preread(input_parquet)
    os.sync()

    os.environ["PYTHONPATH"] = REPO_DIR + ":" + os.environ.get("PYTHONPATH", "")
    spark = build_session(
        app_name=f"upes-probe-{n_exec}",
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
    warm = bench.encode_bench(spark, input_parquet, workdir, f"warm{n_exec}", map_tasks=n_map)
    import shutil

    shutil.rmtree(warm["output_dir"], ignore_errors=True)

    t0 = time.perf_counter()
    m = bench.encode_bench(spark, input_parquet, workdir, f"probe{n_exec}", map_tasks=n_map)
    wall = time.perf_counter() - t0
    shutil.rmtree(m["output_dir"], ignore_errors=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    # the encode stage: the one with n_map tasks and the largest input
    cand = [s for s in stages if s.get("numCompleteTasks") == n_map]
    cand.sort(key=lambda s: -(s.get("inputBytes") or 0))
    out = {"n_exec": n_exec, "stage_sec": m["stage_sec"], "gbps": m["gbps"], "wall": round(wall, 2)}
    report = [out]
    for s in cand[:2]:
        sid = s["stageId"]
        det = _rest(
            f"{ui}/api/v1/applications/{app_id}/stages/{sid}/0?details=true&taskStatus=SUCCESS"
        )
        tasks = list(det.get("tasks", {}).values())
        tasks.sort(key=lambda t: t["launchTime"])
        lt = [t["launchTime"] for t in tasks]
        dur = [t["duration"] / 1e3 for t in tasks]
        tm = [t.get("taskMetrics") or {} for t in tasks]
        run = [x.get("executorRunTime", 0) / 1e3 for x in tm]
        deser = [x.get("executorDeserializeTime", 0) / 1e3 for x in tm]
        gc = [x.get("jvmGcTime", 0) / 1e3 for x in tm]
        # python worker time lives inside executorRunTime for mapInArrow
        from datetime import datetime

        def _ms(s_):
            return datetime.strptime(s_[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        launch = [_ms(x) for x in lt]
        finish = [l + d for l, d in zip(launch, dur)]
        span = max(finish) - min(launch)
        busy_total = sum(dur)
        report.append(
            {
                "stage": sid,
                "name": s.get("name", "")[:60],
                "n_tasks": len(tasks),
                "span_sec": round(span, 2),
                "slot_busy_frac": round(busy_total / (span * n_exec), 3),
                "dur_min": round(min(dur), 2),
                "dur_med": round(sorted(dur)[len(dur) // 2], 2),
                "dur_max": round(max(dur), 2),
                "run_med": round(sorted(run)[len(run) // 2], 2),
                "deser_max": round(max(deser), 2),
                "gc_sum": round(sum(gc), 2),
                "sched_delay_est": round(sum(d - r for d, r in zip(dur, run)), 2),
                "launch_spread": round(max(launch) - min(launch), 2),
                "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                "first_finish_to_last": round(max(finish) - min(finish), 2),
            }
        )
    print("PROBEJSON " + json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()

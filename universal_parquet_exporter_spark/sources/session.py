"""SparkSession construction — the engine's analog of the reference's
connection layer (``/root/reference/src/database/mysql_connection.py:6-22``,
``sqlserver_connection.py:9-27``): one configured session object instead of
DB-API connections.

Defaults are scale-oriented: AQE on (runtime skew-join splitting and
partition coalescing), Arrow transfer on (all our UDFs are vectorized),
shuffle partitions sized to the local core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "universal-parquet-exporter-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a local[n] session; on a real cluster the same confs apply and
    ``master`` is supplied by spark-submit (BASELINE.md launch mode)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # keep glibc from mmap-thrashing in Python workers (see memtune.py)
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "2147483647")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "2147483647")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def warm_workers(spark: SparkSession, cpus: int, mb_per_worker: int = 192) -> None:
    """Touch every Python worker once: import the engine, compile/load the
    native kernels, and fault-in a working set.  On fault-expensive kernels
    the first big allocation in a fresh worker costs seconds; steady-state
    throughput (the thing a 1000-executor job lives in) needs warm arenas.
    One O(seconds) job, run before any timed work."""

    def gen(iterator):
        import numpy as np
        import pyarrow as pa

        from ..codecs import fsst_encode, fsst_train

        scratch = np.zeros((mb_per_worker << 20) // 8, dtype=np.int64)
        scratch[::512] = 1  # fault-in
        sample = (b"warm up the symbol table builder " * 64)[:2048]
        tbl = fsst_train(sample)
        fsst_encode(sample * 16, tbl)
        for batch in iterator:
            yield pa.RecordBatch.from_pydict({"id": batch.column(0)})

    spark.range(cpus * 4, numPartitions=cpus * 4).mapInArrow(gen, "id long").count()

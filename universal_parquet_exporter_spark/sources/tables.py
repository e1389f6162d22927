"""Table readers over the driver-provided parquet test data (TESTDATA.md)
and Iceberg-style layouts.

The reference reads from MySQL/SQL Server via SQL pass-through
(``/root/reference/src/query/query_executor.py:18-26``); this engine reads
columnar files directly — `spark.read.parquet` here, a one-line swap to
``spark.read.format("iceberg")`` on a real catalog (SURVEY.md §7 Phase 0).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every parquet table under ``sf_dir`` as a DataFrame."""
    out = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register temp views so ``spark.sql`` (CTEs etc.) works."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables

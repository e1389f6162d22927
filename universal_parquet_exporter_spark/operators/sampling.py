"""Deterministic stratified sampling for training-data mixing: keep a
per-stratum fraction of documents (e.g. downsample the dominant language)
chosen by a content-independent hash bucket, never ``rand()`` — a
resumable 100 TB job must re-elect exactly the same sample on every
retry and at every partitioning, and the bucket rule must be
reproducible in any engine (the DuckDB oracle mirrors it verbatim).

Scale shape: the sampler is one narrow whole-stage-codegen filter — no
shuffle, no Python, no state — so it composes for free in front of any
downstream operator at any corpus size."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# percent kept per stratum; absent strata keep everything.  en is the
# dominant language in the fixture (218/500) — the classic mix rebalance.
SAMPLE_RATES = {"en": 40, "zh": 60}
DEFAULT_RATE = 100


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def sample_bucket(id_col):
    """Deterministic 0-99 bucket: first 8 hex chars of md5 of the row id
    rendered as a string.  Uniform, stable across runs/partitionings,
    and bit-identical in DuckDB."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long") % 100
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int] | None = None,
    default_rate: int = DEFAULT_RATE,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows whose bucket falls under their stratum's keep-rate."""
    rates = SAMPLE_RATES if rates is None else rates
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.filter(sample_bucket(F.col(id_col)) < rate)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixed corpus after per-language downsampling, with the bucket
    exposed so the oracle value-checks the election itself."""
    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang").select(
        "doc_id", "lang", sample_bucket(F.col("doc_id")).alias("bucket")
    )

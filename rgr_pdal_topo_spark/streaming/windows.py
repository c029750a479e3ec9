"""Structured Streaming surface (SURVEY.md §2.10 — Spark-native addition;
the reference is strictly batch).

The batch query ``events_hourly`` (queries.py) and the streaming plan here
are the SAME logical aggregation — tumbling 1-hour windows over ``ts`` —
so streaming results can be asserted equal to the batch result once the
stream drains (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over the events parquet directory."""
    schema = spark.read.parquet(events_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window aggregation with a watermark for late data."""
    # watermarks need TIMESTAMP (the driver tables carry TIMESTAMP_NTZ);
    # the session timezone is pinned to UTC so the cast is value-preserving
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "sum_value"
        )
    )


def run_to_memory(stream_df: DataFrame, name: str = "hourly",
                  output_mode: str = "complete") -> DataFrame:
    """Drain the stream into an in-memory sink and return the result
    table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.table(name)


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (merge semantics) over the event stream —
    the Structured-Streaming twin of the batch ``sessionize`` query,
    spelled with the built-in ``session_window`` so Spark manages the
    interval-merge state (no custom applyInPandasWithState needed).

    Boundary contract (pinned by a planted test): a session's end is
    ``last_ts + gap`` and an event with ``ts <= end`` MERGES — i.e. an
    event landing EXACTLY ``gap`` after the previous one extends the
    session, and only ``ts > prev + gap`` opens a new one.  That is the
    SAME closed boundary as the batch sessionize oracle's lag spelling,
    so per-user session counts from the drained stream equal the
    sessionize query's ``n_sessions`` exactly
    (tests/test_pipeline_extras.py).

    Scale shape: state is one (start, end, n) interval per OPEN session,
    hash-partitioned by user across the state stores; the watermark
    closes sessions older than ``max(event time) - delay``, so state is
    bounded by users active inside the watermark horizon, not history.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )

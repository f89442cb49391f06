"""Structured Streaming analog of the reference's block loop.

The reference is a batch program whose main loop is a faithful
micro-batch stream (SURVEY.md §2.9): tumbling blocks with a progress
watermark (`dragnet.cu:234,328-330`).  This module re-expresses the
streamable cleaning statistics as a real Structured Streaming job over
the events table: event-time tumbling windows with a watermark for late
data, computing the zero-DM sum (A1, `mask.c:582-588`) and the
spectral-kurtosis sums (A6, `skz.c:460-480`) per window.

Batch/stream parity: :func:`windowed_stats` builds the identical
aggregation on a batch DataFrame, and the test asserts the streamed
result (``availableNow`` trigger, complete mode) equals it row-for-row
— Spark's unified Dataset API makes the plan the same either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

NDEG = 12.0  # SK degrees-of-freedom factor (skz.c nd)


def windowed_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window stats: zero-DM sum + SK estimator per
    (window, channel=user_id)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    # Exact decimal sums: engine- and plan-independent (stream == batch
    # == DuckDB oracle regardless of float association order).
    dec = F.col("value").cast("decimal(18,2)")
    g = (events.groupBy(F.window("ts", window).alias("w"),
                        F.col("user_id").alias("chan"))
         .agg(F.sum(dec).cast("double").alias("s1"),
              F.sum(dec * dec).cast("double").alias("s2"),
              F.count(F.lit(1)).alias("m")))
    md = F.col("m").cast("double")
    # Guard m=1 / s1=0 groups (skz.c masks those as NaN; SQL NULL here).
    sk = F.when(
        (F.col("m") > 1) & (F.col("s1") != 0.0),
        (md * NDEG + 1.0) / (md - 1.0) * (md * F.col("s2")
                                          / (F.col("s1") * F.col("s1"))
                                          - 1.0))
    return g.select(F.col("w.start").alias("window_start"), "chan", "m",
                    F.round("s1", 6).alias("zero_dm"),
                    F.round(sk, 6).alias("sk"))


def stream_events(spark: SparkSession, sf_dir: str,
                  watermark: str = "2 hours") -> DataFrame:
    """File-source stream over the events parquet (at scale: a Kafka /
    Iceberg CDC source) with an event-time watermark for late rows."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    # parquet stores TIMESTAMP_NTZ; event-time watermarks need TIMESTAMP.
    return (raw.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark))


def run_streaming_stats(spark: SparkSession, sf_dir: str,
                        table: str = "stream_stats") -> DataFrame:
    """Run the windowed stats over the file stream to completion
    (availableNow trigger) and return the materialized result."""
    q = (windowed_stats(stream_events(spark, sf_dir))
         .writeStream.format("memory").queryName(table)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table)

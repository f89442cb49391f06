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


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Streaming exact deduplication via
    ``dropDuplicatesWithinWatermark`` on the event key: Spark keeps one
    state-store entry per key and evicts it once the watermark passes
    the entry's event time, so the dedup state really is bounded by the
    lateness horizon instead of the stream's full key history (plain
    ``dropDuplicates(['event_id'])`` would never evict, because the
    event-time column is not part of the dedup key — r3 ADVICE).
    Semantics: duplicates are suppressed when they arrive within the
    watermark delay of the first occurrence — exactly the at-least-once
    ingestion window the operator exists for.  Counts per event_type so
    the result is a small deterministic relation."""
    return (events.dropDuplicatesWithinWatermark(["event_id"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique")))


def run_streaming_dedup(spark: SparkSession, sf_dir: str,
                        table: str = "stream_dedup") -> DataFrame:
    """Run the watermarked streaming dedup to completion (availableNow)
    and return the materialized result."""
    q = (streaming_dedup(stream_events(spark, sf_dir))
         .writeStream.format("memory").queryName(table)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table)


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


# --------------------------------------------------------------------------
# Stateful streaming clipper (W1): EWMA state across micro-batches
# --------------------------------------------------------------------------

from pyspark.sql.types import (ArrayType, BinaryType, DoubleType,  # noqa: E402
                               IntegerType, StringType, StructField,
                               StructType)

BLOCK_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("block_id", IntegerType(), False),
    StructField("payload", BinaryType(), False),
])

CLIP_OUT_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("block_id", IntegerType(), False),
    StructField("n_clipped", IntegerType(), False),
    StructField("running_avg", DoubleType(), False),
    StructField("running_std", DoubleType(), False),
])

# float32 state round-trips through double EXACTLY (f32->f64->f32 is
# lossless), so streamed results are bit-identical to the batch loop.
CLIP_STATE_SCHEMA = StructType([
    StructField("running_avg", DoubleType(), False),
    StructField("running_std", DoubleType(), False),
    StructField("chan_avg", ArrayType(DoubleType()), False),
    StructField("blocksread", IntegerType(), False),
])


def streaming_clipper(blocks: DataFrame, clip_sigma: float,
                      nchan: int) -> DataFrame:
    """The reference's time-domain clipper (W1, ``mask.c:556-677``) as
    a real stateful streaming operator: the EWMA running state that the
    C code keeps in function statics (``mask.c:564-566``) lives in the
    streaming state store, keyed by doc_id, and survives across
    micro-batches — blocks of one document arriving in later triggers
    continue the same recursion.  Within a micro-batch, a group's
    blocks are processed in block_id order (the stream's analog of the
    reference's sequential read order)."""
    import numpy as np
    import pandas as pd

    def fn(key, pdfs, state):
        from .kernels import ClipState, clip_times
        if state.exists:
            ra, rs, ca, br = state.get
            st = ClipState(np.float32(ra), np.float32(rs),
                           np.asarray(ca, dtype=np.float32), int(br))
        else:
            st = ClipState()
        # Materialize the whole group before processing: a group's rows
        # arrive as MULTIPLE Arrow chunks in shuffle order (>10k-row
        # chunks, or interleaved delivery), so sorting each chunk
        # independently could chain the order-sensitive EWMA recursion
        # out of block order.  Block payloads are modest (the clipper
        # is per-block metadata scale, not giant-doc scale), so the
        # concat is bounded by the group's micro-batch slice.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        rows = []
        for r in pdf.sort_values("block_id").itertuples(index=False):
            data = np.frombuffer(bytes(r.payload), np.uint8) \
                .reshape(-1, nchan).astype(np.float32)
            levels = np.zeros(nchan, dtype=np.float32)
            ncl = clip_times(data, clip_sigma, levels, st)
            rows.append((key[0], int(r.block_id), int(ncl),
                         float(st.running_avg), float(st.running_std)))
        state.update((float(st.running_avg), float(st.running_std),
                      [float(v) for v in st.chan_running_avg],
                      int(st.blocksread)))
        yield pd.DataFrame(rows, columns=[f.name for f in CLIP_OUT_SCHEMA])

    from pyspark.sql.streaming.state import GroupStateTimeout
    return blocks.groupBy("doc_id").applyInPandasWithState(
        fn, CLIP_OUT_SCHEMA, CLIP_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)

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
    # `+ 0.0` normalizes a -0.0 to +0.0 (IEEE round-to-nearest; NULLs
    # pass through): ROUND of a tiny negative double keeps the sign in
    # DuckDB (C round) but not in Spark (BigDecimal HALF_UP), so a
    # window whose sk lands at -1e-15 would bit-mismatch the oracle on
    # the zero's sign alone (first seen at sf0.1).  Both sides apply
    # the same normalization.
    return g.select(F.col("w.start").alias("window_start"), "chan", "m",
                    (F.round("s1", 6) + F.lit(0.0)).alias("zero_dm"),
                    (F.round(sk, 6) + F.lit(0.0)).alias("sk"))


def stream_events(spark: SparkSession, sf_dir: str,
                  watermark: str = "2 hours") -> DataFrame:
    """File-source stream over the events parquet (at scale: a Kafka /
    Iceberg CDC source) with an event-time watermark for late rows."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # events.parquet comes in two shapes and FileStreamSource accepts
    # neither universally: when it is a DIRECTORY of part files (any
    # Spark-written table), pathGlobFilter="events.parquet" over
    # sf_dir silently matches ZERO data files (they are named
    # part-*.parquet) and the stream is empty with no error; when it
    # is a single FILE (the driver's testdata), streaming the path
    # itself fails with "Option 'basePath' must be a directory".
    # Stream the directory directly, or the parent + an exact-name
    # glob filter for the single-file layout.  The layout probe goes
    # through the Hadoop FileSystem of the path's own scheme — a
    # driver-local os.path.isdir would return False for every
    # s3a://-or-hdfs:// URI and silently re-enter the zero-match glob
    # branch on exactly the remote sources this is meant for.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.getFileStatus(hpath).isDirectory():
        raw = spark.readStream.schema(schema).parquet(path)
    else:
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


def streaming_sessions(events: DataFrame, gap: str = "4 hours") -> DataFrame:
    """Native session windows: ``F.session_window`` merges an event
    into the current session while its gap to the previous event is
    under ``gap``, closing the window ``gap`` after the last event —
    the streaming form of :func:`dragnet_spark.queries.
    q_events_sessionize` (which computes the same sessions with lag +
    running-sum windows in batch; ``session_window`` MERGES an event
    exactly gap after its predecessor — probed on Spark 4.1.2 — so the
    batch predicate is strict ``> gap`` and the two forms agree
    row-for-row INCLUDING events exactly gap
    apart).  State per (user, open session) is
    evicted once the watermark passes the session close, so memory is
    bounded by the lateness horizon times the active-user count, not
    the stream's history — the property the batch window form cannot
    offer.  Sums go through DECIMAL(18,2) so stream == batch exactly."""
    dec = F.col("value").cast("decimal(18,2)")
    return (events.groupBy(F.session_window("ts", gap).alias("w"),
                           "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts"),
                 F.sum(dec).cast("double").alias("sum_value")))


def run_streaming_sessions(spark: SparkSession, sf_dir: str,
                           table: str = "stream_sessions",
                           gap: str = "4 hours") -> DataFrame:
    """Run the session-window aggregation over the file stream to
    completion (availableNow trigger) and return the result."""
    q = (streaming_sessions(stream_events(spark, sf_dir), gap)
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
                               IntegerType, LongType, StringType,
                               StructField, StructType)

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
                      nchan: int,
                      idle_timeout_ms: int | None = None) -> DataFrame:
    """The reference's time-domain clipper (W1, ``mask.c:556-677``) as
    a real stateful streaming operator: the EWMA running state that the
    C code keeps in function statics (``mask.c:564-566``) lives in the
    streaming state store, keyed by doc_id, and survives across
    micro-batches — blocks of one document arriving in later triggers
    continue the same recursion.  Within a micro-batch, a group's
    blocks are processed in block_id order (the stream's analog of the
    reference's sequential read order).

    The block stream carries no end-of-document marker, so on a
    long-running (continuous-trigger) deployment state would grow with
    the stream's total document count; pass ``idle_timeout_ms`` there
    to evict a document's EWMA entry once it stops sending blocks for
    that much processing time.  Eviction emits a MARKER row
    (``block_id = -1``, ``n_clipped = -1``, the final running stats)
    so downstream can tell the recursion was severed: blocks of that
    document arriving after the eviction restart the EWMA from scratch
    (new-document semantics), and without the marker their output
    would be indistinguishable from unbroken-parity rows.  The default
    (``None`` = ``NoTimeout``) is REQUIRED for
    ``availableNow``/one-shot runs: with a processing-time timeout
    registered, Spark keeps scheduling no-data micro-batches until
    every pending timeout fires, so an ``availableNow`` query with a
    long idle timeout never terminates (observed on Spark 4.1.2:
    batchId past 140 with ``numInputRows=0`` after the two data
    batches)."""
    import numpy as np
    import pandas as pd

    def fn(key, pdfs, state):
        from .kernels import ClipState, clip_times
        if state.hasTimedOut:
            ra, rs, ca, br = state.get
            state.remove()          # idle doc: evict the EWMA entry
            yield pd.DataFrame(
                [(key[0], -1, -1, float(ra), float(rs))],
                columns=[f.name for f in CLIP_OUT_SCHEMA])
            return
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
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(rows, columns=[f.name for f in CLIP_OUT_SCHEMA])

    from pyspark.sql.streaming.state import GroupStateTimeout
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_timeout_ms is not None
               else GroupStateTimeout.NoTimeout)
    return blocks.groupBy("doc_id").applyInPandasWithState(
        fn, CLIP_OUT_SCHEMA, CLIP_STATE_SCHEMA, "append", timeout)


# --------------------------------------------------------------------------
# Stateful streaming dedisperse (W3): the reference's FULL block loop as
# a streaming operator — halo tail + clipper EWMA live in the state store
# --------------------------------------------------------------------------

STRIP_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("header", StringType(), False),
    StructField("strip_offset", LongType(), False),   # absolute raw sample
    StructField("payload", BinaryType(), False),
])

DEDISP_OUT_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("block_seq", IntegerType(), False),
    StructField("dm_index", IntegerType(), False),
    StructField("out_offset", LongType(), False),     # dedispersed sample pos
    StructField("series", BinaryType(), True),        # float32 LE chunk
    StructField("metrics", StringType(), True),       # done row: counters
])

# State = exactly what the reference keeps between block-loop iterations
# (dragnet.cu:237-330): the unconsumed raw tail (halo, max_delay*ndec
# samples + any partial strip), the loop cursors, the counters, and the
# clipper's EWMA statics (mask.c:564-566).  Bounded by
# O(blocksize * nchan) bytes per in-flight document regardless of
# document length — the property that lets an unbounded stream of giant
# documents run in fixed executor memory.
DEDISP_STATE_SCHEMA = StructType([
    StructField("isamp", LongType(), False),          # next block start
    StructField("nread", LongType(), False),          # samples received
    StructField("opos", LongType(), False),           # output samples emitted
    StructField("buf", BinaryType(), False),          # bytes from isamp on
    StructField("n_blocks", IntegerType(), False),
    StructField("n_clipped", LongType(), False),
    StructField("n_sk", LongType(), False),
    StructField("done", IntegerType(), False),
    StructField("clip_avg", DoubleType(), False),
    StructField("clip_std", DoubleType(), False),
    StructField("clip_chan", ArrayType(DoubleType()), False),
    StructField("clip_blocks", IntegerType(), False),
])


# Per-executor memo for the driver-side objects every group needs:
# without it, EVERY document group in EVERY micro-batch re-parses the
# header/cfg/mask JSON and re-solves the whole plan (delay matrix, SK
# limits, mask inversion) — pure repeated CPU for the life of the
# stream.  Keyed by the exact JSON triple; bounded (cleared at 64
# entries — far above any real header/config variety per job).
_PLAN_MEMO: dict = {}


def _memo_plan(header_json: str, cfg_json: str, mask_json):
    from .params import Header, MaskSpec, RunConfig
    from .plan import build_plan

    key = (header_json, cfg_json, mask_json)
    hit = _PLAN_MEMO.get(key)
    if hit is None:
        if len(_PLAN_MEMO) >= 64:
            _PLAN_MEMO.clear()
        header = Header.from_json(header_json)
        cfg_l = RunConfig.from_json(cfg_json)
        mask_l = MaskSpec.from_json(mask_json) if mask_json else None
        hit = (header, cfg_l, build_plan(header, cfg_l, mask_l))
        _PLAN_MEMO[key] = hit
    return hit


def streaming_dedisperse(strips: DataFrame, cfg, mask=None,
                         idle_timeout_ms: int | None = None) -> DataFrame:
    """The reference's ENTIRE main loop (W3, ``dragnet.cu:237-330``) as
    a stateful streaming operator: raw-sample strips of a document
    arrive across micro-batches (in offset order, arbitrary strip
    sizes); each time the state buffer holds a full block (or the
    document's tail), one block-loop iteration runs — the SAME
    :func:`dragnet_spark.kernels.process_block` the batch pipeline
    executes, so streamed output is bit-identical to
    :func:`run_pipeline` by construction — and the per-DM dedispersed
    chunk is appended downstream.

    Unlike the chunked batch path (which forbids the clipper), this
    form supports EVERY config including ``clip_sigma > 0``: the
    sequential EWMA state (``mask.c:564-566``) lives in the state
    store next to the halo tail, exactly as the C statics live across
    ``fread`` calls.  A final row per document (``dm_index = -1``)
    carries the batch-identical metrics JSON, after which the
    document's state is REMOVED — state is bounded by the in-flight
    (not total) document count.  At-least-once redelivery is handled
    idempotently at every point in a document's life: duplicates of
    IN-FLIGHT data (strips at or behind the consume cursor, including
    re-striped overlaps) are skipped during ingestion, post-completion
    replays of mid-document strips via the no-state-at-offset>0
    heuristic, and — when ``idle_timeout_ms`` is set — FULL offset-0
    replays too, via a tiny completed-doc tombstone (done flag, no
    halo buffer) kept for one TTL window before the timeout evicts it.
    Only a genuine GAP (an offset past the cursor: lost data) raises.

    On a long-running (continuous-trigger) deployment, additionally
    pass ``idle_timeout_ms``: a document that stalls mid-stream for
    that much processing time is evicted with a ``"truncated": true``
    metrics row, so abandoned partial documents cannot pin their halo
    buffers forever.  The default (``None`` = ``NoTimeout``) is
    REQUIRED for ``availableNow``/one-shot runs — with a
    processing-time timeout registered, Spark keeps scheduling no-data
    micro-batches until every pending timeout fires, so an
    ``availableNow`` query with a long idle timeout never terminates
    (observed on Spark 4.1.2; see :func:`streaming_clipper`)."""
    import json as _json

    import numpy as np
    import pandas as pd

    from .kernels import ClipState, block_loop_setup, process_block

    cfg_json = cfg.to_json()
    mask_json = mask.to_json() if mask is not None else None

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            (isamp, nread, opos, buf, n_blocks, n_clipped, n_sk, done,
             c_avg, c_std, c_chan, c_blocks) = state.get
            state.remove()
            if done:
                # A completed-doc tombstone reached the end of its
                # redelivery horizon: silently drop it.
                yield pd.DataFrame(
                    [], columns=[f.name for f in DEDISP_OUT_SCHEMA])
                return
            # Stalled mid-document: evict, flagging the truncation.
            yield pd.DataFrame(
                [(key[0], n_blocks, -1, opos, None,
                  _json.dumps({"n_blocks": n_blocks,
                               "n_clipped_samples": int(n_clipped),
                               "n_sk_masked_intervals": int(n_sk),
                               "truncated": True}, sort_keys=True))],
                columns=[f.name for f in DEDISP_OUT_SCHEMA])
            return
        st = state.get if state.exists else None
        if st is not None and st[7]:           # done flag
            # Completed-doc tombstone (idle_timeout_ms mode): every
            # strip of this doc arriving now is an at-least-once
            # redelivery — including a FULL replay starting at
            # offset 0, which the stateless offset!=0 heuristic
            # below cannot catch (it would silently reprocess the
            # whole document and emit duplicate output).  Checked
            # BEFORE the pdf concat / plan setup — suppression must be
            # O(1), not O(document size), and it depends only on the
            # state flag.
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)   # re-arm TTL
            else:
                # Tombstone restored from a checkpoint into a
                # NoTimeout run (e.g. a drained continuous deployment
                # restarted as availableNow): it could never
                # self-evict — drop it now.
                state.remove()
            yield pd.DataFrame(
                [], columns=[f.name for f in DEDISP_OUT_SCHEMA])
            return
        pdf = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values("strip_offset")
        header, cfg_l, plan = _memo_plan(
            pdf["header"].iloc[0], cfg_json, mask_json)
        nchan = header.nchan
        # Same preamble as the batch loop — ONE definition
        # (kernels.block_loop_setup), so the bit-parity argument
        # covers the setup, not just the shared block body.
        use_mask, shift_back, padvals, mask_args = block_loop_setup(plan)

        if st is not None:
            (isamp, nread, opos, buf, n_blocks, n_clipped, n_sk, done,
             c_avg, c_std, c_chan, c_blocks) = st
            buf = bytes(buf)
            clip_state = ClipState(np.float32(c_avg), np.float32(c_std),
                                   np.asarray(c_chan, dtype=np.float32),
                                   int(c_blocks))
        else:
            if int(pdf["strip_offset"].iloc[0]) != 0:
                # No state and a mid-document offset: the doc already
                # finished and its state was removed — these strips are
                # an at-least-once redelivery.  Drop them idempotently
                # (raising here would poison the query on every
                # checkpoint replay), but NOT silently: a diagnostic
                # row (dm_index = -2) records the drop, so the rarer
                # causes this heuristic cannot distinguish — a source
                # delivering a doc's strips out of order across
                # micro-batches, or lost state — surface downstream
                # instead of the document stalling forever with zero
                # output and zero evidence.
                yield pd.DataFrame(
                    [(key[0], 0, -2,
                      int(pdf["strip_offset"].iloc[0]), None,
                      _json.dumps({"dropped_replay_strips": len(pdf)},
                                  sort_keys=True))],
                    columns=[f.name for f in DEDISP_OUT_SCHEMA])
                return
            isamp = nread = opos = 0
            buf, n_blocks, n_clipped, n_sk, done = b"", 0, 0, 0, 0
            clip_state = ClipState()
        # NB: padvals is clip_times' good_chan_levels scratch — it is
        # overwritten with the running channel averages each block
        # (mask.c:654-656), which the EWMA state fully determines, so
        # it needs no state-store slot of its own.
        if use_mask and clip_state.blocksread:
            padvals[:] = clip_state.chan_running_avg

        # Linear accumulation: one b''.join instead of bytes-+= per
        # strip (quadratic re-copying when a giant document arrives as
        # many small strips in one trigger).
        parts = [buf]
        expected = isamp * nchan + len(buf)
        for r in pdf.itertuples(index=False):
            off_b = int(r.strip_offset) * nchan
            p = bytes(r.payload)
            if off_b + len(p) <= expected:
                # Entirely at-or-behind the consume cursor: an
                # at-least-once duplicate of data already ingested
                # (producer retry, or the same strip twice within one
                # micro-batch).  Skip idempotently — raising here
                # would poison the query on every checkpoint replay.
                continue
            if off_b < expected:
                # Overlapping strip (a retry re-striped across the
                # cursor): the prefix up to the cursor was already
                # consumed — ingest only the unseen suffix.  Offsets
                # are authoritative positions, so this is exact.
                p = p[expected - off_b:]
            elif off_b > expected:
                # A GAP means lost data — that stays a loud error.
                raise ValueError(
                    f"non-contiguous strip for {key[0]}: offset "
                    f"{r.strip_offset}, expected {expected // nchan}")
            parts.append(p)
            expected += len(p)
            nread += len(p) // nchan
        buf = b"".join(parts)

        rows = []
        while not done:
            to_read = min(plan.blocksize, header.nsamp - isamp)
            if nread - isamp < to_read or to_read <= 0:
                break                      # need more strips
            block = np.frombuffer(buf[:to_read * nchan], dtype=np.uint8) \
                .reshape(to_read, nchan)
            if header.chan_order == "low":
                block = block[:, ::-1]     # lofarhdf5.cxx:325-335
            ob, ncl, nsk = process_block(block, plan, isamp, padvals,
                                         mask_args, clip_state, use_mask)
            for d in range(ob.shape[0]):
                rows.append((key[0], n_blocks, d, opos,
                             np.ascontiguousarray(
                                 ob[d], dtype="<f4").tobytes(), None))
            opos += ob.shape[1]
            n_clipped += ncl
            n_sk += nsk
            n_blocks += 1
            step = to_read - shift_back
            buf = buf[step * nchan:]
            isamp += step
            if not isamp < header.nsamp - shift_back:  # dragnet.cu:330
                done = 1
                rows.append((key[0], n_blocks, -1, opos, None,
                             _json.dumps({
                                 "n_blocks": n_blocks,
                                 "n_clipped_samples": int(n_clipped),
                                 "n_sk_masked_intervals": int(n_sk)},
                                 sort_keys=True)))
        if done:
            if idle_timeout_ms is not None:
                # Finished document on a continuous deployment: keep a
                # TINY tombstone (done=1, no halo buffer) for one TTL
                # window so redelivered strips — including full
                # offset-0 replays — are recognized and dropped, then
                # let the timeout evict it.  State stays bounded by
                # (in-flight docs + docs completed within the last
                # TTL), not the stream's total document count.
                state.update((isamp, nread, opos, b"",
                              n_blocks, int(n_clipped), int(n_sk), 1,
                              0.0, 0.0, [], 0))
                state.setTimeoutDuration(idle_timeout_ms)
            else:
                # One-shot (availableNow) runs: EVICT immediately —
                # timeouts are unavailable (see docstring), and the
                # offset!=0 heuristic above still catches partial
                # replays.
                state.remove()
        else:
            state.update((isamp, nread, opos, buf,
                          n_blocks, int(n_clipped), int(n_sk), int(done),
                          float(clip_state.running_avg),
                          float(clip_state.running_std),
                          [float(v)
                           for v in clip_state.chan_running_avg],
                          int(clip_state.blocksread)))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(rows,
                           columns=[f.name for f in DEDISP_OUT_SCHEMA])

    from pyspark.sql.streaming.state import GroupStateTimeout
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_timeout_ms is not None
               else GroupStateTimeout.NoTimeout)
    return strips.groupBy("doc_id").applyInPandasWithState(
        fn, DEDISP_OUT_SCHEMA, DEDISP_STATE_SCHEMA, "append", timeout)

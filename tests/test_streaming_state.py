"""Stateful streaming clipper (W1 via applyInPandasWithState):
stream == batch bit-equality, with the EWMA state surviving across
micro-batches (mask.c:556-677, statics at mask.c:564-566)."""

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dragnet_spark.generate import make_document
from dragnet_spark.kernels import ClipState, clip_times
from dragnet_spark.spans import decode_document
from dragnet_spark.streaming import BLOCK_SCHEMA, streaming_clipper

CLIP_SIGMA = 6.0
BLOCKSIZE = 128


def _blocks(blocksize: int = BLOCKSIZE):
    """Tiny doc 0 (contains the broadband burst the clipper targets)
    split into sequential blocks."""
    doc = make_document("tiny", 0)
    header, data, _ = decode_document(doc["spans"])
    blocks = [(doc["doc_id"], i, np.ascontiguousarray(
        data[i * blocksize:(i + 1) * blocksize]).tobytes())
        for i in range(data.shape[0] // blocksize)]
    return header, blocks


def _batch_truth(header, blocks):
    st = ClipState()
    out = []
    for doc_id, bid, payload in blocks:
        buf = np.frombuffer(payload, np.uint8).reshape(
            -1, header.nchan).astype(np.float32)
        levels = np.zeros(header.nchan, np.float32)
        ncl = clip_times(buf, CLIP_SIGMA, levels, st)
        out.append((doc_id, bid, int(ncl),
                    float(st.running_avg), float(st.running_std)))
    return out


def _write_block_file(path, rows):
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "block_id": pa.array([r[1] for r in rows], pa.int32()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
    })
    pq.write_table(table, path)


def test_streaming_clipper_state_across_microbatches(spark, tmp_path):
    header, blocks = _blocks()
    truth = _batch_truth(header, blocks)
    assert sum(r[2] for r in truth) > 0      # the burst really clips

    # Two files -> maxFilesPerTrigger=1 -> two micro-batches; the EWMA
    # state must carry from the first trigger into the second.
    d = tmp_path / "stream_in"
    d.mkdir()
    _write_block_file(str(d / "000.parquet"), blocks[:2])
    time.sleep(0.05)
    _write_block_file(str(d / "001.parquet"), blocks[2:])
    os.utime(str(d / "001.parquet"),
             (time.time() + 5, time.time() + 5))   # later mtime => later batch

    stream = (spark.readStream.schema(BLOCK_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    result = streaming_clipper(stream, CLIP_SIGMA, header.nchan)
    q = (result.writeStream.format("memory").queryName("clip_state_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.block_id: (r.doc_id, r.block_id, r.n_clipped,
                        r.running_avg, r.running_std)
           for r in spark.table("clip_state_test").collect()}

    assert len(got) == len(truth)
    for want in truth:
        assert got[want[1]] == want, (got[want[1]], want)


def _write_strip_file(path, strips):
    table = pa.table({
        "doc_id": pa.array([s[0] for s in strips], pa.string()),
        "header": pa.array([s[1] for s in strips], pa.string()),
        "strip_offset": pa.array([s[2] for s in strips], pa.int64()),
        "payload": pa.array([s[3] for s in strips], pa.binary()),
    })
    pq.write_table(table, path)


def test_streaming_dedisperse_full_loop_parity(spark, tmp_path):
    """W3 as a REAL stateful streaming operator: the whole block loop
    (zap -> mask -> clipper -> SK -> dedisperse) with the halo tail and
    the clipper EWMA in the state store, fed uneven raw strips across
    two micro-batches — output chunks reassemble to the batch
    process_document result BIT-FOR-BIT, including a clip-enabled
    config (s2) the chunked batch path cannot run, and the final
    metrics row equals the batch metrics dict."""
    import json

    from dragnet_spark.generate import (make_document, make_mask,
                                        scenario_configs)
    from dragnet_spark.kernels import process_document
    from dragnet_spark.plan import build_plan
    from dragnet_spark.streaming import STRIP_SCHEMA, streaming_dedisperse

    doc = make_document("tiny", 0)
    header, data, _ = decode_document(doc["spans"])
    cfg = scenario_configs("tiny")["s2"]     # rfifind mask + clipper EWMA
    cfg.blocksize = 192                      # 512 samples -> 3 blocks
    mask = make_mask("tiny")
    plan = build_plan(header, cfg, mask)
    assert 0 < plan.max_delay * cfg.ndec < 192
    want, metrics = process_document(data, plan)
    assert metrics["n_blocks"] >= 3 and metrics["n_clipped_samples"] > 0

    # uneven strips, split so the state must carry a processed block's
    # halo AND the EWMA from trigger 1 into trigger 2
    cuts = [0, 100, 192, 300, 512]
    strips = [(doc["doc_id"], header.to_json(), int(cuts[i]),
               np.ascontiguousarray(data[cuts[i]:cuts[i + 1]]).tobytes())
              for i in range(len(cuts) - 1)]
    d = tmp_path / "stream_dedisp"
    d.mkdir()
    _write_strip_file(str(d / "000.parquet"), strips[:2])
    time.sleep(0.05)
    _write_strip_file(str(d / "001.parquet"), strips[2:])
    os.utime(str(d / "001.parquet"), (time.time() + 5, time.time() + 5))

    stream = (spark.readStream.schema(STRIP_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (streaming_dedisperse(stream, cfg, mask)
         .writeStream.format("memory").queryName("dedisp_stream_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("dedisp_stream_test").collect()

    mrows = [r for r in rows if r.dm_index == -1]
    assert len(mrows) == 1
    assert json.loads(mrows[0].metrics) == metrics

    got: dict[int, bytes] = {}
    for r in sorted((r for r in rows if r.dm_index >= 0),
                    key=lambda r: (r.dm_index, r.block_seq)):
        assert r.out_offset * 4 == len(got.get(r.dm_index, b""))
        got[r.dm_index] = got.get(r.dm_index, b"") + bytes(r.series)
    assert set(got) == set(range(want.shape[0]))
    for d_idx in range(want.shape[0]):
        assert got[d_idx] == np.ascontiguousarray(
            want[d_idx], dtype="<f4").tobytes(), f"dm {d_idx} diverged"


def test_streaming_clipper_multichunk_out_of_order(spark, tmp_path):
    """A group's rows arrive as MULTIPLE Arrow chunks (128 block rows >
    the session's 64-row maxRecordsPerBatch) in shuffled order; the
    clipper must materialize the whole group and chain the EWMA in
    block_id order — per-chunk sorting would silently diverge."""
    header, blocks = _blocks(blocksize=4)    # 128 rows for one doc_id
    assert len(blocks) > 64                  # forces >=2 Arrow chunks
    truth = _batch_truth(header, blocks)

    d = tmp_path / "stream_in2"
    d.mkdir()
    rng = np.random.default_rng(7)
    shuffled = [blocks[i] for i in rng.permutation(len(blocks))]
    _write_block_file(str(d / "000.parquet"), shuffled)

    stream = spark.readStream.schema(BLOCK_SCHEMA).parquet(str(d))
    result = streaming_clipper(stream, CLIP_SIGMA, header.nchan)
    q = (result.writeStream.format("memory").queryName("clip_chunk_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.block_id: (r.doc_id, r.block_id, r.n_clipped,
                        r.running_avg, r.running_std)
           for r in spark.table("clip_chunk_test").collect()}

    assert len(got) == len(truth)
    for want in truth:
        assert got[want[1]] == want, (got[want[1]], want)


def test_streaming_dedup_state_is_evicted_by_watermark(spark, tmp_path):
    """The bounded-state claim behind dropDuplicatesWithinWatermark
    (r3 ADVICE fix), pinned with the state-store's own metrics: two
    micro-batches 48 h apart under a 1 h watermark must EVICT the
    first batch's dedup keys (numRowsRemoved > 0, final state strictly
    below the distinct-key count) while the deduped result still
    counts every unique key across both batches."""
    import os
    import time as _time
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dragnet_spark.streaming import streaming_dedup

    base = str(tmp_path / "evict_src")
    os.makedirs(base)
    t0 = datetime(2026, 1, 1)

    def mk(fname, ids, start):
        n = len(ids)
        pq.write_table(pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([start + timedelta(seconds=i)
                            for i in range(n)], pa.timestamp("us")),
            "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }), f"{base}/{fname}")

    mk("000.parquet", list(range(100)), t0)
    mk("001.parquet", list(range(100, 150)), t0 + timedelta(hours=48))
    now = _time.time()          # mtime order fixes the batch order
    os.utime(f"{base}/000.parquet", (now - 10, now - 10))
    os.utime(f"{base}/001.parquet", (now + 5, now + 5))

    raw = (spark.readStream
           .schema("event_id long, ts timestamp_ntz, user_id long, "
                   "event_type string, value double, props string")
           .option("maxFilesPerTrigger", 1).parquet(base))
    ev = (raw.withColumn("ts", F.col("ts").cast("timestamp"))
          .withWatermark("ts", "1 hour"))
    q = (streaming_dedup(ev)
         .writeStream.format("memory").queryName("t_dedup_evict")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.table("t_dedup_evict").collect()
    assert [(r.event_type, r.n_unique) for r in got] == [("a", 150)]
    dedup_states = [so for p in q.recentProgress
                    for so in p["stateOperators"]
                    if so["operatorName"] == "dedupeWithinWatermark"]
    assert dedup_states, "no dedup state operator reported"
    assert sum(so["numRowsRemoved"] for so in dedup_states) >= 100
    assert dedup_states[-1]["numRowsTotal"] < 150   # state is bounded


def test_streaming_sessions_state_is_evicted_by_watermark(spark, tmp_path):
    """streaming_sessions' docstring claims per-(user, open session)
    state is evicted once the watermark passes the session close; pin
    it: two 30-event batches 48 h apart (3 users, 4 h gap, 1 h
    watermark) must emit exactly the first batch's 3 closed sessions
    in append mode AND remove those 3 entries from the session state
    store, leaving only the second batch's open sessions."""
    import os
    import time as _time
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dragnet_spark.streaming import streaming_sessions

    base = str(tmp_path / "sess_src")
    os.makedirs(base)
    t0 = datetime(2026, 1, 1)

    def mk(fname, ids, start):
        n = len(ids)
        pq.write_table(pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([start + timedelta(minutes=i)
                            for i in range(n)], pa.timestamp("us")),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array([float(i) for i in range(n)]),
            "props": pa.array(["{}"] * n),
        }), f"{base}/{fname}")

    mk("000.parquet", list(range(30)), t0)
    mk("001.parquet", list(range(30, 60)), t0 + timedelta(hours=48))
    now = _time.time()
    os.utime(f"{base}/000.parquet", (now - 10, now - 10))
    os.utime(f"{base}/001.parquet", (now + 5, now + 5))

    raw = (spark.readStream
           .schema("event_id long, ts timestamp_ntz, user_id long, "
                   "event_type string, value double, props string")
           .option("maxFilesPerTrigger", 1).parquet(base))
    ev = (raw.withColumn("ts", F.col("ts").cast("timestamp"))
          .withWatermark("ts", "1 hour"))
    q = (streaming_sessions(ev)
         .writeStream.format("memory").queryName("t_sess_evict")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    emitted = spark.table("t_sess_evict").collect()
    assert sorted(r.user_id for r in emitted) == [0, 1, 2]
    assert all(r.n_events == 10 for r in emitted)
    states = [so for p in q.recentProgress
              for so in p["stateOperators"]
              if "sessionWindow" in so["operatorName"]]
    assert states, "no session-window state operator reported"
    assert sum(so["numRowsRemoved"] for so in states) == 3
    assert states[-1]["numRowsTotal"] == 3     # only batch-2 sessions


def test_streaming_dedisperse_evicts_done_and_ignores_redelivery(
        spark, tmp_path):
    """Round-5 bounded-state contract of streaming_dedisperse: a
    finished document's state entry is REMOVED (numRowsTotal drops to
    0 — state is bounded by in-flight docs, not total docs), and
    strips redelivered AFTER completion (at-least-once sources
    replaying a checkpoint) are ignored idempotently instead of
    poisoning the query with a contiguity error or duplicate output."""
    import json

    from dragnet_spark.generate import make_document, scenario_configs
    from dragnet_spark.kernels import process_document
    from dragnet_spark.plan import build_plan
    from dragnet_spark.streaming import STRIP_SCHEMA, streaming_dedisperse

    doc = make_document("tiny", 0)
    header, data, _ = decode_document(doc["spans"])
    cfg = scenario_configs("tiny")["s1"]
    cfg.blocksize = 192
    plan = build_plan(header, cfg, None)
    want, metrics = process_document(data, plan)

    cuts = [0, 192, 512]
    strips = [(doc["doc_id"], header.to_json(), int(cuts[i]),
               np.ascontiguousarray(data[cuts[i]:cuts[i + 1]]).tobytes())
              for i in range(len(cuts) - 1)]
    d = tmp_path / "stream_replay"
    d.mkdir()
    _write_strip_file(str(d / "000.parquet"), strips)
    # batch 2: a full REDELIVERY of the mid-doc strip after the doc
    # finished (its state was evicted) — must be a silent no-op
    _write_strip_file(str(d / "001.parquet"), strips[1:])
    now = time.time()
    os.utime(str(d / "000.parquet"), (now - 10, now - 10))
    os.utime(str(d / "001.parquet"), (now + 5, now + 5))

    stream = (spark.readStream.schema(STRIP_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (streaming_dedisperse(stream, cfg)
         .writeStream.format("memory").queryName("dedisp_replay_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("dedisp_replay_test").collect()

    # data output identical to a clean single-delivery run: one metrics
    # row (not truncated), every series chunk exactly once
    mrows = [r for r in rows if r.dm_index == -1]
    assert len(mrows) == 1
    assert json.loads(mrows[0].metrics) == metrics
    got: dict[int, bytes] = {}
    for r in sorted((r for r in rows if r.dm_index >= 0),
                    key=lambda r: (r.dm_index, r.block_seq)):
        got[r.dm_index] = got.get(r.dm_index, b"") + bytes(r.series)
    for d_idx in range(want.shape[0]):
        assert got[d_idx] == np.ascontiguousarray(
            want[d_idx], dtype="<f4").tobytes()

    # ...and the drop is OBSERVABLE: one diagnostic row (dm_index=-2)
    # records the replayed strips instead of discarding them silently
    drows = [r for r in rows if r.dm_index == -2]
    assert len(drows) == 1
    assert json.loads(drows[0].metrics)["dropped_replay_strips"] == 1

    # the state store ends EMPTY: the done-eviction removed the entry
    states = [so for p in q.recentProgress
              for so in p["stateOperators"]]
    assert states, "no state operator reported"
    assert states[-1]["numRowsTotal"] == 0


def test_streaming_dedisperse_idle_timeout_truncates(spark, tmp_path):
    """The opt-in ProcessingTimeTimeout path (continuous deployments):
    a document that stalls mid-stream is evicted after idle_timeout_ms
    with a ``"truncated": true`` metrics row, so abandoned partial
    documents cannot pin their halo buffers forever.  Runs under a
    processingTime trigger (an availableNow query with pending
    timeouts would never terminate — pinned in the docstring)."""
    import json

    from dragnet_spark.generate import make_document, scenario_configs
    from dragnet_spark.streaming import STRIP_SCHEMA, streaming_dedisperse

    doc = make_document("tiny", 0)
    header, data, _ = decode_document(doc["spans"])
    cfg = scenario_configs("tiny")["s1"]
    cfg.blocksize = 192

    # only the first 192 samples of 512 ever arrive: one block is
    # emitted, then the doc stalls forever
    strips = [(doc["doc_id"], header.to_json(), 0,
               np.ascontiguousarray(data[:192]).tobytes())]
    d = tmp_path / "stream_stall"
    d.mkdir()
    _write_strip_file(str(d / "000.parquet"), strips)

    stream = spark.readStream.schema(STRIP_SCHEMA).parquet(str(d))
    q = (streaming_dedisperse(stream, cfg, idle_timeout_ms=2000)
         .writeStream.format("memory").queryName("dedisp_stall_test")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 120
        mrow = None
        while time.time() < deadline and mrow is None:
            time.sleep(2)
            for r in spark.table("dedisp_stall_test").collect():
                if r.dm_index == -1:
                    mrow = r
        assert mrow is not None, "idle timeout never fired"
        m = json.loads(mrow.metrics)
        assert m["truncated"] is True
        assert m["n_blocks"] == 1          # the one completed block
    finally:
        q.stop()


def test_streaming_dedisperse_tombstone_suppresses_full_replay(
        spark, tmp_path):
    """With idle_timeout_ms set (continuous deployments), a completed
    document leaves a TINY tombstone instead of evicting immediately,
    so a FULL redelivery — offset-0 strip included, which the
    stateless offset!=0 heuristic cannot catch — is dropped instead of
    reprocessing the document and emitting duplicate output.  The
    tombstone then self-evicts via the TTL (numRowsTotal -> 0)."""
    import json

    from dragnet_spark.generate import make_document, scenario_configs
    from dragnet_spark.kernels import process_document
    from dragnet_spark.plan import build_plan
    from dragnet_spark.streaming import STRIP_SCHEMA, streaming_dedisperse

    doc = make_document("tiny", 0)
    header, data, _ = decode_document(doc["spans"])
    cfg = scenario_configs("tiny")["s1"]
    cfg.blocksize = 192
    plan = build_plan(header, cfg, None)
    want, metrics = process_document(data, plan)

    strips = [(doc["doc_id"], header.to_json(), 0,
               np.ascontiguousarray(data).tobytes())]
    d = tmp_path / "stream_tombstone"
    d.mkdir()
    _write_strip_file(str(d / "000.parquet"), strips)
    # batch 2: the WHOLE document again (checkpoint-loss replay)
    _write_strip_file(str(d / "001.parquet"), strips)
    now = time.time()
    os.utime(str(d / "000.parquet"), (now - 10, now - 10))
    os.utime(str(d / "001.parquet"), (now + 2, now + 2))

    stream = (spark.readStream.schema(STRIP_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (streaming_dedisperse(stream, cfg, idle_timeout_ms=3000)
         .writeStream.format("memory").queryName("dedisp_tomb_test")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        # wait until the tombstone has been evicted by its TTL
        deadline = time.time() + 120
        evicted = False
        while time.time() < deadline and not evicted:
            time.sleep(2)
            states = [so for p in q.recentProgress
                      for so in p["stateOperators"]]
            evicted = (any(so["numRowsTotal"] > 0 for so in states)
                       and states[-1]["numRowsTotal"] == 0)
        assert evicted, "tombstone never evicted"
        rows = spark.table("dedisp_tomb_test").collect()
    finally:
        q.stop()

    # output identical to a single clean delivery: ONE metrics row
    # (not truncated — the tombstone timeout must not emit one),
    # every series chunk exactly once
    mrows = [r for r in rows if r.dm_index == -1]
    assert len(mrows) == 1
    assert json.loads(mrows[0].metrics) == metrics
    got: dict[int, bytes] = {}
    for r in sorted((r for r in rows if r.dm_index >= 0),
                    key=lambda r: (r.dm_index, r.block_seq)):
        got[r.dm_index] = got.get(r.dm_index, b"") + bytes(r.series)
    for d_idx in range(want.shape[0]):
        assert got[d_idx] == np.ascontiguousarray(
            want[d_idx], dtype="<f4").tobytes()


def test_streaming_dedisperse_skips_inflight_duplicates_and_overlaps(
        spark, tmp_path):
    """At-least-once duplicates of IN-FLIGHT data must not poison the
    query: a strip delivered twice in one micro-batch (producer retry)
    is skipped, and a retry re-striped ACROSS the consume cursor
    contributes only its unseen suffix — output equals a clean
    single-delivery run.  Only a genuine gap raises."""
    import json

    from dragnet_spark.generate import make_document, scenario_configs
    from dragnet_spark.kernels import process_document
    from dragnet_spark.plan import build_plan
    from dragnet_spark.streaming import STRIP_SCHEMA, streaming_dedisperse

    doc = make_document("tiny", 0)
    header, data, _ = decode_document(doc["spans"])
    cfg = scenario_configs("tiny")["s1"]
    cfg.blocksize = 192
    plan = build_plan(header, cfg, None)
    want, metrics = process_document(data, plan)
    hj = header.to_json()

    def strip(a, b, off=None):
        return (doc["doc_id"], hj, int(a if off is None else off),
                np.ascontiguousarray(data[a:b]).tobytes())

    d = tmp_path / "stream_dups"
    d.mkdir()
    # batch 1: [0,192) delivered TWICE in the same micro-batch
    _write_strip_file(str(d / "000.parquet"),
                      [strip(0, 192), strip(0, 192)])
    # batch 2: a retry re-striped across the cursor — [96,512) overlaps
    # the 192-sample cursor; only data[192:512] is unseen
    _write_strip_file(str(d / "001.parquet"), [strip(96, 512)])
    now = time.time()
    os.utime(str(d / "000.parquet"), (now - 10, now - 10))
    os.utime(str(d / "001.parquet"), (now + 5, now + 5))

    stream = (spark.readStream.schema(STRIP_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (streaming_dedisperse(stream, cfg)
         .writeStream.format("memory").queryName("dedisp_dups_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("dedisp_dups_test").collect()

    mrows = [r for r in rows if r.dm_index == -1]
    assert len(mrows) == 1
    assert json.loads(mrows[0].metrics) == metrics
    got: dict[int, bytes] = {}
    for r in sorted((r for r in rows if r.dm_index >= 0),
                    key=lambda r: (r.dm_index, r.block_seq)):
        got[r.dm_index] = got.get(r.dm_index, b"") + bytes(r.series)
    for d_idx in range(want.shape[0]):
        assert got[d_idx] == np.ascontiguousarray(
            want[d_idx], dtype="<f4").tobytes()


def test_streaming_clipper_idle_timeout_emits_marker(spark, tmp_path):
    """streaming_clipper's opt-in idle timeout: a stalled document's
    EWMA entry is evicted with a MARKER row (block_id=-1, n_clipped=-1,
    final running stats) so downstream can tell the recursion was
    severed, and the state store ends empty."""
    header, blocks = _blocks()
    truth = _batch_truth(header, blocks[:2])

    d = tmp_path / "clip_stall"
    d.mkdir()
    _write_block_file(str(d / "000.parquet"), blocks[:2])
    # ...then the document stalls forever

    stream = (spark.readStream
              .schema(BLOCK_SCHEMA).parquet(str(d)))
    q = (streaming_clipper(stream, CLIP_SIGMA, header.nchan,
                           idle_timeout_ms=2000)
         .writeStream.format("memory").queryName("clip_stall_test")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 120
        marker = None
        while time.time() < deadline and marker is None:
            time.sleep(2)
            for r in spark.table("clip_stall_test").collect():
                if r.block_id == -1:
                    marker = r
        assert marker is not None, "idle-timeout marker never emitted"
        states = [so for p in q.recentProgress
                  for so in p["stateOperators"]]
    finally:
        q.stop()

    assert marker.n_clipped == -1
    # marker carries the final running stats of the severed recursion
    assert marker.running_avg == truth[-1][3]
    assert marker.running_std == truth[-1][4]
    rows = [r for r in spark.table("clip_stall_test").collect()
            if r.block_id >= 0]
    assert sorted((r.block_id, r.n_clipped) for r in rows) == \
        [(t[1], t[2]) for t in truth]
    assert states[-1]["numRowsTotal"] == 0


# ---------------------------------------------------------------------------
# Randomized stream == batch differential fuzz
# ---------------------------------------------------------------------------

N_STREAM_SEEDS = 15            # seeds 8/11/14 draw the FULL stage stack
MIN_STREAM_EXECUTED = 15       # draws self-repair (blocksize retry) => all run


def _draw_stream_run(seed):
    """One random (config, mask, strip geometry) draw over the tiny
    corpus for the streaming-dedisperse parity fuzz.

    Unlike the SQL-oracle fuzz (tests/test_fuzz_differential.py),
    truth here is the batch kernels themselves
    (:func:`dragnet_spark.kernels.process_document`), so the draw
    space is UNRESTRICTED: any DM grid including the optimal Levin
    list (dm_step=0), SK zapping, the clipper EWMA (which the chunked
    batch path refuses), and a fully random rfifind mask (random
    ptsperint / per-interval channel lists / float padvals) — the
    stream==batch claim is bit-for-bit for ALL of them, not just the
    dyadic-exact subspace the cross-engine oracles need."""
    from dragnet_spark.generate import CORPORA, make_document
    from dragnet_spark.params import Header, MaskSpec, RunConfig
    from dragnet_spark.plan import build_plan
    from dragnet_spark.spans import decode_document

    ndocs, nchan, t, tsamp = CORPORA["tiny"]
    rng = np.random.default_rng([77, seed])
    doc = make_document("tiny", int(seed % ndocs))
    header, data, _ = decode_document(doc["spans"])

    ndec = int(rng.choice([1, 2, 4]))
    use_mask = bool(rng.integers(0, 2))
    mask = None
    if use_mask:
        ppi = int(rng.choice([32, 64, 128]))
        numint = -(-t // ppi)
        mask = MaskSpec(
            mask_id=f"fzstream{seed}", timesigma=10.0, freqsigma=4.0,
            mjd=Header().tstart, dtint=ppi * tsamp,
            lofreq=Header().fch1 - (nchan - 1) * abs(Header().foff),
            dfreq=abs(Header().foff), numchan=nchan, numint=numint,
            ptsperint=ppi,
            zap_chans=sorted(int(c) for c in rng.choice(
                nchan, size=int(rng.integers(0, 3)), replace=False)),
            zap_ints=sorted(int(i) for i in rng.choice(
                numint, size=int(rng.integers(0, 2)), replace=False)),
            chans_per_int=[
                sorted(int(c) for c in rng.choice(
                    nchan, size=int(rng.integers(0, 4)), replace=False))
                for _ in range(numint)],
            padvals=[float(v) for v in rng.uniform(20.0, 40.0, size=nchan)],
        )
    base = dict(
        config_id=f"fzstream{seed}", prefix="test",
        zapchan=str(rng.choice(["", "0", "2:4", "0,3:5,9"])),
        use_mask=use_mask,
        clip_sigma=(float(rng.choice([0.0, 4.0, 6.0]))
                    if use_mask else 0.0),
        use_skz=bool(rng.integers(0, 2)), mskz=int(rng.choice([32, 64])),
        ndec=ndec, dm_start=float(rng.choice([0.0, 2.5])),
        dm_end=float(rng.choice([30.0, 50.0])),
        dm_step=float(rng.choice([0.0, 2.5, 5.0])),   # 0 => Levin list
    )
    cfg = plan = None
    for bs in rng.permutation([0, 96, 128, 192, 256]):
        try:
            cfg = RunConfig(blocksize=int(bs), **base)
            plan = build_plan(header, cfg, mask)
            break
        except ValueError:            # blocksize//ndec <= max_delay
            cfg = plan = None
    if plan is None:
        return None

    # Random strip geometry: 2-6 uneven strips, split order-preserving
    # across 2-3 micro-batch files so halos + EWMA must cross triggers.
    cuts = sorted({0, t, *(int(c) for c in
                           rng.integers(1, t, size=int(rng.integers(1, 6))))})
    strips = [(doc["doc_id"], header.to_json(), int(cuts[i]),
               np.ascontiguousarray(data[cuts[i]:cuts[i + 1]]).tobytes())
              for i in range(len(cuts) - 1)]
    nfiles = min(len(strips), int(rng.integers(2, 4)))
    bounds = [0, *sorted(int(b) for b in rng.choice(
        range(1, len(strips)), size=nfiles - 1, replace=False)), len(strips)]
    files = [strips[bounds[i]:bounds[i + 1]] for i in range(nfiles)]
    return header, data, cfg, mask, plan, files


def test_streaming_dedisperse_random_configs_parity(spark, tmp_path):
    """Differential fuzz of the FULL stateful streaming block loop:
    every drawn (config, mask, strip split) must reassemble to the
    batch ``process_document`` output bit-for-bit, with the metrics
    row equal to the batch metrics dict and zero dropped-replay
    diagnostics.  The fixed parity scenario checks one geometry; this
    sweeps the stage mix (zap x mask x clipper x SK x ndec x DM-list
    kind x blocksize incl. whole-doc) and the state-boundary geometry
    (random strip cuts x random trigger split) together."""
    import json

    from dragnet_spark.kernels import process_document
    from dragnet_spark.streaming import STRIP_SCHEMA, streaming_dedisperse

    executed = 0
    for seed in range(N_STREAM_SEEDS):
        drawn = _draw_stream_run(seed)
        if drawn is None:
            continue
        header, data, cfg, mask, plan, files = drawn
        want, metrics = process_document(data, plan)

        d = tmp_path / f"fzstream{seed}"
        d.mkdir()
        now = time.time()
        for i, rows in enumerate(files):
            p = str(d / f"{i:03d}.parquet")
            _write_strip_file(p, rows)
            os.utime(p, (now + 5 * i, now + 5 * i))   # fix batch order
        stream = (spark.readStream.schema(STRIP_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        qname = f"fzstream_sink_{seed}"
        q = (streaming_dedisperse(stream, cfg, mask)
             .writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        rows = spark.table(qname).collect()

        label = (f"seed {seed} (cfg={cfg.to_json()}, "
                 f"mask={'yes' if mask else 'no'}, "
                 f"files={[len(f) for f in files]})")
        assert not [r for r in rows if r.dm_index == -2], \
            f"dropped-replay diagnostic on a clean stream: {label}"
        mrows = [r for r in rows if r.dm_index == -1]
        assert len(mrows) == 1, label
        assert json.loads(mrows[0].metrics) == metrics, label

        got: dict[int, bytes] = {}
        for r in sorted((r for r in rows if r.dm_index >= 0),
                        key=lambda r: (r.dm_index, r.block_seq)):
            assert r.out_offset * 4 == len(got.get(r.dm_index, b"")), label
            got[r.dm_index] = got.get(r.dm_index, b"") + bytes(r.series)
        assert set(got) == set(range(want.shape[0])), label
        for dm in range(want.shape[0]):
            assert got[dm] == np.ascontiguousarray(
                want[dm], dtype="<f4").tobytes(), f"dm {dm} diverged: {label}"
        executed += 1
    assert executed >= MIN_STREAM_EXECUTED, \
        f"only {executed} of {N_STREAM_SEEDS} drawn configs executed — " \
        "the validity guards hollowed the sweep out"

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

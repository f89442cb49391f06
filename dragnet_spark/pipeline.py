"""The Spark pipeline: documents table -> fused Arrow kernel -> output
span rows (+ inline metrics rows for checkpoint/lineage).

Execution shape (Spark-first; cf. SURVEY.md §7):

* All per-span projection/sorting happens JVM-side
  (``filter``/``array_sort``/``transform`` on the ``spans`` array) so
  the Python boundary receives exactly the columns the kernel needs —
  column pruning reaches the parquet scan.
* The numeric pipeline is ONE ``mapInPandas`` pass per document
  (zap -> mask/clip -> SK -> decimate -> dedisperse), i.e. manual
  operator fusion: zero shuffles on the per-doc path.
* Giant documents (skew) are split into halo-extended chunks that
  reproduce the block loop's boundaries exactly, repartitioned by
  (doc_id, chunk_id) — explicit salting — processed independently,
  and reassembled JVM-side with a single groupBy (binary concat in
  ``aggregate``), the only shuffle in the job.  Chunking requires
  ``clip_sigma == 0`` (the clipper's EWMA is sequential per document,
  ``mask.c:564-566``); clip-enabled runs use the per-document path.
* Plans (DM lists, delay tables, SK thresholds) are built once per
  distinct header on each executor and cached (tiny, pure).
"""

from __future__ import annotations

import base64
import json
import time
from pathlib import Path
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType)

from . import __version__
from .kernels import process_document, scrunch_series
from .params import Header, MaskSpec, RunConfig
from .plan import DedispPlan, build_plan
from .spans import build_output_spans, writeinf_text

# The mandated input table shape (input_hint): doc_id + spans array.
DOCS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ])), False),
])


def docs_to_df(spark: SparkSession, docs: list[dict]) -> DataFrame:
    """Generator dicts -> DataFrame with the canonical schema (plain
    ``createDataFrame`` on dicts would mis-infer spans as a map)."""
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], int(s["offset"]))
              for s in d["spans"]]) for d in docs]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


SPAN_ROW_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("seq", IntegerType(), False),
    StructField("kind", StringType(), False),
    StructField("text", StringType(), True),
    StructField("media_ref", StringType(), True),
    StructField("offset", IntegerType(), True),
])

# Internal mapInPandas output: timeseries rows carry raw bytes in
# ``payload`` (text NULL); the JVM projects the canonical base64 text.
# 25% fewer bytes over the Python->JVM Arrow socket — the measured
# scale bottleneck on many-core hosts (BENCH/BASELINE.md caveat).
_RAW_SPAN_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("seq", IntegerType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("media_ref", StringType(), True),
    StructField("offset", IntegerType(), True),
])

_CHUNK_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("chunk_id", IntegerType(), False),
    StructField("n_chunks", IntegerType(), False),
    StructField("chunk_start", LongType(), False),
    StructField("header", StringType(), False),
    StructField("payload", BinaryType(), False),
    StructField("media", StringType(), True),
])

_CHUNK_OUT_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("chunk_id", IntegerType(), False),
    StructField("n_chunks", IntegerType(), False),
    StructField("dm_index", IntegerType(), False),
    StructField("series", BinaryType(), True),
    StructField("kind", StringType(), False),
    StructField("text", StringType(), True),
    StructField("media_ref", StringType(), True),
    StructField("offset", IntegerType(), True),
])

# Per-executor plan cache: (header_json, cfg_json, mask_json) -> DedispPlan
_PLAN_CACHE: dict[tuple[str, str, str], DedispPlan] = {}


def _cached_plan(header_json: str, cfg: RunConfig,
                 mask: MaskSpec | None) -> DedispPlan:
    key = (header_json, cfg.to_json(), mask.to_json() if mask else "")
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = build_plan(Header.from_json(header_json), cfg, mask)
        _PLAN_CACHE[key] = plan
    return plan


def prepare_documents(df: DataFrame) -> DataFrame:
    """JVM-side projection of the spans array into the exact columns the
    kernel consumes: header JSON, sample strips + their offsets, media
    spans.  Pure per-row expressions — no shuffle, full column pruning.

    Deliberately NO JVM-side sort: array_sort over MB-sized span arrays
    copies the strip strings repeatedly (measured ~30x slower than the
    whole remaining scan); the strips are instead reordered Python-side
    by an argsort over the (tiny) offset array, which moves indices,
    not megabytes.
    """
    spans = F.col("spans")
    samples = F.filter(spans, lambda s: s.kind == F.lit("sample"))
    return df.select(
        "doc_id",
        F.element_at(F.filter(spans, lambda s: s.kind == F.lit("header")), 1)
         .getField("text").alias("header"),
        F.transform(samples, lambda s: s.offset).alias("sample_offsets"),
        # unbase64 JVM-side: 25% fewer bytes over the Arrow boundary and
        # no UTF8 string validation (measured ~30% faster end-to-end).
        F.transform(samples, lambda s: F.unbase64(s.text))
         .alias("sample_bins"),
        F.to_json(F.filter(spans, lambda s: s.kind == F.lit("media")))
         .alias("media"),
    )


def _decode_payload(sample_bins, sample_offsets, header) -> np.ndarray:
    order = np.argsort(np.asarray(sample_offsets, dtype=np.int64),
                       kind="stable")
    raw = b"".join(bytes(sample_bins[i]) for i in order)
    data = np.frombuffer(raw, dtype=np.uint8).reshape(-1, header.nchan)
    if header.chan_order == "low":
        # LOFAR low-first layout -> SIGPROC high-first, as the reference
        # reader does (lofarhdf5.cxx:325-335).
        data = data[:, ::-1]
    return data


def _media_list(media_json: str | None) -> list[dict]:
    if not media_json:
        return []
    return json.loads(media_json)


def _metrics_row(doc_id: str, metrics: dict, n_spans_out: int,
                 wall_ms: float, run_id: str, cfg: RunConfig,
                 chunk_id: int = 0, n_chunks: int = 1) -> dict:
    from pyspark import TaskContext
    tc = TaskContext.get()
    payload = dict(metrics)
    payload.update({
        "run_id": run_id, "config_id": cfg.config_id, "status": "done",
        "chunk_id": chunk_id, "n_chunks": n_chunks,
        "n_spans_out": n_spans_out, "wall_ms": round(wall_ms, 3),
        "partition_id": tc.partitionId() if tc else -1,
        "code_version": __version__,
    })
    return {"doc_id": doc_id, "seq": -1, "kind": "metrics",
            "text": json.dumps(payload, sort_keys=True),
            "media_ref": "", "offset": -1}


def run_pipeline(df: DataFrame, cfg: RunConfig,
                 mask: MaskSpec | None = None, *, run_id: str = "run0",
                 parallelism: int | None = None) -> DataFrame:
    """Per-document fused pipeline.  Input: (doc_id, spans) DataFrame.
    Output: exploded span rows (SPAN_ROW_SCHEMA) in span-sequence order
    (``seq``), plus one ``kind='metrics'`` row per document."""
    prepared = prepare_documents(df)
    if parallelism:
        prepared = prepared.repartition(parallelism, "doc_id")
    cfg_json = cfg.to_json()
    mask_json = mask.to_json() if mask else None

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg_l = RunConfig.from_json(cfg_json)
        mask_l = MaskSpec.from_json(mask_json) if mask_json else None
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, hjson, offsets, bins, media_json in zip(
                    pdf["doc_id"], pdf["header"], pdf["sample_offsets"],
                    pdf["sample_bins"], pdf["media"]):
                t0 = time.perf_counter()
                plan = _cached_plan(hjson, cfg_l, mask_l)
                data = _decode_payload(bins, offsets, plan.header)
                out, metrics = process_document(data, plan)
                if cfg_l.use_dt:
                    out = scrunch_series(out, plan.dt_factors)
                spans = build_output_spans(
                    out, plan.dmlist, plan.header,
                    nsamp_dec=plan.nsamp_dec, tsamp_dec=plan.tsamp_dec,
                    max_delay=plan.max_delay, prefix=cfg_l.prefix,
                    media=_media_list(media_json),
                    dt_factors=plan.dt_factors if cfg_l.use_dt else None,
                    raw_series=True)
                for i, s in enumerate(spans):
                    rows.append({"doc_id": doc_id, "seq": i,
                                 "payload": s.get("payload"), "kind": s["kind"],
                                 "text": s["text"], "media_ref": s["media_ref"],
                                 "offset": s["offset"]})
                rows.append({**_metrics_row(
                    doc_id, metrics, len(spans),
                    (time.perf_counter() - t0) * 1e3, run_id, cfg_l),
                    "payload": None})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in _RAW_SPAN_SCHEMA])

    raw = prepared.mapInPandas(proc, _RAW_SPAN_SCHEMA)
    # JVM-side canonical base64 (Spark's is MIME-wrapped; strip the
    # line breaks) — bit-identical to the Python encoding, proven by
    # the span-equality tests and the chunked-path parity test.
    return raw.select(
        "doc_id", "seq", "kind",
        F.when(F.col("payload").isNotNull(),
               F.regexp_replace(F.base64("payload"), "\r\n", ""))
         .otherwise(F.col("text")).alias("text"),
        "media_ref", "offset")


# --------------------------------------------------------------------------
# Chunked path for giant documents (explicit skew handling)
# --------------------------------------------------------------------------

def _chunk_bounds(nsamp: int, blocksize: int, shift_back: int,
                  blocks_per_chunk: int) -> list[tuple[int, int]]:
    """Chunk [start, end) raw-sample ranges.  Each chunk covers K whole
    blocks plus the halo (``shift_back`` samples) so its internal block
    loop reproduces the full-document block boundaries exactly."""
    step = blocks_per_chunk * (blocksize - shift_back)
    bounds = []
    start = 0
    while start < nsamp - shift_back:
        end = min(start + step + shift_back, nsamp)
        bounds.append((start, end))
        start += step
    return bounds


def run_pipeline_chunked(df: DataFrame, cfg: RunConfig,
                         mask: MaskSpec | None = None, *,
                         run_id: str = "run0",
                         blocks_per_chunk: int = 4,
                         parallelism: int | None = None) -> DataFrame:
    """Skew-safe pipeline: split each document into halo-extended chunk
    rows, repartition by (doc_id, chunk_id), process chunks
    independently, reassemble per-DM series JVM-side.

    Requires ``cfg.clip_sigma == 0`` (clipper state is sequential per
    document) — enforced.  Bit-identical to :func:`run_pipeline`.
    """
    if cfg.clip_sigma > 0.0 and cfg.use_mask:
        raise ValueError("chunked path requires clip_sigma == 0 "
                         "(clipper EWMA is sequential per document)")
    if cfg.use_dt:
        raise ValueError("chunked path does not support use_dt "
                         "(per-DM scrunch groups span chunk boundaries); "
                         "use the per-document path")
    cfg_json = cfg.to_json()
    mask_json = mask.to_json() if mask else None
    prepared = prepare_documents(df)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg_l = RunConfig.from_json(cfg_json)
        mask_l = MaskSpec.from_json(mask_json) if mask_json else None
        for pdf in batches:
            rows = []
            for doc_id, hjson, offsets, bins, media_json in zip(
                    pdf["doc_id"], pdf["header"], pdf["sample_offsets"],
                    pdf["sample_bins"], pdf["media"]):
                plan = _cached_plan(hjson, cfg_l, mask_l)
                h = plan.header
                data = _decode_payload(bins, offsets, h)
                sbr = plan.max_delay * cfg_l.ndec
                bounds = _chunk_bounds(h.nsamp, plan.blocksize, sbr,
                                       blocks_per_chunk)
                for ci, (s, e) in enumerate(bounds):
                    rows.append({
                        "doc_id": doc_id, "chunk_id": ci,
                        "n_chunks": len(bounds), "chunk_start": s,
                        "header": hjson,
                        "payload": np.ascontiguousarray(
                            data[s:e]).tobytes(),
                        "media": media_json if ci == 0 else None,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in _CHUNK_SCHEMA])

    chunks = prepared.mapInPandas(split, _CHUNK_SCHEMA)
    # Explicit salting: giant documents' chunks spread across the cluster.
    nparts = parallelism or chunks.sparkSession.sparkContext.defaultParallelism
    chunks = chunks.repartition(nparts, "doc_id", "chunk_id")

    def proc_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg_l = RunConfig.from_json(cfg_json)
        mask_l = MaskSpec.from_json(mask_json) if mask_json else None
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                t0 = time.perf_counter()
                n_rows_before = len(rows)
                doc_plan = _cached_plan(r.header, cfg_l, mask_l)
                h = doc_plan.header
                data = np.frombuffer(r.payload, dtype=np.uint8).reshape(
                    -1, h.nchan)
                sub_h = Header(**{**json.loads(r.header),
                                  "nsamp": data.shape[0]})
                sub_plan = _cached_plan(sub_h.to_json(), cfg_l, mask_l)
                # Mask offsets are absolute: shift the sub-plan's view by
                # processing with offset-aware mask windows.  check_mask
                # uses starttime = offset*tsamp with offset relative to
                # document start, so we process with a data-level offset
                # by temporarily translating: the block loop's `isamp` is
                # chunk-relative; chunk_start is added via mask shim.
                out, metrics = _process_chunk(data, sub_plan,
                                              int(r.chunk_start))
                for d in range(out.shape[0]):
                    rows.append({
                        "doc_id": r.doc_id, "chunk_id": int(r.chunk_id),
                        "n_chunks": int(r.n_chunks), "dm_index": d,
                        "series": np.ascontiguousarray(
                            out[d], dtype="<f4").tobytes(),
                        "kind": "timeseries", "text": None,
                        "media_ref": "dm://%.3f" % float(sub_plan.dmlist[d]),
                        "offset": d})
                if int(r.chunk_id) == 0:
                    ndm = len(sub_plan.dmlist)
                    for d, dm in enumerate(sub_plan.dmlist):
                        dmv = float(np.float32(dm))
                        rows.append({
                            "doc_id": r.doc_id, "chunk_id": 0,
                            "n_chunks": int(r.n_chunks),
                            "dm_index": ndm + d, "series": None,
                            "kind": "inf",
                            "text": writeinf_text(
                                h, cfg_l.prefix, dmv,
                                nsamp_dec=doc_plan.nsamp_dec,
                                tsamp_dec=doc_plan.tsamp_dec,
                                shift_back=doc_plan.max_delay),
                            "media_ref": "inf://%s_DM%.3f.inf"
                                         % (cfg_l.prefix, dmv),
                            "offset": d})
                    for mi, m in enumerate(_media_list(r.media)):
                        rows.append({
                            "doc_id": r.doc_id, "chunk_id": 0,
                            "n_chunks": int(r.n_chunks),
                            "dm_index": 2 * ndm + mi, "series": None,
                            "kind": "media", "text": m.get("text", ""),
                            "media_ref": m["media_ref"],
                            "offset": int(m["offset"])})
                # n_spans_out: spans emitted for this chunk (matches
                # the per-document path's len(spans) semantics).
                n_emitted = len(rows) - n_rows_before
                mrow = _metrics_row(r.doc_id, metrics, n_emitted,
                                    (time.perf_counter() - t0) * 1e3,
                                    run_id, cfg_l, int(r.chunk_id),
                                    int(r.n_chunks))
                rows.append({"doc_id": r.doc_id, "chunk_id": int(r.chunk_id),
                             "n_chunks": int(r.n_chunks),
                             "dm_index": 1 << 30, "series": None,
                             "kind": "metrics", "text": mrow["text"],
                             "media_ref": "", "offset": -1})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in _CHUNK_OUT_SCHEMA])

    parts = chunks.mapInPandas(proc_chunk, _CHUNK_OUT_SCHEMA)

    # JVM-side reassembly: per (doc, dm) sort chunk series and concat the
    # binary payloads; the only shuffle of the chunked path.
    ts = (parts.where(F.col("kind") == "timeseries")
          .groupBy("doc_id", "dm_index", "media_ref")
          .agg(F.aggregate(
              F.transform(
                  F.array_sort(
                      F.collect_list(F.struct("chunk_id", "series"))),
                  lambda s: s.series),
              F.lit(b""), lambda acc, x: F.concat(acc, x)).alias("raw"))
          .select("doc_id", F.col("dm_index").cast("int").alias("seq"),
                  F.lit("timeseries").alias("kind"),
                  # Spark's base64 is MIME (76-char lines); canonical
                  # base64 has no line breaks.
                  F.regexp_replace(F.base64("raw"), "\r\n", "")
                   .alias("text"), "media_ref",
                  F.col("dm_index").cast("int").alias("offset")))
    rest = (parts.where(F.col("kind") != "timeseries")
            .select("doc_id", F.col("dm_index").cast("int").alias("seq"),
                    "kind", "text", "media_ref", "offset"))
    return ts.unionByName(rest)


def _process_chunk(data: np.ndarray, sub_plan: DedispPlan,
                   chunk_start: int) -> tuple[np.ndarray, dict]:
    """Run the block loop on a chunk.  The rfifind-mask interval lookup
    uses absolute document time (``offset*tsamp``), so translate the
    chunk's offsets by processing with a shifted-plan shim."""
    if chunk_start == 0 or sub_plan.mask is None or not sub_plan.cfg.use_mask:
        return process_document(data, sub_plan)
    # Shift mask windows: wrap process_document with an offset by running
    # it manually — simplest correct route: temporarily extend the data
    # coordinates via a plan whose apply_mask sees absolute offsets.
    return process_document(data, sub_plan, offset0=chunk_start)


def nest_spans(rows: DataFrame) -> DataFrame:
    """Re-nest exploded span rows to the mandated output table shape
    ``(doc_id, spans array<struct>)`` — one shuffle, used only when the
    nested shape is required downstream."""
    return (rows.where(F.col("kind") != "metrics")
            .groupBy("doc_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("seq", "kind", "text", "media_ref", "offset"))),
                lambda s: F.struct(s.kind.alias("kind"), s.text.alias("text"),
                                   s.media_ref.alias("media_ref"),
                                   s.offset.alias("offset"))).alias("spans")))


# --------------------------------------------------------------------------
# Job runner: checkpoint / resume / lineage
# --------------------------------------------------------------------------

CHECKPOINT_COLS = ["run_id", "config_id", "doc_id", "chunk_id", "status",
                   "n_blocks", "n_spans_out", "n_sk_masked_intervals",
                   "n_clipped_samples", "wall_ms", "partition_id",
                   "code_version"]


def run_job(spark: SparkSession, docs: DataFrame | str, cfg: RunConfig,
            mask: MaskSpec | None, out_dir: str, *, run_id: str = "run0",
            resume: bool = True, chunked: bool = False,
            parallelism: int | None = None) -> dict:
    """Execute the pipeline with resume semantics.

    Output layout: ``{out_dir}/spans`` parquet (span rows + inline
    metrics rows, appended), ``{out_dir}/checkpoint`` parquet (derived,
    overwritten).  Resume anti-joins the input against documents whose
    metrics row is already present for (run_id, config_id) — only
    incomplete documents are recomputed.
    """
    if isinstance(docs, str):
        docs = spark.read.parquet(docs)
    spans_path = f"{out_dir}/spans"
    ckpt_path = f"{out_dir}/checkpoint"

    n_input = docs.count()
    n_skipped = 0
    if resume:
        try:
            done = (spark.read.parquet(spans_path)
                    .where(F.col("kind") == "metrics")
                    .where(F.get_json_object("text", "$.run_id") == run_id)
                    .where(F.get_json_object("text", "$.config_id")
                           == cfg.config_id)
                    .select("doc_id").distinct())
            before = n_input
            docs = docs.join(done, "doc_id", "left_anti")
            n_remaining = docs.count()
            n_skipped = before - n_remaining
        except Exception:
            n_remaining = n_input
    else:
        n_remaining = n_input

    if n_remaining > 0:
        runner = run_pipeline_chunked if chunked else run_pipeline
        rows = runner(docs, cfg, mask, run_id=run_id,
                      parallelism=parallelism)
        rows.write.mode("append").parquet(spans_path)
    elif n_input == 0 and not Path(f"{spans_path}/_SUCCESS").exists():
        # Nothing ever written for this out_dir: return cleanly instead
        # of crashing on the missing spans path below.
        return {"n_input": 0, "n_skipped": n_skipped, "n_processed": 0}

    # Derived checkpoint table (FIXTURES.md §5) from the written metrics
    # rows — reads only matching row groups via parquet predicate pushdown.
    all_rows = spark.read.parquet(spans_path)
    ckpt = (all_rows.where(F.col("kind") == "metrics")
            .select("doc_id", F.col("text").alias("m"))
            .select(
                F.get_json_object("m", "$.run_id").alias("run_id"),
                F.get_json_object("m", "$.config_id").alias("config_id"),
                "doc_id",
                F.get_json_object("m", "$.chunk_id").cast("int")
                 .alias("chunk_id"),
                F.get_json_object("m", "$.status").alias("status"),
                F.get_json_object("m", "$.n_blocks").cast("int")
                 .alias("n_blocks"),
                F.get_json_object("m", "$.n_spans_out").cast("int")
                 .alias("n_spans_out"),
                F.get_json_object("m", "$.n_sk_masked_intervals").cast("int")
                 .alias("n_sk_masked_intervals"),
                F.get_json_object("m", "$.n_clipped_samples").cast("int")
                 .alias("n_clipped_samples"),
                F.get_json_object("m", "$.wall_ms").cast("double")
                 .alias("wall_ms"),
                F.get_json_object("m", "$.partition_id").cast("int")
                 .alias("partition_id"),
                F.get_json_object("m", "$.code_version")
                 .alias("code_version")))
    ckpt.write.mode("overwrite").parquet(ckpt_path)
    return {"n_input": n_input, "n_skipped": n_skipped,
            "n_processed": n_remaining}

#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default mode (what the driver runs per-round): execute every headline
query from ``__spark_entry__.queries()`` plus the flagship dedispersion
pipeline over ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``)
on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...}

``--scaling`` mode: run the identical flagship job at two parallelism
levels (local[8] vs local[32], a true 4x core ratio on this 32-core
box — the sandbox proxy for N vs 4N executors per the north rule),
3 runs each, median throughput, and write ``BENCH/BASELINE.md`` with
both throughputs and the scaling efficiency  eff = tput(4N)/(4*tput(N))
(target >= 0.8).

``--flagship-only --cores N`` is the subprocess worker for --scaling
(separate process per parallelism level so each JVM gets a clean
``local[N]`` master).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BENCH_CORPUS = "bench"
CORPUS_CACHE = "/tmp/dragnet_corpus_bench.parquet"


def get_session(cores: int):
    from dragnet_spark.session import get_spark
    return get_spark(app_name=f"bench-{cores}", cores=cores,
                     shuffle_partitions=max(cores, 8))


def ensure_corpus(spark) -> int:
    """Materialize the bench corpus once (cached across runs); returns
    the document count."""
    from dragnet_spark.generate import CORPORA, write_corpus_parquet_spark
    ndocs = CORPORA[BENCH_CORPUS][0]
    marker = Path(CORPUS_CACHE) / "_SUCCESS"
    if not marker.exists():
        write_corpus_parquet_spark(spark, BENCH_CORPUS, CORPUS_CACHE)
    return ndocs


def run_flagship(spark, ndocs: int) -> float:
    """One timed flagship run: read the spans corpus -> fused
    zap/SK/decimate/dedisperse kernel -> force materialization.
    Returns wall seconds."""
    from pyspark.sql import functions as F

    from dragnet_spark.generate import scenario_configs
    from dragnet_spark.pipeline import run_pipeline

    cfg = scenario_configs(BENCH_CORPUS)["s3"]  # SKZ on: real cleaning load
    docs = spark.read.parquet(CORPUS_CACHE)
    t0 = time.perf_counter()
    rows = run_pipeline(docs, cfg, None)
    # Force every span (length touches the decoded series text).
    n = (rows.where(F.col("kind") != "metrics")
         .agg(F.count(F.lit(1)), F.sum(F.length("text"))).collect())
    elapsed = time.perf_counter() - t0
    assert n[0][0] > 0
    return elapsed


def flagship_only(cores: int, runs: int) -> None:
    spark = get_session(cores)
    ndocs = ensure_corpus(spark)
    for _ in range(2):  # warm-up (JIT of generated code, Arrow paths)
        run_flagship(spark, ndocs)
    times = [run_flagship(spark, ndocs) for _ in range(runs)]
    spark.stop()
    med = sorted(times)[len(times) // 2]
    print(json.dumps({"cores": cores, "ndocs": ndocs, "runs": times,
                      "median_sec": med, "docs_per_sec": ndocs / med}))


def scaling(runs: int) -> None:
    results = {}
    for cores in (8, 32):
        # Pin the whole process tree (JVM + Python workers) to exactly
        # `cores` CPUs: plain local[8] on a 32-core box lets the Python
        # workers overflow onto the 24 idle cores, inflating the N-core
        # baseline — a real 8-core executor has no spare cores.
        cmd = [sys.executable, __file__, "--flagship-only",
               "--cores", str(cores), "--runs", str(runs)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True,
                             check=True, cwd=REPO)
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = t32 / (4.0 * t8)
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured throughput & scaling efficiency

Flagship job: fused dedispersion pipeline (zap -> SK zap -> decimate ->
dedisperse, scenario `s3`) over the deterministic `bench` corpus
({results[8]['ndocs']} documents x 128 chan x 8192 samples, seed 42;
`dragnet_spark/generate.py`), identical input at both parallelism
levels.  Per the driver instruction, local[8] vs local[32] on the same
32-core host is the sandbox proxy for N vs 4N executors; each run is
CPU-pinned (`taskset -c 0-N`) so the JVM + Python workers of the
local[8] job really share 8 cores, as an 8-core executor would.

| parallelism | runs (sec) | median sec | docs/sec |
|---|---|---|---|
| local[8]  (N)  | {', '.join(f'{t:.2f}' for t in results[8]['runs'])} | {results[8]['median_sec']:.2f} | {t8:.1f} |
| local[32] (4N) | {', '.join(f'{t:.2f}' for t in results[32]['runs'])} | {results[32]['median_sec']:.2f} | {t32:.1f} |

**Scaling efficiency** = docs_per_sec(4N) / (4 x docs_per_sec(N)) =
{t32:.1f} / (4 x {t8:.1f}) = **{eff:.3f}** (north-rule target >= 0.8:
{'MET' if eff >= 0.8 else 'NOT MET'}).

Reproduce: `python bench.py --scaling` (3 timed runs per level after
two warm-up runs; median reported).
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(json.dumps({"docs_per_sec_8": t8, "docs_per_sec_32": t32,
                      "scaling_efficiency": eff}))


def driver_bench() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    import __spark_entry__ as entry_mod

    spark = get_session(cores)
    ndocs = ensure_corpus(spark)

    timings: dict[str, float] = {}
    qs = entry_mod.queries()
    qs.pop("dedisperse_tiny", None)  # tiny smoke — benched at scale below
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Flagship at bench scale (1024 docs, 1 GiB raw spectra).
    for _ in range(2):  # warm-up (JIT of generated code, Arrow paths)
        run_flagship(spark, ndocs)
    fl = run_flagship(spark, ndocs)
    timings["dedisperse_bench"] = round(fl, 3)
    spark.stop()

    print(json.dumps({
        "metric": "headline query latency + flagship dedispersion wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "flagship_docs_per_sec": round(ndocs / fl, 1),
        "cores": cores,
    }))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--flagship-only", action="store_true")
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--runs", type=int, default=3)
    a = p.parse_args()
    if a.flagship_only:
        flagship_only(a.cores, a.runs)
    elif a.scaling:
        scaling(a.runs)
    else:
        driver_bench()


if __name__ == "__main__":
    main()

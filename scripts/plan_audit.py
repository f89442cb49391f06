#!/usr/bin/env python
"""Physical-plan audit: `.explain("formatted")` for the headline
queries, with assertions on the plan features that matter at 100 TB —
predicate pushdown reaching the parquet scan, column pruning
(ReadSchema), broadcast joins for dim lookups, and no unexpected
shuffle (Exchange) on the per-document pipeline path.

Writes PLANS.md (plan snapshots + the checked invariants) and exits
non-zero if any invariant fails.  Run: python scripts/plan_audit.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.queries import QUERIES  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# query -> (must_contain regexes, must_not_contain regexes)
CHECKS: dict[str, tuple[list[str], list[str]]] = {
    # Dim joins must broadcast, never shuffle the fact side.
    "revenue_by_nation": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    "telescope_lookup": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    "interval_mask_join": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    # Scan-agg: partial aggregation before the exchange (map-side combine).
    # No filter in Q1; assert column pruning: the scan must read only
    # the 5 needed lineitem columns, not l_orderkey etc.
    "pricing_summary": ([r"HashAggregate.*Partial|partial_",
                         r"ReadSchema[^\n]*l_returnflag"],
                        [r"ReadSchema[^\n]*l_orderkey"]),
    "zero_dm_sum": ([r"partial_|Partial"], []),
    # Filter must reach the scan.
    "dedup_exact": ([r"ReadSchema[^\n]*text"], []),
    # De-collected round 2: fully distributed plans — no driver-side
    # materialization (LocalTableScan was the collect+createDataFrame
    # shape) and no CollectLimit anywhere.
    "dedup_jaccard": ([], [r"LocalTableScan", r"CollectLimit",
                           # r3: persist-free — nothing may read from a
                           # cached relation
                           r"InMemoryTableScan"]),
    "embedding_near_dup": ([], [r"LocalTableScan", r"CollectLimit"]),
    # Top-k must be a TakeOrdered (map-side partial top-k), never a
    # global Sort + CollectLimit.
    "token_topk": ([r"TakeOrderedAndProject"], [r"LocalTableScan"]),
    # Stratified sampling: pure scan-side aggregation, no join at all.
    "sample_stratified": ([r"partial_|Partial"],
                          [r"Join", r"LocalTableScan"]),
    # Contamination: the eval n-gram set must broadcast against the
    # exploded training stream (a benchmark suite vs 10^12 docs).
    "contamination_ngrams": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    # Repetition quality: zero shuffles — a single narrow scan-project.
    "quality_repetition": ([], [r"Exchange", r"Join"]),
    # Quantization: embarrassingly parallel — zero shuffles/joins.
    "embedding_quantize": ([], [r"Exchange", r"Join"]),
    # Histogram quantiles: partial (map-side) counts before the
    # exchange; the scan must be pruned to lang+n_chars (never text).
    "length_quantiles": ([r"partial_|Partial",
                          r"ReadSchema[^\n]*n_chars"],
                         [r"ReadSchema[^\n]*text"]),
    # TF-IDF: the vocab-sized df relation broadcasts back onto tf;
    # nothing materializes on the driver.
    "tfidf_topterms": ([r"BroadcastHashJoin"],
                       [r"LocalTableScan", r"CollectLimit"]),
    # Quantized ANN: broadcast query codes + map-side partial top-k;
    # never an all-pairs cartesian.
    "ann_quantized_topk": ([r"TakeOrderedAndProject"],
                           [r"CartesianProduct"]),
    # Two-stage rescore: the 50-row shortlist BROADCASTS against the
    # embeddings scan (stage 2 never shuffles the corpus) and both
    # stages end in TakeOrdered.
    "ann_quantized_rescore": ([r"TakeOrderedAndProject",
                               r"BroadcastHashJoin"],
                              [r"SortMergeJoin", r"CartesianProduct"]),
    # Merged per-doc relations stay single narrow scan-projects:
    # zero shuffles, zero joins (the r5 consolidation must not have
    # introduced a join where a second query used to run).
    "text_quality": ([], [r"Exchange", r"Join"]),
    "doc_fingerprint": ([], [r"Exchange", r"Join"]),
    # Merged per-key aggregates join PRE-AGGREGATED sides on the tiny
    # group key — never a cartesian, never a driver-side collect.
    "token_counts": ([], [r"CartesianProduct", r"LocalTableScan"]),
    "channel_stats": ([], [r"CartesianProduct", r"LocalTableScan"]),
    "robust_stats": ([], [r"CartesianProduct", r"LocalTableScan"]),
    # Sessionize: both window specs and the session aggregation ride
    # ONE user_id exchange (the single-exchange invariant is pinned
    # exactly in tests/test_training_ops.py); partial agg present.
    "events_sessionize": ([r"Window", r"partial_|Partial"],
                          [r"CartesianProduct"]),
    # Curation gate: the eval n-gram set broadcasts (never shuffles
    # the corpus against the benchmark suite); no driver-side collect.
    "curate_decisions": ([r"BroadcastHashJoin"],
                         [r"CartesianProduct", r"LocalTableScan",
                          r"CollectLimit"]),
    # Segment dedup: join-free — the fingerprint window rides one
    # segment-level exchange and the per-doc rollup is partial-agg'd
    # map-side before its (tiny) doc_id exchange.
    "dedup_segments": ([r"Window", r"partial_|Partial"],
                       [r"HashJoin", r"SortMergeJoin",
                        r"CartesianProduct", r"LocalTableScan"]),
    # HLL sketch: the mergeable map-side partial max per register is
    # the whole point — it must appear before the register exchange;
    # the only join is the benign 1-row x 1-row cross of the two
    # final aggregates.
    "approx_distinct_hll": ([r"partial_max"],
                            [r"SortMergeJoin", r"CartesianProduct",
                             r"LocalTableScan"]),
    # MinHash LSH: banded bucket self-join — a hash join on
    # (band, bucket), NEVER an all-pairs nested loop over the corpus.
    "dedup_minhash_lsh": ([r"HashJoin|SortMergeJoin"],
                          [r"CartesianProduct",
                           r"BroadcastNestedLoopJoin",
                           r"LocalTableScan"]),
    # Merged simhash (sig + pairs grains): the banded self-join is a
    # hash join, never all-pairs; the one-scan exchange-reuse claim is
    # pinned on the EXECUTED plan in tests/test_training_ops.py (AQE
    # finalizes ReusedExchange at runtime, not in the static plan).
    "dedup_simhash": ([r"HashJoin|SortMergeJoin"],
                      [r"CartesianProduct", r"BroadcastNestedLoopJoin",
                       r"LocalTableScan"]),
    # PII scrub: a single narrow scan-projection — regex count/replace
    # are JVM codegen expressions; zero shuffles, zero joins.
    "pii_redact": ([r"ReadSchema[^\n]*text"], [r"Exchange", r"Join"]),
    # Incremental dedup (EXTRA_QUERIES — beyond the gate cap): the
    # batch x corpus band join is a hash join, never all-pairs, and
    # nothing materializes driver-side; the executed-plan pins (split
    # predicate pushed into every scan, no shingle array on any
    # exchange) live in tests/test_training_ops.py.
    "dedup_incremental": ([r"HashJoin|SortMergeJoin"],
                          [r"CartesianProduct",
                           r"BroadcastNestedLoopJoin",
                           r"LocalTableScan", r"InMemoryTableScan"]),
    # Keep-best representative (EXTRA_QUERIES): the per-cluster argmax
    # is an AGGREGATION over a (quality, -doc_id) struct (partial/map-
    # side combinable), never a per-component window sort; the tiny
    # label and one-row-per-cluster rep relations broadcast back
    # against the corpus.
    "dedup_keep_best": ([r"BroadcastHashJoin", r"partial_max"],
                        [r"CartesianProduct",
                         r"BroadcastNestedLoopJoin", r"Window"]),
    # Sequence packing (EXTRA_QUERIES): the global token prefix-sum is
    # the two-level scan — per-bucket partial sums, bucket offsets
    # broadcast back, per-bucket Window partitioned by g; bin fan-out
    # is a bounded sequence-explode, never a cartesian.  The
    # exactly-one-SinglePartition pin (the tiny bucket relation) lives
    # in tests/test_training_ops.py.
    "sequence_pack": ([r"partial_sum", r"BroadcastHashJoin",
                       r"windowspecdefinition\(g#"],
                      [r"CartesianProduct",
                       r"BroadcastNestedLoopJoin", r"LocalTableScan"]),
    # Bigram-LM cross-entropy (EXTRA_QUERIES): both count relations
    # are map-side-combinable partial aggs joined back WITHOUT hints
    # (broadcast below the threshold, pre-aggregated shuffle join at
    # web vocab); the per-doc position-ordered fold reassembles via a
    # partial collect_list, and the portable-ln stays in codegen (no
    # BatchEvalPython anywhere).  The only nested-loop join is the
    # benign broadcast cross of the ONE-ROW vocabulary scalar (the
    # same allowance approx_distinct_hll's final cross carries).
    "lm_perplexity": ([r"partial_count", r"partial_collect_list"],
                      [r"CartesianProduct",
                       r"BatchEvalPython", r"LocalTableScan"]),
    # DSIR importance weights (EXTRA_QUERIES): both bucket-count
    # relations are CONSTANT-size (4096 rows), so the explicit
    # broadcast hints are safe at any corpus scale (the opposite of
    # the vocab-sized tfidf case); counts are map-side partials, the
    # per-doc fold reassembles via partial collect_list, the portable
    # ln stays in codegen.  The one-row totals cross is the benign
    # scalar broadcast.
    "dsir_weights": ([r"partial_count", r"partial_collect_list",
                      r"BroadcastHashJoin"],
                     [r"CartesianProduct",
                      r"BatchEvalPython", r"LocalTableScan"]),
    # Mixture budget sampling (EXTRA_QUERIES): the keyed two-level
    # scan — per-(source, key-prefix-bucket) partial sums, per-source
    # offsets window over the tiny bucket relation, broadcast back —
    # leaves NO SinglePartition exchange anywhere (the naive
    # per-source Window is a one-task-per-source skew disaster).
    "mixture_budget_sample": ([r"partial_sum", r"BroadcastHashJoin",
                               r"windowspecdefinition\(source#"],
                              [r"CartesianProduct", r"SinglePartition",
                               r"BroadcastNestedLoopJoin",
                               r"LocalTableScan"]),
    # DoReMi domain reweighting (EXTRA_QUERIES): the rollup above the
    # separately-audited lm_perplexity chain is one partial-agg to
    # #domains rows; the portable exp stays in codegen; only
    # nested-loop joins are the benign one-row scalar broadcasts
    # (vocab V and normalizer Z).
    "domain_reweight": ([r"partial_sum", r"partial_count"],
                        [r"CartesianProduct", r"BatchEvalPython",
                         r"LocalTableScan"]),
    # SemDeDup (EXTRA_QUERIES): clustering is the shared exact Lloyd
    # update (its <= 16-row centroid broadcasts are the only
    # nested-loop joins); the pairwise stage is ONE equi-join on the
    # cluster key with a map-side partial MAX — cluster-confined,
    # never a corpus-level cartesian.
    "semantic_dedup": ([r"partial_max"],
                       [r"CartesianProduct", r"BatchEvalPython",
                        r"LocalTableScan"]),
    # BM25 (EXTRA_QUERIES): per-doc tf/dl are per-row array exprs (no
    # explode), the corpus stats collapse to ONE broadcast row, and
    # the top-10 is a TakeOrdered — the corpus never shuffles.
    "bm25_topk": ([r"TakeOrderedAndProject", r"partial_count"],
                  [r"SortMergeJoin", r"CartesianProduct",
                   r"BatchEvalPython", r"LocalTableScan"]),
    # ExactSubstr duplicated-window fraction (EXTRA_QUERIES): one
    # exploded-window scan shuffles on the fingerprint (map-side
    # partial count), the count joins back on the same key, the
    # per-doc rollup rides doc_id — giant docs fan out across the
    # fingerprint space instead of hot-spotting.
    "dedup_substrings": ([r"partial_count"],
                         [r"CartesianProduct", r"BatchEvalPython",
                          r"LocalTableScan"]),
    # Interleaved media-text curation (EXTRA_QUERIES): embarrassingly
    # parallel — ZERO shuffles/joins, one narrow scan-project.
    "interleaved_filter": ([], [r"Exchange", r"Join",
                                r"BatchEvalPython", r"LocalTableScan"]),
    # Multimodal packing (EXTRA_QUERIES): the greedy walk is a bounded
    # per-doc JVM fold — zero shuffles/joins, docs pack independently.
    "interleaved_pack": ([], [r"Exchange", r"Join",
                              r"BatchEvalPython", r"LocalTableScan"]),
    # Hashed linear classifier (EXTRA_QUERIES): per-row hash + fold,
    # zero shuffles/joins — the fastText-scoring production shape.
    "quality_classifier": ([], [r"Exchange", r"Join",
                                r"BatchEvalPython", r"LocalTableScan"]),
    # Token entropy (EXTRA_QUERIES): per-row sort + boundary
    # differencing + flat ln transform — zero shuffles/joins.
    "quality_entropy": ([], [r"Exchange", r"Join",
                             r"BatchEvalPython", r"LocalTableScan"]),
    # LSH-blocked kNN graph (EXTRA_QUERIES): per-(band, bucket)
    # candidate self-join + per-src row_number top-k — never a
    # corpus-level cartesian, nothing Python.
    "ann_graph_knn": ([r"Window"],
                      [r"CartesianProduct", r"BatchEvalPython",
                       r"LocalTableScan"]),
    # Temperature mixture weights (EXTRA_QUERIES): partial-agg rollup
    # to #sources rows + one-row fixed-point normalizer broadcast.
    "mixture_temperature": ([r"partial_count"],
                            [r"CartesianProduct", r"BatchEvalPython",
                             r"LocalTableScan"]),
    # T5 span-corruption accounting (EXTRA_QUERIES): per-row PRF
    # arithmetic, zero shuffles/joins.
    "span_corruption": ([], [r"Exchange", r"Join",
                             r"BatchEvalPython", r"LocalTableScan"]),
    # Contrastive pair mining (EXTRA_QUERIES): the kNN-graph shape
    # with a (src, kind) window — per-(band, bucket), never cartesian.
    "hard_negatives": ([r"Window"],
                       [r"CartesianProduct", r"BatchEvalPython",
                        r"LocalTableScan"]),
    # Winnowing fingerprints (EXTRA_QUERIES): per-row string/array
    # arithmetic, zero shuffles/joins.
    "fingerprint_winnow": ([], [r"Exchange", r"Join",
                                r"BatchEvalPython", r"LocalTableScan"]),
    # Bloom sketch (EXTRA_QUERIES): one map-side-combinable BIT_OR
    # aggregation to <= 2048 rows — the mergeable-sketch shape.
    "dedup_bloom": ([r"partial_bit_or"],
                    [r"Join", r"CartesianProduct",
                     r"BatchEvalPython", r"LocalTableScan"]),
    # Per-source curation report (EXTRA_QUERIES): the audited curate
    # chain + one doc_id join + a rollup + a per-source window over
    # the tiny (source, reason) relation.
    "curate_report": ([r"partial_count",
                       r"windowspecdefinition\(source#"],
                      [r"CartesianProduct", r"BatchEvalPython"]),
    # BPE round-1 merge stats (EXTRA_QUERIES): token_topk's shape one
    # level down — partial count + TakeOrdered.
    "bpe_merges": ([r"TakeOrderedAndProject", r"partial_count"],
                   [r"Join", r"CartesianProduct",
                    r"BatchEvalPython", r"LocalTableScan"]),
    # Per-source bottom-k sample (EXTRA_QUERIES): both rank-limited
    # windows run as WindowGroupLimit (partial top-k before the sort).
    "sample_bottomk": ([r"WindowGroupLimit"],
                       [r"Join", r"CartesianProduct",
                        r"BatchEvalPython", r"LocalTableScan"]),
    # Code-switch detection (EXTRA_QUERIES): nested per-row
    # transforms, zero shuffles/joins.
    "lang_switches": ([], [r"Exchange", r"Join",
                           r"BatchEvalPython", r"LocalTableScan"]),
}


def audit() -> int:
    spark = get_spark(app_name="plan-audit", cores=4, shuffle_partitions=4)
    try:
        return _audit(spark)
    finally:
        spark.stop()


def _audit(spark) -> int:
    sections = []
    failures = []
    for name, (must, must_not) in CHECKS.items():
        # One broken query must surface as a recorded FAILURE in the
        # regenerated PLANS.md, not abort the audit and leave a stale
        # file still claiming "All invariants hold".
        try:
            from dragnet_spark.queries import EXTRA_QUERIES
            fn = QUERIES.get(name) or EXTRA_QUERIES[name]
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                     .fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: plan build failed: {e}")
            sections.append((name, f"PLAN BUILD FAILED: {e}"))
            continue
        for pat in must:
            if not re.search(pat, plan):
                failures.append(f"{name}: missing /{pat}/")
        for pat in must_not:
            if re.search(pat, plan):
                failures.append(f"{name}: unwanted /{pat}/")
        sections.append((name, plan))

    # Per-document pipeline: no Exchange before the kernel stage.
    from dragnet_spark.generate import make_corpus, scenario_configs
    from dragnet_spark.pipeline import docs_to_df, run_pipeline
    docs = docs_to_df(spark, make_corpus("tiny"))
    rows = run_pipeline(docs, scenario_configs("tiny")["s0"], None)
    plan = rows._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
             .fromString("formatted"))
    # Shuffle-specific pattern for FORMATTED explain output, where a
    # shuffle node renders as "(N) Exchange" (its hashpartitioning
    # detail sits on a separate Arguments: line) and broadcasts as
    # "(N) BroadcastExchange" — a plain /Exchange/ would false-fail
    # on broadcasts, and an /Exchange hashpartitioning/ pattern never
    # matches formatted mode at all (vacuous check).
    if re.search(r"\(\d+\) Exchange\b", plan):
        failures.append("run_pipeline: unexpected shuffle Exchange in the "
                        "per-document path")
    sections.append(("run_pipeline (per-document fused path)", plan))

    # Per-DM partitioned sink: a single-DM read must be pruned to its
    # one dm= partition at the scan.
    from dragnet_spark.io import write_timeseries_partitioned
    perdm = "/tmp/dragnet_plan_audit_perdm.parquet"
    write_timeseries_partitioned(rows, perdm)
    rd = spark.read.parquet(perdm).where(F.col("dm") == "25.000")
    plan = rd._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
             .fromString("formatted"))
    if not re.search(r"PartitionFilters: \[[^\]]*dm", plan):
        failures.append("perdm sink: partition filter did not reach the scan")
    sections.append(("write_timeseries_partitioned (single-DM read)", plan))

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("# PLANS.md — audited physical plans\n\n"
                "Generated by `scripts/plan_audit.py` (sf0.01 inputs; "
                "plans are scale-invariant).  Invariants checked:\n"
                "broadcast joins for dims, partial aggregation before "
                "exchanges, pushdown/pruning at the scan, and a "
                "shuffle-free per-document pipeline.\n\n")
        if failures:
            f.write("## FAILURES\n\n" +
                    "\n".join(f"- {x}" for x in failures) + "\n\n")
        else:
            f.write("All invariants hold.\n\n")
        for name, plan in sections:
            f.write(f"## {name}\n\n```\n{plan.strip()}\n```\n\n")
    if failures:
        print("\n".join(failures))
        return 1
    print(f"plan audit OK ({len(sections)} plans) -> PLANS.md")
    return 0


if __name__ == "__main__":
    sys.exit(audit())

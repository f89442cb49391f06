"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship operator (incoherent
dedispersion over the interleaved-span documents table) after loading
the sf0.001 parquet tables; ``queries()``/``oracle_sql()`` expose the
operator inventory (SURVEY.md §2 relational cross-checks + the
training-data operators) checked against DuckDB at sf0.01.

Local replica of the driver's gate: ``python scripts/selfcheck.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _flagship_rows(spark: SparkSession) -> DataFrame:
    """Dedispersion pipeline on the deterministic tiny corpus; spans
    returned as exploded rows with a stable schema (text hashed — the
    raw series is MBs of base64)."""
    from dragnet_spark.generate import make_corpus, scenario_configs
    from dragnet_spark.pipeline import docs_to_df, run_pipeline

    docs = docs_to_df(spark, make_corpus("tiny"))
    rows = run_pipeline(docs, scenario_configs("tiny")["s0"], None)
    return (rows.where(F.col("kind") != "metrics")
            .select("doc_id", "seq", "kind",
                    F.sha2(F.coalesce(F.col("text"), F.lit("")), 256)
                     .alias("text_sha256"),
                    "media_ref", "offset"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 and a stable schema."""
    sf_dir = "/root/testdata/sf0.001"
    # Load the sf0.001 tables (smoke: the engine reads the driver corpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Explicit raise, not assert: stripped under python -O.
    if docs.limit(1).count() < 1:
        raise RuntimeError("driver corpus is empty")
    return _flagship_rows(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data operator suite (dragnet_spark/queries.py) and the
    flagship dedispersion entries, DuckDB-checkable via the band-join
    identity (dragnet_spark/flagship_oracle.py).

    The FLAGSHIP entries come FIRST and the total is capped at 50:
    the driver's correctness gate checks at most 50 queries, and in
    round 4 the five highest-value rows (chunked path, SK fill,
    clipper EWMA, both metrics families) silently fell off the end of
    the dict (r4 verdict #1).  Near-duplicate operator variants are
    merged into single multi-column relations in QUERIES so every
    computation stays under the gate."""
    from dragnet_spark.flagship_oracle import FLAGSHIP_QUERIES
    from dragnet_spark.queries import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = \
        dict(FLAGSHIP_QUERIES)
    # The two families must be DISJOINT: queries() would resolve a
    # name collision toward QUERIES while oracle_sql() resolves toward
    # the flagship oracles — the gate would then check a query against
    # the other family's oracle, and the <=50 assert cannot catch it
    # (a collision lowers the count).
    overlap = set(FLAGSHIP_QUERIES) & set(QUERIES)
    if overlap:    # explicit raise: asserts are stripped under -O
        raise RuntimeError(
            f"query name collision across families: {overlap}")
    out.update(QUERIES)
    if len(out) > 50:
        raise RuntimeError(
            f"{len(out)} queries exposed — the driver gate caps at 50; "
            "merge or drop entries (see QUERIES docstring)")
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query — see
    dragnet_spark/oracle_sql.py for the determinism rules and
    dragnet_spark/flagship_oracle.py for the flagship band-join
    oracles (which export their sample decomposition on build)."""
    from dragnet_spark.flagship_oracle import flagship_oracle_sql
    from dragnet_spark.oracle_sql import ORACLE_SQL

    out = dict(ORACLE_SQL)
    out.update(flagship_oracle_sql())
    return out

"""Iceberg catalog path (north rule's table format), exercised only
when an iceberg-spark-runtime jar is present (``find_iceberg_jar``);
this sandbox ships none, so these tests skip here and run wherever the
jar exists — the catalog wiring itself (session.py) and the
table:/parquet dispatch (io.py) are code either way."""

import pytest

from dragnet_spark.session import find_iceberg_jar

pytestmark = pytest.mark.skipif(
    find_iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar in this environment "
           "(pip index unavailable in-sandbox; documented in COVERAGE.md)")


def test_documents_table_iceberg_roundtrip(spark):
    from dragnet_spark.generate import make_corpus
    from dragnet_spark.io import (iceberg_available, read_documents,
                                  write_documents)
    from dragnet_spark.pipeline import docs_to_df

    assert iceberg_available(spark)
    docs = make_corpus("tiny")
    df = docs_to_df(spark, docs)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    write_documents(df, "table:local.db.documents_test", mode="overwrite")
    back = read_documents(spark, "table:local.db.documents_test")
    assert back.count() == len(docs)
    a = {r.doc_id: r.spans for r in df.collect()}
    b = {r.doc_id: r.spans for r in back.collect()}
    assert a == b


def test_iceberg_snapshot_isolation_for_resume(spark):
    """The resume anti-join's snapshot guarantee: appends after a read
    do not change that read's snapshot."""
    from dragnet_spark.generate import make_corpus
    from dragnet_spark.io import write_documents
    from dragnet_spark.pipeline import docs_to_df

    docs = make_corpus("tiny")
    df = docs_to_df(spark, docs)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    write_documents(df, "table:local.db.documents_snap", mode="overwrite")
    snap = (spark.sql("SELECT snapshot_id FROM "
                      "local.db.documents_snap.snapshots "
                      "ORDER BY committed_at DESC LIMIT 1")
            .first().snapshot_id)
    pinned = (spark.read.option("snapshot-id", snap)
              .table("local.db.documents_snap"))
    write_documents(df.limit(1), "table:local.db.documents_snap",
                    mode="append")
    assert pinned.count() == len(docs)

"""Table IO: Iceberg when the runtime is present, parquet otherwise.

The north rule targets Iceberg tables of documents; this sandbox ships
no Iceberg runtime jar, so the layer detects availability and falls
back to parquet with an identical DataFrame surface (the table layout,
schema and every downstream operator are format-agnostic).

Production configuration (documented here, applied automatically when
the runtime jar is on the classpath)::

    spark.sql.catalog.lake                 org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type            rest | hive | hadoop
    spark.sql.extensions  org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions

Source strings accepted by :func:`read_documents` /
:func:`write_documents`:

* ``table:lake.db.documents`` — catalog table (Iceberg when available);
* anything else — a parquet path.

At 100 TB the Iceberg path additionally buys: snapshot isolation for
the resume anti-join (read the same snapshot across attempts), hidden
partitioning on ``bucket(doc_id)``, and metadata-only planning for the
checkpoint table's pushdown filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_PREFIX = "table:"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """Read the documents table from a catalog table or a parquet path."""
    if source.startswith(TABLE_PREFIX):
        name = source[len(TABLE_PREFIX):]
        if not iceberg_available(spark) and "." in name:
            raise RuntimeError(
                f"catalog table {name!r} requested but no Iceberg runtime "
                "is on the classpath; add the iceberg-spark-runtime jar "
                "and the spark.sql.catalog.* config (see dragnet_spark/io.py)"
                " or pass a parquet path")
        return spark.read.table(name)
    return spark.read.parquet(source)


def write_documents(df: DataFrame, sink: str, mode: str = "append") -> None:
    """Write span rows to a catalog table (Iceberg v2 append) or
    parquet path."""
    if sink.startswith(TABLE_PREFIX):
        name = sink[len(TABLE_PREFIX):]
        if not iceberg_available(df.sparkSession) and "." in name:
            raise RuntimeError(
                f"catalog table {name!r} requested but no Iceberg runtime "
                "is on the classpath; add the iceberg-spark-runtime jar "
                "and the spark.sql.catalog.* config (see dragnet_spark/io.py)"
                " or pass a parquet path")
        if mode == "overwrite":
            df.writeTo(name).createOrReplace()
        else:
            df.writeTo(name).append()
        return
    df.write.mode(mode).parquet(sink)

#!/usr/bin/env python
"""Bit-exact replica of the driver's value-hash comparison for selected
queries: runs the Spark query and the DuckDB oracle, canonically sorts
both, and compares float cells by their IEEE-754 bit pattern (so
``-0.0 != +0.0``), which is what the driver's value-hash sees.

Usage: python scripts/bitcheck.py [sf_dir] [query ...]
Defaults: sf0.01, the two dedispersion-fold queries the -0.0 artifact
affected (dedisperse_sk_full, dedisperse_clipped).
"""

from __future__ import annotations

import math
import struct
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def bits(x):
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return struct.pack("<d", x).hex()
    return repr(x)


def main(sf_dir: str = "/root/testdata/sf0.01", *names: str) -> int:
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(names) or ["dedisperse_sk_full", "dedisperse_clipped"]
    spark = get_spark(app_name="bitcheck", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rc = 0
    for name in names:
        got = canon(queries[name](spark, sf_dir).toPandas())
        want = canon(con.sql(oracles[name]).df())
        assert len(got) == len(want), (name, len(got), len(want))
        nbad = 0
        first = None
        for col in got.columns:
            for i, (x, y) in enumerate(zip(got[col], want[col])):
                if bits(x) != bits(y):
                    nbad += 1
                    if first is None:
                        first = (col, i, x, y, bits(x), bits(y))
        if nbad:
            rc = 1
            print(f"FAIL {name}: {nbad} bit-mismatched cells; "
                  f"first {first}")
        else:
            print(f"PASS {name}: {len(got)} rows bit-identical")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

"""Local stand-in for the driver's correctness gate.

Runs every ``QUERIES`` entry on Spark and its ``ORACLE_SQL`` twin on
DuckDB over the same parquet tables, then compares row counts, sorted
column names, and the order-insensitive multiset of row values.

Usage: python scripts/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def run(sf_dir: str, only: list[str] | None = None) -> bool:
    from pyspark.sql import SparkSession

    from quicker_spark.driver_queries import ORACLE_SQL, QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            pass

    ok = True
    names = only or list(QUERIES)
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            ok = False
            continue
        if name not in ORACLE_SQL:
            print(f"pass {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(ORACLE_SQL[name])
            o_cols = res.columns
            o_rows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            ok = False
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns {sorted(s_cols)} != {sorted(o_cols)}")
            ok = False
            continue
        a = _norm_rows(s_cols, s_rows)
        b = _norm_rows(o_cols, o_rows)
        if len(a) != len(b):
            print(f"FAIL {name}: row count {len(a)} != {len(b)}")
            ok = False
            continue
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            ok = False
            continue
        print(f"pass {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
    return ok


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    sys.exit(0 if run(sf_dir, only) else 1)

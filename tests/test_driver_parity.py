"""Driver-gate parity at sf0.001: every QUERIES entry vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row count + sorted column names +
order-insensitive multiset of values) so a regression is caught by
`pytest -x -q` before the driver ever sees it. The driver runs the same
comparison at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from quicker_spark.driver_queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLE_SQL:
        assert isinstance(s_rows, list)  # rows-only contract
        return
    res = oracle.sql(ORACLE_SQL[name])
    o_cols = res.columns
    o_rows = res.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert _norm(s_cols, s_rows) == _norm(o_cols, o_rows)

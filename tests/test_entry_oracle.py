"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables; compare row count + order-insensitive values.

Uses sf0.001 for speed (driver runs sf0.01; both are 500-doc tables
for documents/embeddings).
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = __import__("os").environ.get("ENTRY_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if not isinstance(v, bool) else v
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # driver's weaker rows-only check for non-SQL-expressible ops:
        # the query must still RUN, return rows with a stable schema,
        # and be deterministic across invocations
        a = qfn(spark, SF_DIR)
        rows_a = _canon([tuple(r) for r in a.collect()], a.columns)
        b = qfn(spark, SF_DIR)
        rows_b = _canon([tuple(r) for r in b.collect()], b.columns)
        assert a.columns == b.columns
        assert rows_a == rows_b, f"{name}: nondeterministic"
        assert len(rows_a) > 0, f"{name}: empty result"
        return

    sdf = qfn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names"
    assert len(srows) == len(drows), f"{name}: row count"
    a = _canon([tuple(r) for r in srows], scols)
    b = _canon(drows, dcols)
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{a[mismatches[0]]} vs {b[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"query_id", "doc_id", "score", "rank"}

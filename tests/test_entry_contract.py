"""Replicates the driver's correctness gate: every queries() entry vs its
oracle_sql() via DuckDB on the same parquet tables (sf0.01) — row count,
column names, and exact value equality after column-name sort + row sort.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from search_engine_spark.entry_queries import REGISTRY

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9) + 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


ORACLE_NAMES = [n for n, (_, sql) in REGISTRY.items() if sql is not None]


def test_every_query_has_an_oracle():
    # the hard-signal invariant: no rows-only (unverifiable) registry entries
    assert [n for n, (_, sql) in REGISTRY.items() if sql is None] == []


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ores = ddb.sql(sql)
    orows = [tuple(r) for r in ores.fetchall()]
    ocols = list(ores.columns)
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    a, b = _normalize(srows, scols), _normalize(orows, ocols)
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, f"{name}: first mismatch {a[mismatches[0]]} vs {b[mismatches[0]]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "doc_id" in df.columns and "score_r" in df.columns

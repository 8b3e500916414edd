"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle_sql() must match DuckDB row-for-row (schema-name,
row-count, exact values — doubles bit-exact) at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _pairs():
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q), f"oracle keys not in queries: {set(o) - set(q)}"
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR).toPandas()
    with _duck() as con:
        odf = con.execute(sql).df()
    a, b = _normalize(sdf), _normalize(odf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r} (diff {x - y!r})"
            else:
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return sane rows."""
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    for name in sorted(set(q) - set(o)):
        df = q[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert "category" in df.columns

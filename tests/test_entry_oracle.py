"""Pre-verify the driver's correctness gate: run every queries() entry and
its oracle_sql() side-by-side at sf0.01, compare row count, column names
and exact values (the driver's value-hash is order-insensitive and sorts
columns by name — mimic that)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            continue
        if np.issubdtype(df[col].dtype, np.floating):
            df[col] = df[col].astype(np.float64)
        elif np.issubdtype(df[col].dtype, np.integer):
            df[col] = df[col].astype(np.int64)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort") \
               .reset_index(drop=True)
    return df


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
ALL_KEYS = sorted(entrymod.queries().keys())


def test_every_oracle_key_has_query():
    assert set(ORACLE_KEYS) <= set(ALL_KEYS)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, con, ray_session):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    mine = _canon(_to_pandas(q(SF)))
    ref = _canon(con.execute(sql).df())
    assert list(mine.columns) == list(ref.columns), (
        f"{name}: column mismatch {list(mine.columns)} vs {list(ref.columns)}")
    assert len(mine) == len(ref), f"{name}: {len(mine)} rows vs {len(ref)}"
    for col in ref.columns:
        a, b = mine[col], ref[col]
        if np.issubdtype(b.dtype, np.floating) if b.dtype != object else False:
            ok = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9,
                             equal_nan=True)
        else:
            ok = (a.astype(str).values == b.astype(str).values).all()
        assert ok, f"{name}: column {col} differs\n{a.head()}\n{b.head()}"


NON_SQL = sorted(set(ALL_KEYS) - set(ORACLE_KEYS))


@pytest.mark.parametrize("name", NON_SQL)
def test_rows_only_queries_run_and_are_deterministic(name, ray_session):
    q = entrymod.queries()[name]
    a = _canon(_to_pandas(q(SF)))
    b = _canon(_to_pandas(q(SF)))
    assert len(a) >= 0
    pd.testing.assert_frame_equal(a, b)


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "message" in df.columns

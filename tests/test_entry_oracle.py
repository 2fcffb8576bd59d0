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


def _kind(dtype) -> str:
    """Collapse a dtype to the kind the driver's value-hash distinguishes.

    The driver hashes raw column values after sorting columns by name; a
    DuckDB ``sum(BIGINT)`` returns HUGEINT (-> float64 in pandas) and
    hash-mismatches an engine int64 column even when every cell is equal
    (the exact failure mode of the three r4-red queries). So the local
    gate must treat int-vs-float as a hard failure, not coerce it away.
    """
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


def _col_kind(col: pd.Series) -> str:
    """Column kind including a value peek: an Arrow date32 column lands in
    pandas as object-of-datetime.date, which the driver hashes identically
    to the oracle's datetime64 (anomaly_weekly_events was driver-green in
    r4 with exactly this shape) — classify it as datetime, not object."""
    k = _kind(col.dtype)
    if k == "object" and len(col):
        import datetime as _dt
        nn = col.dropna()
        if len(nn) and isinstance(nn.iloc[0], (_dt.date, _dt.datetime)):
            return "datetime"
    return k


def _assert_kinds_match(name: str, mine: pd.DataFrame, ref: pd.DataFrame):
    mk = {c: _col_kind(mine[c]) for c in sorted(mine.columns)}
    rk = {c: _col_kind(ref[c]) for c in sorted(ref.columns)}
    bad = {c: (mk.get(c), rk.get(c))
           for c in set(mk) | set(rk) if mk.get(c) != rk.get(c)}
    assert not bad, (
        f"{name}: column kind mismatch (engine vs oracle) {bad} — "
        "the driver's value-hash WILL differ; cast the oracle (or engine) "
        "so both sides agree (e.g. CAST(sum(...) AS BIGINT))")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            continue
        if np.issubdtype(df[col].dtype, np.floating):
            df[col] = df[col].astype(np.float64)
        elif pd.api.types.is_unsigned_integer_dtype(df[col].dtype):
            df[col] = df[col].astype("UInt64")   # hash cols exceed int64
        elif pd.api.types.is_integer_dtype(df[col].dtype):
            df[col] = df[col].astype("Int64")
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
    mine_raw = _to_pandas(q(SF))
    ref_raw = con.execute(sql).df()
    assert sorted(mine_raw.columns) == sorted(ref_raw.columns), (
        f"{name}: column mismatch {sorted(mine_raw.columns)} "
        f"vs {sorted(ref_raw.columns)}")
    # Type-strict BEFORE any coercion: kind mismatches hash-differ at the
    # driver even when values are cell-equal.
    _assert_kinds_match(name, mine_raw, ref_raw)
    mine = _canon(mine_raw)
    ref = _canon(ref_raw)
    assert len(mine) == len(ref), f"{name}: {len(mine)} rows vs {len(ref)}"
    for col in ref.columns:
        a, b = mine[col], ref[col]
        k = _kind(b.dtype)
        if k == "float":
            ok = np.allclose(a.astype(float), b.astype(float), rtol=0,
                             atol=1e-9, equal_nan=True)
        elif k == "int":
            na_a, na_b = a.isna().values, b.isna().values
            ok = (na_a == na_b).all() and (
                a[~na_a].to_numpy() == b[~na_b].to_numpy()).all()
        else:
            ok = (a.astype(str).values == b.astype(str).values).all()
        assert ok, f"{name}: column {col} differs\n{a.head()}\n{b.head()}"


def test_gate_catches_uncast_hugeint_sum(con):
    """Regression: a sum(BIGINT) oracle without a ::BIGINT cast returns
    HUGEINT -> float64; the gate must flag it against an int64 engine
    column (this class passed the old coercing gate and failed at the
    driver in r4: cumsum/rolling/order_stats)."""
    ref = con.execute(
        "SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s "
        "FROM orders").df()
    mine = pd.DataFrame({"s": np.asarray(ref["s"], dtype=np.int64)})
    assert _kind(ref["s"].dtype) == "float"      # duckdb hugeint -> float64
    assert _kind(mine["s"].dtype) == "int"
    with pytest.raises(AssertionError, match="kind mismatch"):
        _assert_kinds_match("planted", mine, ref)
    # and the cast fixes it
    ref2 = con.execute(
        "SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
        "AS BIGINT) AS s FROM orders").df()
    _assert_kinds_match("planted_cast", mine, ref2)


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

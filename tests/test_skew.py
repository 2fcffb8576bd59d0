"""Salted groupby + sessionization."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

import ray.data as rd

from rho_contracts_ray.stages import salted_groupby_count, sessionize

SF = "/root/testdata/sf0.01"


def test_salted_groupby_matches_plain_count(ray_session):
    # extreme skew: one key holds 90% of rows
    n = 50_000
    keys = ["hot"] * int(n * 0.9) + [f"k{i % 50}" for i in range(int(n * 0.1))]
    ds = rd.from_arrow(pa.table({"k": keys}))
    out = salted_groupby_count(ds, ["k"], n_salt=8).to_pandas()
    got = dict(zip(out["k"], out["cnt"]))
    assert got["hot"] == int(n * 0.9)
    assert sum(got.values()) == n
    assert len(got) == 51


def test_sessionize_vs_duckdb(ray_session):
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    out = sessionize(ds, key="user_id", ts="ts", gap_seconds=1800,
                     order_tiebreak=["event_id"]) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    ref = con.execute(
        f"SELECT event_id, SUM(CASE WHEN prev_ts IS NULL OR "
        f"epoch(ts - prev_ts) > 1800 THEN 1 ELSE 0 END) OVER "
        f"(PARTITION BY user_id ORDER BY ts, event_id) AS session_id "
        f"FROM (SELECT event_id, user_id, ts, LAG(ts) OVER "
        f"(PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
        f"FROM read_parquet('{SF}/events.parquet')) ORDER BY event_id"
    ).df()
    assert (out["session_id"].values == ref["session_id"].values).all()
    assert out["session_id"].max() > 1  # sessions actually split

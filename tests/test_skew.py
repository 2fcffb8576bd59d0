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


def test_salted_groupby_precombines_before_shuffle(ray_session):
    """The pre-combine stage bounds shuffle volume at O(batches x
    distinct (key, salt)) — 50k single-hot-key rows in 8 blocks enter
    the native groupby as at most 8 x n_salt partial rows (VERDICT r3
    #7: the row-level form shipped all 50k)."""
    from rho_contracts_ray.stages.skew import _salted_partial

    n, n_salt = 50_000, 8
    ds = rd.from_arrow(pa.table({"k": ["hot"] * n})).repartition(8)
    pre = ds.map_batches(_salted_partial(["k"], n_salt),
                         batch_format="pyarrow")
    shuffled_rows = pre.count()
    assert shuffled_rows <= 8 * n_salt, shuffled_rows


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

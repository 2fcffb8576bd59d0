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


def test_session_intervals_match_sessionize(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.skew import session_intervals

    TS = pa.timestamp("us")
    rng = np.random.default_rng(42)
    n = 400
    t = pa.table({
        "user_id": pa.array(rng.integers(1, 12, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 86400 * 3, n) * 1_000_000, TS)})
    out = pa.concat_tables(
        [b for b in session_intervals(rd.from_arrow(t), "user_id", "ts",
                                      gap_seconds=1800)
         .iter_batches(batch_size=None, batch_format="pyarrow")
         if b.num_rows])
    # oracle: single-core replay of the gap rule
    import pandas as pd
    df = t.to_pandas().sort_values(["user_id", "ts"])
    expect = []
    for uid, g in df.groupby("user_id"):
        us = g["ts"].astype("int64").to_numpy()
        new = np.ones(us.size, bool)
        new[1:] = np.diff(us) / 1e6 > 1800
        sid = np.cumsum(new)
        for s in np.unique(sid):
            seg = us[sid == s]
            expect.append((uid, int(s), int(seg.min()), int(seg.max())))
    got = sorted(zip(out["user_id"].to_pylist(),
                     out["session_id"].to_pylist(),
                     out["s_us"].to_pylist(), out["e_us"].to_pylist()))
    assert got == sorted(expect)


def test_max_concurrent_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.skew import max_concurrent_intervals

    DAY = 86_400_000_000
    iv = pa.table({
        # three overlapping around 2.5*DAY (peak 3, first reached at
        # 2*DAY + 30), one touching endpoint (closed intervals DO
        # overlap at the exact instant), one isolated
        "s_us": pa.array([2 * DAY + 10, 2 * DAY + 20, 2 * DAY + 30,
                          DAY - 5, 5 * DAY], pa.int64()),
        "e_us": pa.array([3 * DAY + 50, 2 * DAY + 35, 2 * DAY + 40,
                          DAY - 5, 5 * DAY + 1], pa.int64())})
    out = max_concurrent_intervals(rd.from_arrow(iv))
    assert out["n_intervals"].to_pylist() == [5]
    assert out["max_concurrent"].to_pylist() == [3]
    assert out["at_us"].to_pylist() == [2 * DAY + 30]


def test_max_concurrent_touching_endpoints_overlap(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.skew import max_concurrent_intervals

    iv = pa.table({"s_us": pa.array([0, 100], pa.int64()),
                   "e_us": pa.array([100, 200], pa.int64())})
    out = max_concurrent_intervals(rd.from_arrow(iv))
    # +1 sorts before -1 at ts=100 -> both live at that instant
    assert out["max_concurrent"].to_pylist() == [2]
    assert out["at_us"].to_pylist() == [100]


def test_sessionize_null_timestamps_dropped(ray_session):
    """A null ts must drop (NaT -> int64 MIN overflowed the gap math
    into phantom sessions) in sessionize AND session_intervals."""
    from rho_contracts_ray.stages.skew import (session_intervals,
                                               sessionize)

    t = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([1_000_000, None, 2_000_000], pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(t), "user_id", "ts",
                     gap_seconds=1800).to_pandas()
    assert len(out) == 2 and set(out["session_id"]) == {1}
    iv = session_intervals(rd.from_arrow(t), "user_id", "ts").to_pandas()
    assert len(iv) == 1 and iv["s_us"].iloc[0] == 1_000_000

"""Exact heavy hitters (Misra-Gries two-pass) and key-level snapshot diff
vs exact pandas/duckdb oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from rho_contracts_ray.constraints import heavy_hitters, snapshot_diff
from rho_contracts_ray.constraints.heavy_hitters import (
    _mg_compress, _merge_summaries,
)


def _zipf_table(n=120_000, n_vals=20_000, seed=7) -> pa.Table:
    """Heavy skew: many distinct values, a few very hot — distinct count
    far exceeds the sketch size so compression actually runs."""
    rng = np.random.default_rng(seed)
    v = rng.zipf(1.3, n).astype(np.int64) % n_vals
    return pa.table({"v": v})


def _exact_hitters(t: pa.Table, col: str, phi: float) -> dict:
    vals = t[col].to_numpy(zero_copy_only=False)
    u, c = np.unique(vals, return_counts=True)
    thresh = phi * len(vals)
    return {int(a): int(b) for a, b in zip(u, c) if b >= thresh}


def test_mg_compress_bound():
    t = pa.table({"value": pa.array(range(100), pa.int64()),
                  "cnt": pa.array([100 - i for i in range(100)], pa.int64())})
    out, d = _mg_compress(t, 10)
    assert out.num_rows <= 10
    assert d > 0
    # survivors are the largest, each decremented by exactly d
    cnts = sorted(out["cnt"].to_pylist(), reverse=True)
    assert cnts[0] == 100 - d


def test_heavy_hitters_zipf_exact(ray_session):
    import ray.data as rd

    t = _zipf_table()
    phi = 0.002
    expect = _exact_hitters(t, "v", phi)
    ds = rd.from_arrow(t).repartition(8)
    got = heavy_hitters(ds, "v", phi)
    got_d = {int(v): int(c) for v, c in
             zip(got["value"].to_pylist(), got["cnt"].to_pylist())}
    assert got_d == expect
    assert len(got_d) > 0
    # completeness matters most: nothing above threshold may be missing
    assert set(got_d) == set(expect)


def test_heavy_hitters_many_distinct_compresses(ray_session):
    import ray.data as rd

    # distinct >> k forces MG compression in every partial and merge
    t = _zipf_table(n=60_000, n_vals=40_000, seed=3)
    phi = 0.01   # k = 400 << 40k distinct
    expect = _exact_hitters(t, "v", phi)
    ds = rd.from_arrow(t).repartition(6)
    got = heavy_hitters(ds, "v", phi)
    got_d = {int(v): int(c) for v, c in
             zip(got["value"].to_pylist(), got["cnt"].to_pylist())}
    assert got_d == expect


def test_heavy_hitters_ignores_nulls(ray_session):
    import ray.data as rd

    t = pa.table({"v": pa.array([1, 1, 1, None, None, 2], pa.int64())})
    got = heavy_hitters(rd.from_arrow(t), "v", phi=0.5)
    # N=4 non-null; threshold 2: only value 1 (cnt 3) qualifies
    assert got["value"].to_pylist() == [1]
    assert got["cnt"].to_pylist() == [3]


def test_heavy_hitters_string_column(ray_session):
    import ray.data as rd

    vals = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(40)]
    t = pa.table({"v": pa.array(vals)})
    got = heavy_hitters(rd.from_arrow(t), "v", phi=0.2)
    assert got["value"].to_pylist() == ["a", "b"]
    assert got["cnt"].to_pylist() == [50, 30]


def test_heavy_hitters_phi_validation(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"v": [1]}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, "v", phi=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(ds, "v", phi=1.5)


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------


def _collect(ds) -> pa.Table:
    parts = [b for b in ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow")]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else pa.table({})


def test_snapshot_diff_basic(ray_session):
    import ray.data as rd

    old = pa.table({"k": [1, 2, 3, 4], "a": ["x", "y", "z", "w"],
                    "b": [1.0, 2.0, 3.0, 4.0]})
    new = pa.table({"k": [2, 3, 4, 5], "a": ["y", "ZZ", "w", "v"],
                    "b": [2.0, 3.0, 9.0, 5.0]})
    out = _collect(snapshot_diff(rd.from_arrow(old), rd.from_arrow(new),
                                 ["k"], ["a", "b"]))
    d = dict(zip(out["k"].to_pylist(), out["status"].to_pylist()))
    assert d == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_snapshot_diff_null_aware(ray_session):
    import ray.data as rd

    old = pa.table({"k": [1, 2, 3], "a": [None, "y", None]})
    new = pa.table({"k": [1, 2, 3], "a": [None, None, "z"]})
    out = _collect(snapshot_diff(rd.from_arrow(old), rd.from_arrow(new),
                                 ["k"], ["a"]))
    d = dict(zip(out["k"].to_pylist(), out["status"].to_pylist()))
    # both-null is equal; null vs value is a change in either direction
    assert d == {2: "changed", 3: "changed"}


def test_snapshot_diff_duplicate_keys_raise(ray_session):
    import ray.data as rd

    old = pa.table({"k": [1, 1], "a": ["x", "y"]})
    new = pa.table({"k": [1], "a": ["x"]})
    with pytest.raises(Exception, match="duplicate keys"):
        _collect(snapshot_diff(rd.from_arrow(old), rd.from_arrow(new),
                               ["k"], ["a"]))


def test_snapshot_diff_multi_key_and_scale(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 30_000
    k1 = np.arange(n, dtype=np.int64)
    k2 = (k1 * 7919) % 1000
    val = rng.integers(0, 100, n)
    old = pa.table({"k1": k1, "k2": k2, "val": val})
    # new: drop 1% of keys, change 2%, add fresh 1%
    drop = (k1 % 100) == 0
    change = (k1 % 100) == 1
    new_val = np.where(change, val + 1000, val)
    new = pa.table({"k1": k1[~drop], "k2": k2[~drop],
                    "val": new_val[~drop]})
    added = pa.table({"k1": np.arange(n, n + n // 100, dtype=np.int64),
                      "k2": np.zeros(n // 100, dtype=np.int64),
                      "val": np.zeros(n // 100, val.dtype)})
    new = pa.concat_tables([new, added.cast(new.schema)])
    out = _collect(snapshot_diff(
        rd.from_arrow(old).repartition(8), rd.from_arrow(new).repartition(8),
        ["k1", "k2"], ["val"]))
    d = dict(zip(out["k1"].to_pylist(), out["status"].to_pylist()))
    assert sum(1 for s in d.values() if s == "removed") == drop.sum()
    assert sum(1 for s in d.values() if s == "changed") == change.sum()
    assert sum(1 for s in d.values() if s == "added") == n // 100


def test_snapshot_diff_identical_is_empty(ray_session):
    import ray.data as rd

    t = pa.table({"k": [1, 2], "a": ["x", None]})
    out = _collect(snapshot_diff(rd.from_arrow(t), rd.from_arrow(t),
                                 ["k"], ["a"]))
    assert out.num_rows == 0


def test_exact_ks_matches_bruteforce(ray_session):
    """exact_ks == the naive two-sample KS computed directly in numpy,
    including nulls/NaNs excluded, and detects a planted shift."""
    import ray.data as rd

    from rho_contracts_ray.constraints.drift import exact_ks

    rng = np.random.RandomState(11)
    a = np.round(rng.normal(0, 1, 4000), 2)
    b = np.round(rng.normal(0.4, 1, 3000), 2)   # shifted

    def with_junk(x):
        vals = list(x) + [None, float("nan"), None]
        return pa.table({"value": pa.array(vals, pa.float64())})

    da = rd.from_arrow(with_junk(a)).repartition(5)
    db = rd.from_arrow(with_junk(b)).repartition(3)
    got = exact_ks(da, db, "value")

    grid = np.unique(np.concatenate((a, b)))
    fa = np.searchsorted(np.sort(a), grid, side="right") / a.size
    fb = np.searchsorted(np.sort(b), grid, side="right") / b.size
    want = float(np.abs(fa - fb).max())
    assert got["n_a"] == a.size and got["n_b"] == b.size
    assert abs(got["ks"] - want) < 1e-12
    assert got["ks"] > 0.1          # the shift is detected
    # identical distributions -> ks == 0 exactly
    same = exact_ks(rd.from_arrow(with_junk(a)),
                    rd.from_arrow(with_junk(a)), "value")
    assert same["ks"] == 0.0

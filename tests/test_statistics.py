"""Statistical analytics stages: grouped bivariate stats, z-score,
retention, funnel, unigram-LM scoring, normalized dedup, PCA — edge
semantics the sf-level DuckDB oracle (test_entry_oracle) can't plant."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rho_contracts_ray.stages.ann import pca_fit, pca_project
from rho_contracts_ray.stages.statistics import (
    funnel_steps, group_bivariate_stats, group_zscore, retention_counts,
)
from rho_contracts_ray.stages.text import normalized_dedup, unigram_logprob


def _collect(ds) -> pa.Table:
    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in ds.iter_batches(batch_size=None,
                                      batch_format="pyarrow")]
    parts = [t for t in parts if t.num_rows]
    return pa.concat_tables(parts) if parts else None


TS = pa.timestamp("us")


def _ts(day: int, hour: int = 0) -> int:
    # 2024-01-01 (a Monday) + offsets, in epoch micros
    return (1_704_067_200 + day * 86_400 + hour * 3_600) * 1_000_000


def test_bivariate_small_groups(ray_session):
    t = pa.table({
        "g": ["a", "a", "a", "b", "c", "c"],
        "x": [1.0, 2.0, 3.0, 5.0, 1.0, None],
        "y": [2.0, 4.0, 6.5, 7.0, None, 3.0],
    })
    out = _collect(group_bivariate_stats(
        rd.from_arrow(t), ["g"], "x", "y")).to_pandas() \
        .set_index("g").sort_index()
    # group a: near-perfect positive relation
    a = out.loc["a"]
    assert a["n"] == 3
    assert abs(a["corr_xy"] - np.corrcoef([1, 2, 3], [2, 4, 6.5])[0, 1]) \
        < 1e-12
    assert abs(a["slope"] - 2.25) < 1e-12
    # group b (n=1) -> null stats; group c has no complete pair at all
    # and is omitted (pairwise deletion happens before grouping)
    assert out.loc["b", "n"] == 1 and np.isnan(out.loc["b", "corr_xy"])
    assert "c" not in out.index


def test_zscore_zero_variance_and_nulls(ray_session):
    t = pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "g": ["k", "k", "k", "z", "z", "k"],
        "v": [1.0, 3.0, 5.0, 7.0, 7.0, None],
    })
    out = _collect(group_zscore(rd.from_arrow(t), "g", "v", ["id"])) \
        .to_pandas().set_index("id").sort_index()
    assert abs(out.loc[1, "z"] + 1.0) < 1e-9      # (1-3)/2
    assert abs(out.loc[3, "z"] - 1.0) < 1e-9
    assert np.isnan(out.loc[4, "z"])               # zero-variance group
    assert np.isnan(out.loc[6, "z"])               # null value stays null


def test_retention_two_cohorts(ray_session):
    rows = []
    # users 1,2 start week 0; user 1 returns weeks 1 and 3
    rows += [(1, _ts(0)), (1, _ts(1)), (1, _ts(7)), (1, _ts(21))]
    rows += [(2, _ts(2))]
    # user 3 starts week 1, returns week 2
    rows += [(3, _ts(8)), (3, _ts(14))]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], TS)})
    out = _collect(retention_counts(rd.from_arrow(t), "user_id", "ts")) \
        .to_pandas()
    cells = {(r.cohort_week.value // 1000, int(r.week_offset)): int(r.users)
             for r in out.itertuples()}
    w0, w1 = _ts(0), _ts(7)
    assert cells[(w0, 0)] == 2
    assert cells[(w0, 1)] == 1 and cells[(w0, 3)] == 1
    assert (w0, 2) not in cells
    assert cells[(w1, 0)] == 1 and cells[(w1, 1)] == 1


def test_funnel_order_matters(ray_session):
    rows = [
        # user 1: full ordered funnel
        (1, _ts(0, 0), "view"), (1, _ts(0, 1), "click"),
        (1, _ts(0, 2), "purchase"),
        # user 2: purchase BEFORE its click -> stops after click
        (2, _ts(0, 0), "view"), (2, _ts(0, 2), "click"),
        (2, _ts(0, 1), "purchase"),
        # user 3: clicks but never saw a view -> not even step 2
        (3, _ts(0, 0), "click"), (3, _ts(0, 1), "purchase"),
        # user 4: view only
        (4, _ts(0, 0), "view"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], TS),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = funnel_steps(rd.from_arrow(t), "user_id", "ts", "event_type",
                       ["view", "click", "purchase"]).to_pandas()
    assert int(out["step_1_view"][0]) == 3
    assert int(out["step_2_click"][0]) == 2
    assert int(out["step_3_purchase"][0]) == 1
    assert abs(out["conversion"][0] - round(1 / 3, 6)) < 1e-12


def test_funnel_same_timestamp_counts(ray_session):
    # ts >= gate is inclusive: click at the exact view instant qualifies
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([_ts(0), _ts(0)], TS),
        "event_type": pa.array(["view", "click"], pa.string()),
    })
    out = funnel_steps(rd.from_arrow(t), "user_id", "ts", "event_type",
                       ["view", "click"]).to_pandas()
    assert int(out["step_2_click"][0]) == 1


def test_unigram_logprob_hand_case(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a a b", "b  c"], pa.string())})
    out = _collect(unigram_logprob(rd.from_arrow(t))).to_pandas() \
        .set_index("doc_id").sort_index()
    # corpus: a:2 b:2 c:1, N=5 (the double space contributes no token)
    lp = {"a": math.log(2 / 5), "b": math.log(2 / 5), "c": math.log(1 / 5)}
    assert int(out.loc[1, "n_tokens"]) == 3
    assert abs(out.loc[1, "avg_logprob"]
               - round((2 * lp["a"] + lp["b"]) / 3, 6)) < 1e-9
    assert abs(out.loc[2, "avg_logprob"]
               - round((lp["b"] + lp["c"]) / 2, 6)) < 1e-9


def test_normalized_dedup_planted(ray_session):
    t = pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "text": pa.array(["Hello  World", "hello world", " hello\tworld\n",
                          "hello worlds", None], pa.string()),
    })
    out = _collect(normalized_dedup(rd.from_arrow(t))).to_pandas() \
        .set_index("doc_id").sort_index()
    assert int(out.loc[10, "n"]) == 3       # 10, 11, 12 normalize equal
    assert int(out.loc[13, "n"]) == 1
    assert int(out.loc[14, "n"]) == 1       # null -> "" group of its own
    assert 11 not in out.index and 12 not in out.index


def test_pca_matches_numpy_exact(ray_session):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 6))
    # stretch two directions so the top-2 axes are unambiguous
    base[:, 0] *= 9.0
    base[:, 1] *= 4.0
    t = pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    x = np.array(t["embedding"].to_pylist(), np.float64)  # f32-truncated
    ds = rd.from_arrow(t).repartition(5)
    comps, mean, ratio = pca_fit(ds, n_components=2)
    # exact reference on the same float32-rounded input
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:2]
    ref = v[:, order].T.copy()
    for i in range(2):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-7)
    assert ratio[0] > ratio[1] > 0
    out = _collect(pca_project(ds, comps, mean)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    proj = np.round((x - mu) @ ref.T, 6)
    assert np.allclose(out[["pc_1", "pc_2"]].to_numpy(), proj, atol=1e-5)


def test_pca_reproducible_same_partitioning(ray_session):
    t = pa.table({
        "vec_id": pa.array(np.arange(64), pa.int64()),
        "embedding": pa.array(
            [[float(i % 7), float(i % 3), float(i)] for i in range(64)],
            pa.list_(pa.float32())),
    })
    a = pca_fit(rd.from_arrow(t).repartition(4), 2)
    b = pca_fit(rd.from_arrow(t).repartition(4), 2)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_ohlc_bars_planted(ray_session):
    rows = [
        # user 1, day 0: values in ts order 5, 1, 9, 3
        (1, _ts(0, 1), 5.0), (1, _ts(0, 2), 1.0),
        (1, _ts(0, 3), 9.0), (1, _ts(0, 4), 3.0),
        # user 1, day 1: single event
        (1, _ts(1, 0), 7.0),
        # user 2, day 0: 2.0 then 4.0
        (2, _ts(0, 5), 2.0), (2, _ts(0, 6), 4.0),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], TS),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    from rho_contracts_ray.stages.statistics import ohlc_bars

    # repartition so partials from different blocks must combine
    out = _collect(ohlc_bars(rd.from_arrow(t).repartition(4),
                             "user_id", "ts", "value", unit="day")) \
        .to_pandas().set_index(["user_id", "bar"]).sort_index()
    d0 = pa.scalar(_ts(0), TS).as_py()
    d1 = pa.scalar(_ts(1), TS).as_py()
    r = out.loc[(1, d0)]
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) \
        == (5.0, 9.0, 1.0, 3.0, 4)
    assert abs(r["total"] - 18.0) < 1e-9
    r = out.loc[(1, d1)]
    assert (r["open"], r["close"], r["n"]) == (7.0, 7.0, 1)
    r = out.loc[(2, d0)]
    assert (r["open"], r["close"], r["low"], r["high"]) \
        == (2.0, 4.0, 2.0, 4.0)


def test_group_mad_nulls_and_nans(ray_session):
    t = pa.table({
        "g": ["a"] * 5 + ["b"] * 2 + ["c"],
        "v": [1.0, 3.0, 100.0, None, float("nan"), 7.0, 9.0, None],
    })
    from rho_contracts_ray.stages.statistics import group_mad

    out = _collect(group_mad(rd.from_arrow(t), "g", "v")).to_pandas() \
        .set_index("g").sort_index()
    # group a: valid values 1, 3, 100 -> med 3, |devs| {2, 0, 97} -> mad 2
    assert out.loc["a", "med"] == 3.0 and out.loc["a", "mad"] == 2.0
    assert int(out.loc["a", "n"]) == 3
    # group b: even count picks the LOWER disc element (ceil(.5*2)-1 = 0)
    assert out.loc["b", "med"] == 7.0 and out.loc["b", "mad"] == 0.0
    # group c: all null -> null med/mad, n = 0
    assert np.isnan(out.loc["c", "med"]) and int(out.loc["c", "n"]) == 0


def test_resample_ffill_gaps(ray_session):
    rows = [
        (1, _ts(0, 1), 10.0), (1, _ts(0, 9), 11.0),   # day 0: last = 11
        (1, _ts(3), 30.0),                             # gap days 1, 2
        (2, _ts(5), 50.0),                             # single-day user
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], TS),
        "v": pa.array([r[2] for r in rows], pa.float64()),
    })
    from rho_contracts_ray.stages.statistics import resample_ffill

    out = _collect(resample_ffill(rd.from_arrow(t).repartition(3),
                                  "user_id", "ts", "v", "filled")) \
        .to_pandas()
    got = {(int(r.user_id), r.day.value // 1000): r.filled
           for r in out.itertuples()}
    assert len(out) == 5                       # days 0..3 for u1, 1 for u2
    assert got[(1, _ts(0))] == 11.0            # later same-day ts wins
    assert got[(1, _ts(1))] == 11.0 and got[(1, _ts(2))] == 11.0
    assert got[(1, _ts(3))] == 30.0
    assert got[(2, _ts(5))] == 50.0


def test_new_ops_survive_oversized_bucket_split(ray_session, monkeypatch):
    """The 100-TB OOM guard applied to the statistics family: with
    RHO_BUCKET_SPLIT_ROWS pinned far below the routed row count, every
    raw-row exchange here processes its buckets as finer hash sub-ranges
    with results identical to the unsplit run (all ops are key-local, so
    hash-bit splitting preserves semantics)."""
    import ray.data as rd

    from rho_contracts_ray.stages.statistics import (
        group_mad, ohlc_bars, resample_ffill, retention_counts)

    SF = "/root/testdata/sf0.01"
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value", "event_type"])

    def collect(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def run_all():
        return [
            collect(group_mad(ev, "event_type", "value")),
            collect(ohlc_bars(ev, "user_id", "ts", "value", unit="day")),
            collect(resample_ffill(ev, "user_id", "ts", "value", "f")),
            collect(retention_counts(ev, "user_id", "ts")),
        ]

    base = run_all()
    monkeypatch.setenv("RHO_BUCKET_SPLIT_ROWS", "50")
    split = run_all()
    for b, s in zip(base, split):
        assert b.equals(s)


def test_quantile_cont_bit_equal_duckdb(ray_session):
    """group_quantiles_cont replicates DuckDB's quantile_cont arithmetic
    BIT-EXACTLY (same rn = q*(n-1) two-sided-weight formula in float64)
    over random group sizes 1..40, including single-element groups."""
    import duckdb

    rng = np.random.default_rng(11)
    keys, vals = [], []
    for g in range(25):
        n = int(rng.integers(1, 41))
        keys += [f"g{g}"] * n
        vals += list(np.round(rng.normal(50, 20, n), 2))
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})

    from rho_contracts_ray.stages import group_quantiles_cont
    got = _collect(group_quantiles_cont(
        rd.from_arrow(t).repartition(7), "k", "v",
        (0.1, 0.25, 0.5, 0.75, 0.9))).to_pandas().set_index("k").sort_index()

    con = duckdb.connect()
    con.register("t", t)
    ref = con.execute(
        "SELECT k, quantile_cont(v, 0.1) AS p10, "
        "quantile_cont(v, 0.25) AS p25, quantile_cont(v, 0.5) AS p50, "
        "quantile_cont(v, 0.75) AS p75, quantile_cont(v, 0.9) AS p90 "
        "FROM t GROUP BY k").df().set_index("k").sort_index()
    for col in ["p10", "p25", "p50", "p75", "p90"]:
        a = got[col].to_numpy()
        b = ref[col].to_numpy()
        assert (a == b).all(), (col, a[a != b][:3], b[a != b][:3])


def test_quantile_cont_null_nan_and_empty(ray_session):
    from rho_contracts_ray.stages import group_quantiles_cont

    t = pa.table({
        "k": ["a", "a", "a", "b", "b", "c"],
        "v": pa.array([1.0, None, 3.0, float("nan"), None, None],
                      pa.float64()),
    })
    got = _collect(group_quantiles_cont(rd.from_arrow(t), "k", "v",
                                        (0.5,))).to_pandas()
    # groups b and c have no finite values -> dropped (drop_empty)
    assert dict(zip(got["k"], got["p50"])) == {"a": 2.0}

    e = pa.table({"k": pa.array([], pa.string()),
                  "v": pa.array([], pa.float64())})
    assert group_quantiles_cont(rd.from_arrow(e), "k", "v").count() == 0


def test_unpivot_roundtrip_and_empty(ray_session):
    from rho_contracts_ray.stages import unpivot

    t = pa.table({"id": [1, 2], "a": [1.5, None], "b": [3.0, 4.0]})
    got = _collect(unpivot(rd.from_arrow(t), ["id"], ["a", "b"],
                           cast_to=pa.float64())).to_pandas() \
        .sort_values(["id", "name"]).reset_index(drop=True)
    assert list(got["name"]) == ["a", "b", "a", "b"]
    assert got["value"][1] == 3.0 and math.isnan(got["value"][2])
    assert len(got) == 4   # null measures KEPT (plain UNION ALL form)

    e = pa.table({"id": pa.array([], pa.int64()),
                  "a": pa.array([], pa.float64()),
                  "b": pa.array([], pa.float64())})
    assert unpivot(rd.from_arrow(e), ["id"], ["a", "b"]).count() == 0


def test_group_entropy_known_values(ray_session):
    from rho_contracts_ray.stages import group_entropy

    t = pa.table({
        "k": ["u"] * 4 + ["v"] * 3 + ["w"],
        "c": ["a", "b", "a", "b",      # u: 2/2 -> ln 2
              "x", "x", "x",           # v: single category -> 0
              None],                   # w: null category counts
    })
    got = _collect(group_entropy(rd.from_arrow(t).repartition(3),
                                 "k", "c")).to_pandas().set_index("k")
    assert abs(got.loc["u", "entropy"] - math.log(2)) < 1e-12
    assert got.loc["v", "entropy"] == 0.0
    assert got.loc["w", "entropy"] == 0.0 and got.loc["w", "n"] == 1
    assert int(got.loc["u", "n"]) == 4

    e = pa.table({"k": pa.array([], pa.string()),
                  "c": pa.array([], pa.string())})
    assert group_entropy(rd.from_arrow(e), "k", "c").count() == 0


def test_winsorize_planted(ray_session):
    from rho_contracts_ray.stages.statistics import group_winsorize

    # group 'a': 1..20 -> disc fences p05 = element ceil(.05*20)-1 = idx 0
    # (value 1), p95 = idx ceil(19)-1 = 18 (value 19); clipped sum =
    # sum(1..19) + 19 = 190 + 19 = 209.  Outlier 1000 in 'b' clips to the
    # group's own fence.  NaN/null excluded from n and sums.
    a_vals = [float(i) for i in range(1, 21)]
    t = pa.table({
        "g": ["a"] * 20 + ["b"] * 3 + ["c"] * 2,
        "v": pa.array(a_vals + [1.0, 2.0, 1000.0,
                                float("nan"), 5.0], pa.float64())})
    out = _collect(group_winsorize(rd.from_arrow(t).repartition(3),
                                   "g", "v")).sort_by("g")
    rows = {r["g"]: r for r in out.to_pylist()}
    assert rows["a"]["n"] == 20
    assert rows["a"]["lo_fence"] == 1.0 and rows["a"]["hi_fence"] == 19.0
    assert rows["a"]["win_sum"] == 209.0
    # 'b': fences from its own 3 values (p05 -> 1.0, p95 -> 1000.0: disc
    # picks ceil(.95*3)-1 = idx 2) — no clipping happens
    assert rows["b"]["win_sum"] == 1003.0
    # 'c': NaN dropped
    assert rows["c"]["n"] == 1 and rows["c"]["win_sum"] == 5.0


def test_higher_moments_match_numpy(ray_session):
    from rho_contracts_ray.stages.statistics import group_higher_moments

    rng = np.random.default_rng(3)
    g = rng.choice(["x", "y"], 500).tolist()
    v = rng.integers(1, 51, 500).astype(np.float64)
    t = pa.table({"g": g, "v": pa.array(v)})
    out = _collect(group_higher_moments(
        rd.from_arrow(t).repartition(5), "g", "v")).sort_by("g")
    for row in out.to_pylist():
        x = v[np.array(g) == row["g"]]
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        assert row["n"] == x.size
        assert math.isclose(row["mean"], m, rel_tol=1e-12)
        assert math.isclose(row["skew"], m3 / m2 ** 1.5, rel_tol=1e-9)
        assert math.isclose(row["kurt"], m4 / m2 ** 2 - 3.0, rel_tol=1e-9)


def test_higher_moments_constant_group_null(ray_session):
    from rho_contracts_ray.stages.statistics import group_higher_moments

    t = pa.table({"g": ["k"] * 4, "v": pa.array([7.0] * 4)})
    out = _collect(group_higher_moments(rd.from_arrow(t), "g", "v"))
    row = out.to_pylist()[0]
    assert row["mean"] == 7.0
    assert row["skew"] is None and row["kurt"] is None


def test_winsorize_hot_key_with_split_guard(ray_session, monkeypatch):
    """One ultra-hot key routed through a pinned-tiny bucket-split
    threshold: equal keys can't sub-split, so the guard must fall through
    to one direct body call — fences and sums identical to the unsplit
    run."""
    from rho_contracts_ray.stages.statistics import group_winsorize

    rng = np.random.default_rng(11)
    t = pa.table({"g": ["hot"] * 5000,
                  "v": pa.array(rng.uniform(0, 1000, 5000))})
    ds = rd.from_arrow(t).repartition(8)
    base = _collect(group_winsorize(ds, "g", "v")).to_pylist()
    monkeypatch.setenv("RHO_BUCKET_SPLIT_ROWS", "50")
    split = _collect(group_winsorize(ds, "g", "v")).to_pylist()
    assert base == split and base[0]["n"] == 5000


def test_winsorize_and_moments_property_random_tables(ray_session):
    """Property: winsorized aggregates and power-sum moments match DuckDB
    on random tables — nulls, NaN, massive ties, constant groups,
    single-row groups, random partitionings."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rho_contracts_ray.stages.statistics import (
        group_higher_moments, group_winsorize,
    )

    con = duckdb.connect()

    @settings(max_examples=10, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=300),
        nkeys=st.integers(min_value=1, max_value=6),
        vspread=st.sampled_from([2, 1000]),      # 2 => constant-ish groups
        bad_p=st.sampled_from([0.0, 0.3]),       # null/NaN mix
        parts=st.integers(min_value=1, max_value=5),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, nkeys, vspread, bad_p, parts, seed):
        rng = np.random.RandomState(seed)

        def val(i):
            r = rng.rand()
            if r < bad_p / 2:
                return None
            if r < bad_p:
                return float("nan")
            return float(rng.randint(0, vspread))

        t = pa.table({
            "g": pa.array(rng.randint(0, nkeys, n).astype(np.int64)),
            "v": pa.array([val(i) for i in range(n)], pa.float64()),
        })
        # register the ARROW table: a pandas round trip would conflate
        # null with NaN and silently change the SQL reference's filters
        con.register("t", t)
        ds = rd.from_arrow(t).repartition(parts)

        win = _collect(group_winsorize(ds, "g", "v"))
        ref = con.execute(
            "WITH f AS (SELECT g, quantile_disc(v, 0.05) AS lo, "
            "quantile_disc(v, 0.95) AS hi FROM t "
            "WHERE v IS NOT NULL AND NOT isnan(v) GROUP BY 1) "
            "SELECT t.g, count(*)::BIGINT AS n, f.lo, f.hi, "
            "sum(least(greatest(v, f.lo), f.hi)) AS ws, "
            "avg(least(greatest(v, f.lo), f.hi)) AS wm "
            "FROM t JOIN f USING (g) WHERE v IS NOT NULL AND NOT isnan(v) "
            "GROUP BY t.g, f.lo, f.hi ORDER BY t.g").df()
        if win is None:
            assert len(ref) == 0
        else:
            got = win.to_pandas().sort_values("g").reset_index(drop=True)
            assert got["g"].tolist() == ref["g"].tolist()
            assert got["n"].tolist() == ref["n"].tolist()
            assert got["lo_fence"].tolist() == ref["lo"].tolist()
            assert got["hi_fence"].tolist() == ref["hi"].tolist()
            # compare UNROUNDED values with tolerances: round-then-compare
            # mismatches when a true value sits on a half boundary (e.g.
            # an all-0/1 group whose mean is exactly 21/32 = 0.65625 —
            # Python half-even says 0.6562, DuckDB half-away says 0.6563)
            for gi, wi in zip(got["win_sum"], ref["ws"]):
                assert math.isclose(gi, wi, rel_tol=1e-12, abs_tol=1e-9)
            for gi, wi in zip(got["win_mean"], ref["wm"]):
                assert math.isclose(gi, wi, rel_tol=1e-9, abs_tol=1e-12)

        mom = _collect(group_higher_moments(ds, "g", "v"))
        ref = con.execute(
            "WITH s AS (SELECT g, count(*)::DOUBLE AS n, sum(v) AS s1, "
            "sum(v*v) AS s2, sum(v*v*v) AS s3, sum(v*v*v*v) AS s4 "
            "FROM t WHERE v IS NOT NULL GROUP BY 1), "
            "m AS (SELECT g, n, s1/n AS m1, s2/n - (s1/n)*(s1/n) AS m2, "
            "s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)^3 AS m3, "
            "s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n) "
            "- 3*(s1/n)^4 AS m4 FROM s) "
            "SELECT g, n::BIGINT AS n, m1 AS mean, "
            "CASE WHEN m2 > 0 THEN m3 / m2^1.5 END AS skew, "
            "CASE WHEN m2 > 0 THEN m4/(m2*m2) - 3.0 END AS kurt "
            "FROM m ORDER BY g").df()
        # NaN values pass both filters (engine is_valid, SQL IS NOT NULL)
        # and poison both engines' sums identically -> NaN == NaN-ish
        if mom is None:
            assert len(ref) == 0
            return
        got = mom.to_pandas().sort_values("g").reset_index(drop=True)
        assert got["g"].tolist() == ref["g"].tolist()
        assert got["n"].tolist() == ref["n"].tolist()
        for c_got, c_ref in (("mean", "mean"), ("skew", "skew"),
                             ("kurt", "kurt")):
            for gi, wi in zip(got[c_got], ref[c_ref]):
                gn = gi is None or pd.isna(gi)
                wn = wi is None or pd.isna(wi)
                assert gn == wn, (gi, wi)
                if not gn:
                    assert math.isclose(float(gi), float(wi),
                                        rel_tol=1e-6, abs_tol=1e-6)

    check()


def test_spearman_ties_and_edges(ray_session):
    from rho_contracts_ray.stages.statistics import spearman_rho

    t = pa.table({
        "g": ["a"] * 5 + ["b"] * 3 + ["c"] + ["d"] * 4,
        # a: perfectly monotone with ties in x; b: anti-monotone;
        # c: single row (null rho); d: zero variance in y (null rho)
        "x": [1.0, 2.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 9.0,
              1.0, 2.0, 3.0, 4.0],
        "y": [10.0, 20.0, 25.0, 30.0, 40.0, 3.0, 2.0, 1.0, 7.0,
              5.0, 5.0, 5.0, 5.0]})
    out = _collect(spearman_rho(rd.from_arrow(t), "g", "x", "y")) \
        .sort_by([("g", "ascending")])
    got = {g: (n, r) for g, n, r in zip(
        out["g"].to_pylist(), out["n_obs"].to_pylist(),
        out["rho"].to_pylist())}
    assert got["b"] == (3, -1.0)
    assert got["c"] == (1, None)
    assert got["d"] == (4, None)
    n, rho_a = got["a"]
    assert n == 5
    # scipy-free check: ranks x = 1, 2.5, 2.5, 4, 5; y = 1..5
    rx = np.array([1.0, 2.5, 2.5, 4.0, 5.0])
    ry = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    expect = np.corrcoef(rx, ry)[0, 1]
    assert rho_a == pytest.approx(expect, abs=1e-6)


def test_spearman_null_rows_dropped(ray_session):
    from rho_contracts_ray.stages.statistics import spearman_rho

    t = pa.table({
        "g": ["a"] * 4,
        "x": pa.array([1.0, None, 3.0, 4.0], pa.float64()),
        "y": pa.array([1.0, 2.0, None, 4.0], pa.float64())})
    out = _collect(spearman_rho(rd.from_arrow(t), "g", "x", "y"))
    assert out["n_obs"].to_pylist() == [2]
    assert out["rho"].to_pylist() == [1.0]


def test_autocorr_lag1_known_series(ray_session):
    from rho_contracts_ray.stages.statistics import autocorr_lag1

    # alternating series -> strong negative lag-1 correlation
    n = 20
    alt = [float(i % 2) for i in range(n)]
    t = pa.table({
        "u": pa.array([1] * n + [2] * 1 + [3] * 2, pa.int64()),
        "o": pa.array(list(range(n)) + [0] + [0, 1], pa.int64()),
        "v": pa.array(alt + [5.0] + [1.0, 2.0], pa.float64())})
    out = _collect(autocorr_lag1(rd.from_arrow(t), "u", ["o"], "v")) \
        .sort_by([("u", "ascending")])
    # u=2 has no pair, u=3 has one pair -> both dropped (HAVING >= 2)
    assert out["u"].to_pylist() == [1]
    prev, cur = np.array(alt[:-1]), np.array(alt[1:])
    expect = np.corrcoef(prev, cur)[0, 1]
    assert out["acf1"].to_pylist()[0] == pytest.approx(expect, abs=1e-6)
    assert out["n_pairs"].to_pylist() == [n - 1]


def test_autocorr_constant_series_null(ray_session):
    from rho_contracts_ray.stages.statistics import autocorr_lag1

    t = pa.table({
        "u": pa.array([7] * 5, pa.int64()),
        "o": pa.array(range(5), pa.int64()),
        "v": pa.array([3.0] * 5, pa.float64())})
    out = _collect(autocorr_lag1(rd.from_arrow(t), "u", ["o"], "v"))
    assert out["n_pairs"].to_pylist() == [4]
    assert out["acf1"].to_pylist() == [None]


def test_gini_known_values(ray_session):
    from rho_contracts_ray.stages.statistics import gini_coefficient

    t = pa.table({
        "g": ["eq"] * 4 + ["one"] * 4 + ["zero"] * 2,
        "cents": pa.array([5, 5, 5, 5,      # equal -> 0
                           0, 0, 0, 100,    # one-takes-all, n=4 -> 0.75
                           0, 0], pa.int64())})
    out = _collect(gini_coefficient(rd.from_arrow(t), "g", "cents")) \
        .sort_by([("g", "ascending")])
    got = dict(zip(out["g"].to_pylist(), out["gini"].to_pylist()))
    assert got["eq"] == 0.0
    assert got["one"] == pytest.approx(0.75)
    assert got["zero"] is None   # sum == 0 -> undefined


def test_conversion_lag_strictly_after(ray_session):
    from rho_contracts_ray.stages.statistics import conversion_lag

    TS = pa.timestamp("us")
    rows = [
        # u1: click@10, purchase@10 (same instant -> NOT counted),
        #     purchase@25 -> lag 15
        (1, 10, "click"), (1, 10, "purchase"), (1, 25, "purchase"),
        # u2: purchase BEFORE first click only -> no conversion
        (2, 5, "purchase"), (2, 9, "click"),
        # u3: click only
        (3, 7, "click"),
        # u4: purchase only
        (4, 3, "purchase"),
        # u5: two clicks, purchase between them -> first click wins
        (5, 10, "click"), (5, 20, "purchase"), (5, 15, "click"),
        # noise type must be ignored
        (1, 11, "view"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], TS),
        "event_type": [r[2] for r in rows]})
    out = _collect(conversion_lag(rd.from_arrow(t), "user_id", "ts",
                                  "event_type", "click", "purchase")) \
        .sort_by([("user_id", "ascending")])
    assert out["user_id"].to_pylist() == [1, 5]
    assert out["from_us"].to_pylist() == [10, 10]
    assert out["to_us"].to_pylist() == [25, 20]
    assert out["lag_us"].to_pylist() == [15, 10]


def test_new_stage_empty_inputs_keep_key_type(ray_session):
    """Zero-output runs must emit the INPUT's key type in the empty
    schema (col_type plumbing) — int keys and string keys both ride the
    same stages."""
    from rho_contracts_ray.stages.statistics import (
        conversion_lag, gini_coefficient, spearman_rho)

    ti = pa.table({"k": pa.array([], pa.int64()),
                   "x": pa.array([], pa.float64()),
                   "y": pa.array([], pa.float64())})
    out = spearman_rho(rd.from_arrow(ti), "k", "x", "y")
    assert out.schema().base_schema.field("k").type == pa.int64()

    ts_ = pa.table({"k": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64())})
    out = gini_coefficient(rd.from_arrow(ts_), "k", "cents")
    assert out.schema().base_schema.field("k").type == pa.string()

    tc = pa.table({"k": pa.array([], pa.string()),
                   "ts": pa.array([], pa.timestamp("us")),
                   "et": pa.array([], pa.string())})
    out = conversion_lag(rd.from_arrow(tc), "k", "ts", "et", "a", "b")
    assert out.schema().base_schema.field("k").type == pa.string()


def test_k_anonymity_report(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.statistics import k_anonymity

    t = pa.table({
        "zip": ["a", "a", "a", "b", "b", "c", None],
        "age": [1, 1, 1, 2, 2, 3, 3],
    })
    for parts in (1, 3):
        out = k_anonymity(rd.from_arrow(t).repartition(parts),
                          ["zip", "age"], k=3).to_pylist()[0]
        # classes: (a,1)x3, (b,2)x2, (c,3)x1, (None,3)x1 — null is its
        # own class, SQL GROUP BY parity
        assert out == {"k": 3, "n_rows": 7, "n_groups": 4,
                       "min_group_size": 1, "n_small_groups": 3,
                       "rows_at_risk": 4,
                       "risk_share": round(4 / 7, 6)}


def test_k_anonymity_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.statistics import k_anonymity

    t = pa.table({"zip": pa.array([], pa.string()),
                  "age": pa.array([], pa.int64())})
    out = k_anonymity(rd.from_arrow(t), ["zip", "age"], k=5).to_pylist()[0]
    assert out["n_rows"] == 0 and out["n_groups"] == 0
    assert out["risk_share"] == 0.0


def test_roc_auc_exact_ties_and_perfect(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.statistics import roc_auc

    # perfect separation -> 1.0; all-tied -> 0.5; known mixed case
    t = pa.table({"s": [0.1, 0.2, 0.8, 0.9],
                  "y": [False, False, True, True]})
    assert roc_auc(rd.from_arrow(t), "s", "y")["auc"][0].as_py() == 1.0

    t = pa.table({"s": [0.5] * 6, "y": [True, False] * 3})
    assert roc_auc(rd.from_arrow(t), "s", "y")["auc"][0].as_py() == 0.5

    # hand case: pos scores {0.3, 0.5}, neg {0.3, 0.4}
    # pairs: (0.3 vs 0.3 tie=0.5) (0.3 vs 0.4 lose=0) (0.5 vs both win=2)
    # AUC = 2.5 / 4
    t = pa.table({"s": [0.3, 0.5, 0.3, 0.4],
                  "y": [True, True, False, False]})
    for parts in (1, 4):
        got = roc_auc(rd.from_arrow(t).repartition(parts), "s", "y")
        assert got["auc"][0].as_py() == round(2.5 / 4, 6)
        assert got["n_pos"][0].as_py() == 2
        assert got["n_neg"][0].as_py() == 2


def test_roc_auc_degenerate_single_class(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.statistics import roc_auc

    t = pa.table({"s": [0.1, 0.2], "y": [True, True]})
    got = roc_auc(rd.from_arrow(t), "s", "y")
    assert got["auc"][0].as_py() is None
    assert got["n_neg"][0].as_py() == 0


def test_daily_xcorr_gaps_and_alignment(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.statistics import daily_xcorr

    US = 86_400_000_000
    # days 0,1,2,4 observed (3 missing): lag pairing must skip the gap
    rows = []
    for day, (na, nb) in {0: (3, 1), 1: (1, 2), 2: (5, 0),
                          4: (2, 2)}.items():
        rows += [("a", day)] * na + [("b", day)] * nb
    t = pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] * US + 7 for r in rows],
                       pa.timestamp("us")),
    })
    out = daily_xcorr(rd.from_arrow(t).repartition(3), "ts",
                      "event_type", "a", "b", lags=(-1, 0, 1))
    rowsd = {r["lag"]: (r["n_days"], r["xcorr"])
             for r in out.to_pylist()}
    import numpy as np
    x = {0: 3, 1: 1, 2: 5, 4: 2}
    y = {0: 1, 1: 2, 2: 0, 4: 2}

    def ref(lag):
        ds = [d for d in x if d + lag in x]
        if len(ds) < 2:
            return (len(ds), None)
        xs = np.array([x[d] for d in ds], float)
        ys = np.array([y[d + lag] for d in ds], float)
        n = len(ds)
        den = (n * (xs * xs).sum() - xs.sum() ** 2) * \
              (n * (ys * ys).sum() - ys.sum() ** 2)
        if den <= 0:
            return (n, None)
        return (n, round(float((n * (xs * ys).sum() - xs.sum() * ys.sum())
                               / np.sqrt(den)), 6))

    for lag in (-1, 0, 1):
        assert rowsd[lag] == ref(lag), lag


def test_daily_xcorr_zero_variance_and_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.statistics import daily_xcorr

    US = 86_400_000_000
    t = pa.table({"event_type": ["a", "a", "b", "b"],
                  "ts": pa.array([0, US, 0, US], pa.timestamp("us"))})
    out = {r["lag"]: r["xcorr"]
           for r in daily_xcorr(rd.from_arrow(t), "ts", "event_type",
                                "a", "b", lags=(0,)).to_pylist()}
    assert out == {0: None}   # constant series -> undefined corr

    e = pa.table({"event_type": pa.array([], pa.string()),
                  "ts": pa.array([], pa.timestamp("us"))})
    out = daily_xcorr(rd.from_arrow(e), "ts", "event_type", "a", "b")
    assert out.num_rows == 0


def test_null_timestamps_dropped_not_crashed(ray_session):
    """retention/ohlc/resample/conversion_lag with a null ts row: the row
    drops instead of NaN-poisoning the int64 time arithmetic
    (code-review regression batch)."""
    from rho_contracts_ray.stages.statistics import (conversion_lag,
                                                     ohlc_bars,
                                                     resample_ffill,
                                                     retention_counts)

    ts = pa.array([1_700_000_000_000_000 + i * 86_400_000_000
                   for i in range(4)] + [None], pa.timestamp("us"))
    t = pa.table({"user_id": pa.array([1, 1, 2, 2, 1], pa.int64()),
                  "ts": ts,
                  "event_type": pa.array(["click", "purchase", "click",
                                          "purchase", "click"]),
                  "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])})
    ds = rd.from_arrow(t)
    assert retention_counts(ds, "user_id", "ts").count() > 0
    assert ohlc_bars(ds, "user_id", "ts", "value").count() > 0
    assert resample_ffill(ds, "user_id", "ts", "value",
                          "v_filled").count() > 0
    assert conversion_lag(ds, "user_id", "ts", "event_type",
                          "click", "purchase").count() > 0


def test_funnel_and_zscore_empty_inputs(ray_session):
    """Zero matching events / all-null values: graceful zero-count row
    (funnel) and all-null z (zscore), not a concat ValueError."""
    from rho_contracts_ray.stages.statistics import funnel_steps, \
        group_zscore

    t = pa.table({"user_id": pa.array([1, 2], pa.int64()),
                  "ts": pa.array([1, 2], pa.timestamp("us")),
                  "event_type": pa.array(["view", "view"]),
                  "value": pa.array([None, None], pa.float64())})
    ds = rd.from_arrow(t)
    f = funnel_steps(ds, "user_id", "ts", "event_type",
                     ["signup", "purchase"])
    ftab = f if isinstance(f, pa.Table) else None
    if ftab is None:
        ftab = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in f.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    assert ftab["step_1_signup"][0].as_py() == 0
    z = group_zscore(ds, "event_type", "value",
                     ["user_id"]).to_pandas()
    assert len(z) == 2 and z["z"].isna().all()


def test_winsorize_validates_fences(ray_session):
    import pytest

    from rho_contracts_ray.stages.statistics import group_winsorize

    ds = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                 "v": pa.array([1.0])}))
    with pytest.raises(ValueError, match="lo_q"):
        group_winsorize(ds, "k", "v", 0.95, 0.05)


def test_cusum_gini_overflow_guard(ray_session):
    """Magnitudes that would silently wrap int64 fail loudly instead
    (the docstrings promise integer-exact results)."""
    import pytest

    from rho_contracts_ray.stages.statistics import cusum_changepoint, \
        gini_coefficient

    n = 3000
    big = 2_000_000_000_000  # 2e12 cents; n^2 * amax ~ 1.8e19 > 2^63
    t = pa.table({"k": pa.array([1] * n, pa.int64()),
                  "c": pa.array([big] * n, pa.int64())})
    ds = rd.from_arrow(t)
    with pytest.raises((ValueError, Exception)) as ei:
        cusum_changepoint(ds, "k", ["c"], "c").to_pandas()
    assert "overflow" in str(ei.value)
    with pytest.raises((ValueError, Exception)) as ei2:
        gini_coefficient(ds, "k", "c").to_pandas()
    assert "overflow" in str(ei2.value)

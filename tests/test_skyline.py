"""Pareto frontier (stages/skyline.py) vs a brute-force local oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.skyline import pareto_front


def _brute(df, maximize, minimize):
    vals = df[maximize + minimize].to_numpy(np.float64)
    vals[:, len(maximize):] *= -1
    keep = []
    for i in range(len(vals)):
        dom = ((vals >= vals[i]).all(axis=1)
               & (vals > vals[i]).any(axis=1)).any()
        if not dom:
            keep.append(i)
    return df.iloc[keep]


def test_skyline_matches_brute_force(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(3000),
        "x": rng.integers(0, 50, 3000).astype(float),
        "y": rng.integers(0, 50, 3000).astype(float),
    })
    ds = rd.from_pandas(df).repartition(7)
    got = pareto_front(ds, ["x"], ["y"], keep_cols=["id", "x", "y"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    ref = _brute(df, ["x"], ["y"]).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_skyline_3d_and_duplicates(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(800),
        "a": rng.integers(0, 6, 800).astype(float),
        "b": rng.integers(0, 6, 800).astype(float),
        "c": rng.integers(0, 6, 800).astype(float),
    })   # heavy duplication: equal points must all survive
    ds = rd.from_pandas(df).repartition(5)
    got = pareto_front(ds, ["a", "b"], ["c"],
                       keep_cols=["id", "a", "b", "c"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    ref = _brute(df, ["a", "b"], ["c"]) \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_skyline_nulls_excluded_and_datetime(ray_session):
    t = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "price": pa.array([10.0, 20.0, None, 20.0], pa.float64()),
        "when": pa.array([100, 50, 10, 50], pa.timestamp("us")),
    })
    got = pareto_front(rd.from_arrow(t), ["price"], ["when"],
                       keep_cols=["k", "price", "when"]).to_pandas()
    # row 3 (null price) excluded; rows 2 and 4 are identical objective
    # points -> both survive; row 1 dominated by them
    assert sorted(got["k"]) == [2, 4]


def test_skyline_block_invariance(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"x": rng.normal(size=500),
                       "y": rng.normal(size=500)})
    outs = []
    for parts in (1, 3, 11):
        o = pareto_front(rd.from_pandas(df).repartition(parts),
                         ["x", "y"], []).to_pandas() \
            .sort_values(["x", "y"]).reset_index(drop=True)
        outs.append(o)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])


def test_pareto_minimize_unsigned_and_bool(ray_session):
    """Unsigned minimize objectives must not wrap under negation (the
    true minimum was silently dropped); bool must not raise."""
    from rho_contracts_ray.stages.skyline import pareto_front

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "price": pa.array([0, 1], pa.uint32()),
                  "flag": pa.array([True, False])})
    out = pareto_front(rd.from_arrow(t), maximize=[], minimize=["price"],
                       keep_cols=["id", "price"]).to_pandas()
    assert out["id"].tolist() == [1]        # price 0 IS the minimum
    out2 = pareto_front(rd.from_arrow(t), maximize=[], minimize=["flag"],
                        keep_cols=["id", "flag"]).to_pandas()
    assert out2["id"].tolist() == [2]       # False < True

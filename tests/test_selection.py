"""Exact distributed selection (stages/selection.py): bit-parity with
DuckDB quantile_cont on random data, multi-pass refinement forced by a
tiny collect_limit, equal-value-mass short circuit, NaN/null exclusion."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rho_contracts_ray.stages.selection import exact_global_quantile


def _ds(values):
    import ray.data as rd

    t = pa.table({"value": pa.array(values, pa.float64())})
    return rd.from_arrow(t).repartition(4)


def _duck(values, q):
    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(values, pa.float64())}))
    return con.execute(
        f"SELECT quantile_cont(v, {q}) FROM t WHERE isfinite(v)"
    ).fetchone()[0]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=400),
       st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
def test_matches_duckdb_quantile_cont(ray_session, values, q):
    got, n = exact_global_quantile(_ds(values), "value", q,
                                   collect_limit=16)  # force refinement
    assert n == len(values)
    assert got == _duck(values, q)      # bit-equal, not approx


def test_heavy_ties_and_multipass(ray_session):
    rng = np.random.default_rng(7)
    vals = np.concatenate([np.full(5000, 42.25),
                           rng.uniform(-100, 100, 5000)])
    rng.shuffle(vals)
    got, n = exact_global_quantile(_ds(vals.tolist()), "value", 0.5,
                                   collect_limit=64)
    assert n == 10000
    assert got == _duck(vals.tolist(), 0.5)


def test_single_value_mass(ray_session):
    got, n = exact_global_quantile(_ds([7.5] * 1000), "value", 0.5,
                                   collect_limit=10)
    assert (got, n) == (7.5, 1000)


def test_nan_null_excluded(ray_session):
    vals = [1.0, None, float("nan"), 2.0, 3.0]
    got, n = exact_global_quantile(_ds(vals), "value", 0.5)
    assert n == 3
    assert got == 2.0


def test_all_nan_returns_none(ray_session):
    got, n = exact_global_quantile(_ds([float("nan"), None]), "value", 0.5)
    assert got is None and n == 0


@pytest.mark.parametrize("n_rows", [1, 2, 3])
def test_tiny_inputs(ray_session, n_rows):
    vals = [float(i * 10 + 1) for i in range(n_rows)]
    got, _ = exact_global_quantile(_ds(vals), "value", 0.5)
    assert got == _duck(vals, 0.5)


def test_bimodal_mass_straddling_rank_streams_counts(ray_session):
    """Two distinct values, each holding more rows than collect_limit,
    with the quantile bracket straddling them: the refinement can't
    shrink (the bracket spans both), so selection must fall to the
    streaming value-count path instead of collecting the mass."""
    vals = [42.0] * 500 + [43.0] * 500
    got, n = exact_global_quantile(_ds(vals), "value", 0.5,
                                   collect_limit=50)
    assert n == 1000
    assert got == _duck(vals, 0.5) == 42.5

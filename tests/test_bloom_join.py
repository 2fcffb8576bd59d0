"""Bloom key prefilter (stages/joins.build_key_bloom /
bloom_filter_keys): one-sided error, exact-join output unchanged."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.joins import (bloom_filter_keys,
                                            bucketed_join,
                                            build_key_bloom)


def _tables():
    rng = np.random.default_rng(6)
    # fact side: 80% dangling keys -> the prefilter has real work
    fact_keys = np.concatenate([rng.integers(0, 200, 800),
                                rng.integers(10_000, 99_000, 3200)])
    left = pa.table({"k": pa.array(fact_keys, pa.int64()),
                     "x": pa.array(rng.integers(0, 9, fact_keys.size))})
    right = pa.table({"k": pa.array(np.arange(200), pa.int64()),
                      "y": pa.array(np.arange(200) * 10)})
    return left, right


def test_prefilter_never_drops_matches_and_shrinks(ray_session):
    left, right = _tables()
    lds = rd.from_arrow(left).repartition(4)
    rds = rd.from_arrow(right).repartition(2)
    bloom = build_key_bloom(rds, ["k"])
    filtered = bloom_filter_keys(lds, bloom, ["k"]).materialize()
    n_match = int((left["k"].to_numpy() < 200).sum())
    assert n_match <= filtered.count() < left.num_rows  # one-sided + real shrink

    base = bucketed_join(lds, rds, ["k"], ["k", "x"], ["k", "y"]) \
        .to_pandas().sort_values(["k", "x", "y"]).reset_index(drop=True)
    pre = bucketed_join(filtered, rds, ["k"], ["k", "x"], ["k", "y"]) \
        .to_pandas().sort_values(["k", "x", "y"]).reset_index(drop=True)
    assert base.equals(pre)                             # output unchanged


def test_bloom_null_keys_drop(ray_session):
    left = pa.table({"k": pa.array([1, None, 2], pa.int64())})
    right = pa.table({"k": pa.array([1, None], pa.int64())})
    bloom = build_key_bloom(rd.from_arrow(right), ["k"])
    out = bloom_filter_keys(rd.from_arrow(left), bloom, ["k"]).to_pandas()
    assert 1 in set(out["k"]) and not out["k"].isna().any()

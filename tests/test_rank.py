"""Global (no-PARTITION) ranking windows: distinct-value compression +
block-offset prefix sums (stages/rank.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.rank import global_value_rank


def _ref(vals):
    """Local reference: SQL rank/dense_rank/cume over non-null values."""
    v = np.sort(np.array([x for x in vals if x is not None]))
    uniq, cnt = np.unique(v, return_counts=True)
    cume = np.cumsum(cnt)
    return {u: (int(cume[i] - cnt[i] + 1), i + 1, int(cume[i]))
            for i, u in enumerate(uniq)}, len(v)


def test_global_value_rank_matches_reference(ray_session):
    rng = np.random.default_rng(3)
    vals = [None if i % 19 == 0 else float(x)
            for i, x in enumerate(rng.integers(0, 40, 1000))]
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})) \
        .repartition(13)   # many blocks -> real offset arithmetic
    rk, total = global_value_rank(ds, "v")
    ref, n = _ref(vals)
    assert total == n
    got = rk.to_pandas().sort_values("v").reset_index(drop=True)
    assert len(got) == len(ref)
    for _, row in got.iterrows():
        r, d, c = ref[row["v"]]
        assert (row["rank"], row["dense_rank"], row["cume_cnt"]) == (r, d, c)


def test_local_equals_distributed_rank_path(ray_session):
    vals = [None if i % 9 == 0 else float(x)
            for i, x in enumerate(np.random.default_rng(11)
                                  .integers(0, 60, 700))]
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})) \
        .repartition(6)
    a, na = global_value_rank(ds, "v")                    # local path
    b, nb = global_value_rank(ds, "v", local_limit=0)     # distributed
    assert na == nb
    pa_ = a.to_pandas().sort_values("v").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("v").reset_index(drop=True)
    cols = ["v", "cnt", "dense_rank", "rank", "cume_cnt"]
    assert pa_[cols].equals(pb_[cols])


def test_attach_broadcast_equals_join_fallback(ray_session, monkeypatch):
    import rho_contracts_ray.stages.rank as rankmod

    vals = [None if i % 7 == 0 else float(x)
            for i, x in enumerate(np.random.default_rng(5)
                                  .integers(0, 25, 300))]
    t = pa.table({"id": pa.array(range(300), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(t).repartition(4)
    bc, n1 = rankmod.attach_global_ranks(ds, "v")
    bc = bc.to_pandas().sort_values("id").reset_index(drop=True)
    monkeypatch.setattr(rankmod, "_BCAST_DISTINCT_LIMIT", 0)
    jn, n2 = rankmod.attach_global_ranks(ds, "v")
    jn = jn.to_pandas().sort_values("id").reset_index(drop=True)
    assert n1 == n2
    cols = ["id", "v", "rank", "dense_rank", "cume_cnt"]
    assert bc[cols].equals(jn[cols])


def test_global_value_rank_empty_and_all_null(ray_session):
    ds = rd.from_arrow(pa.table({"v": pa.array([None, None],
                                               pa.float64())}))
    rk, total = global_value_rank(ds, "v")
    assert total == 0 and rk.count() == 0


def test_global_value_rank_block_invariance(ray_session):
    """Same ranks regardless of how the input is partitioned."""
    vals = pa.table({"v": pa.array([5.0, 1.0, 5.0, 2.0, 2.0, 9.0])})
    outs = []
    for parts in (1, 2, 5):
        rk, total = global_value_rank(
            rd.from_arrow(vals).repartition(parts), "v")
        assert total == 6
        outs.append(rk.to_pandas().sort_values("v")
                    .reset_index(drop=True))
    for o in outs[1:]:
        assert o.equals(outs[0])
    base = outs[0]   # one row per DISTINCT value: 1, 2, 5, 9
    assert list(base["v"]) == [1.0, 2.0, 5.0, 9.0]
    assert list(base["rank"]) == [1, 2, 4, 6]
    assert list(base["dense_rank"]) == [1, 2, 3, 4]
    assert list(base["cume_cnt"]) == [1, 3, 5, 6]


def test_sorted_prefix_sum_local_and_distributed(ray_session):
    from rho_contracts_ray.stages.rank import sorted_prefix_sum

    t = pa.table({"k": pa.array([5, 1, 9, 3], pa.int64()),
                  "v": pa.array([10, 2, 4, 1], pa.int64())})
    for parts in (1, 3):
        for limit in (20_000_000, 0):    # driver path / block-offset path
            out = sorted_prefix_sum(
                rd.from_arrow(t).repartition(parts), "k", "v", "cum",
                local_limit=limit).to_pandas() \
                .sort_values("k").reset_index(drop=True)
            assert list(out["k"]) == [1, 3, 5, 9]
            assert list(out["cum"]) == [2, 3, 13, 17]


def test_sorted_prefix_sum_empty(ray_session):
    from rho_contracts_ray.stages.rank import sorted_prefix_sum

    ds = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())}))
    out = sorted_prefix_sum(ds, "k", "v", "cum")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "v", "cum"}

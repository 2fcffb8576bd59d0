"""Graph operators: co-occurrence edges, multi-source BFS, triangles
(stages/graph.py) vs tiny local references."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rho_contracts_ray.stages.graph import (bfs_distances,
                                            cooccurrence_edges,
                                            triangle_count)


def _local_bfs(edges, seeds, max_depth):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_depth + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.add(m)
        frontier = nxt
    return dist


def _local_triangles(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({x for e in es for x in e})
    cnt = 0
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) not in es:
                continue
            for z in nodes[nodes.index(y) + 1:]:
                if (x, z) in es and (y, z) in es:
                    cnt += 1
    return cnt


def test_cooccurrence_edges_distinct_ordered(ray_session):
    t = pa.table({"g": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                  "item": pa.array([5, 3, 9, 3, 5, 7], pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    e = cooccurrence_edges(ds, "g", "item").to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    got = list(map(tuple, e[["u", "v"]].values))
    assert got == [(3, 5), (3, 9), (5, 9)]   # (3,5) from g=1 AND g=2: once


def test_bfs_matches_local_reference(ray_session):
    rng = np.random.default_rng(7)
    m = 220
    u = rng.integers(0, 60, m)
    v = rng.integers(0, 60, m)
    keep = u != v
    edges = {tuple(sorted((int(a), int(b)))) for a, b in
             zip(u[keep], v[keep])}
    el = sorted(edges)
    eds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in el], pa.int64()),
        "v": pa.array([e[1] for e in el], pa.int64())})).repartition(4)
    seeds = pa.table({"node": pa.array([0, 17], pa.int64())})
    for depth in (1, 3):
        ref = _local_bfs(el, [0, 17], depth)
        for strat in ("auto", "exchange", "local"):
            got = bfs_distances(eds, seeds, depth,
                                strategy=strat).to_pandas()
            assert dict(zip(got["node"], got["dist"])) == ref, strat


def test_bfs_unreached_absent_and_seed_zero(ray_session):
    eds = rd.from_arrow(pa.table({"u": pa.array([1, 3], pa.int64()),
                                  "v": pa.array([2, 4], pa.int64())}))
    got = bfs_distances(eds, pa.table({"node": pa.array([1], pa.int64())}),
                        5).to_pandas().sort_values("node")
    assert dict(zip(got["node"], got["dist"])) == {1: 0, 2: 1}


def test_triangle_count_matches_local(ray_session):
    rng = np.random.default_rng(11)
    m = 400
    u = rng.integers(0, 40, m)
    v = rng.integers(0, 40, m)
    keep = u != v
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in zip(u[keep], v[keep])})
    eds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64())})).repartition(5)
    ref = _local_triangles(edges)
    assert triangle_count(eds) == ref                          # auto
    assert triangle_count(eds, strategy="exchange") == ref
    assert triangle_count(eds, strategy="broadcast") == ref


def test_triangle_count_clique_and_empty(ray_session):
    # K4 has exactly 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    eds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in k4], pa.int64()),
        "v": pa.array([e[1] for e in k4], pa.int64())}))
    assert triangle_count(eds) == 4
    path = rd.from_arrow(pa.table({"u": pa.array([0, 1], pa.int64()),
                                   "v": pa.array([1, 2], pa.int64())}))
    assert triangle_count(path) == 0


def _cc_collect(ds):
    import pyarrow as pa

    parts = [b for b in ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow")
             if b.num_rows]
    return pa.concat_tables(parts) if parts else None


@pytest.mark.parametrize("strategy", ["local", "exchange"])
def test_connected_components_planted(ray_session, strategy):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.graph import graph_connected_components

    # components: {1,2,3,4} (chain), {10,11} (edge), {20,21,22} (cycle)
    edges = pa.table({
        "u": pa.array([1, 2, 3, 10, 20, 21, 22], pa.int64()),
        "v": pa.array([2, 3, 4, 11, 21, 22, 20], pa.int64())})
    out = _cc_collect(graph_connected_components(rd.from_arrow(edges),
                                           strategy=strategy))
    got = dict(zip(out["node"].to_pylist(), out["comp"].to_pylist()))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain_exchange(ray_session):
    """A 40-node path: plain propagation needs ~diameter rounds — make
    sure the exchange path converges and matches, and that an
    insufficient round budget raises loudly instead of returning a
    wrong fixpoint."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.graph import graph_connected_components

    n = 40
    edges = pa.table({"u": pa.array(np.arange(n - 1), pa.int64()),
                      "v": pa.array(np.arange(1, n), pa.int64())})
    out = _cc_collect(graph_connected_components(rd.from_arrow(edges),
                                           strategy="exchange"))
    assert set(out["comp"].to_pylist()) == {0}
    assert out.num_rows == n
    with pytest.raises(RuntimeError, match="fixpoint"):
        graph_connected_components(rd.from_arrow(edges), strategy="exchange",
                             max_rounds=3)

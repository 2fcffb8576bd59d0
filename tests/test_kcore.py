"""k-core decomposition (stages/graph.py kcore_decomposition): the
h-index convergence result must equal classic peeling coreness on
planted structures and random graphs, across strategies and bucket
counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from rho_contracts_ray.stages.graph import kcore_decomposition


def _simple_coreness(edges):
    """Second, independent reference: for k = 1.. repeatedly delete
    nodes with degree < k; survivors have coreness >= k."""
    nodes = set()
    for u, v in edges:
        nodes.add(u)
        nodes.add(v)
    core = {n: 0 for n in nodes}
    k = 1
    cur = set(edges)
    while cur:
        while True:
            deg: dict[int, int] = {}
            for u, v in cur:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                break
            cur = {(u, v) for u, v in cur if u not in bad and v not in bad}
        for u, v in cur:
            core[u] = k
            core[v] = k
        k += 1
    return core


def _ds(edges, blocks=2):
    u = pa.array([e[0] for e in edges], pa.int64())
    v = pa.array([e[1] for e in edges], pa.int64())
    return ray.data.from_arrow(pa.table({"u": u, "v": v})) \
        .repartition(blocks)


def _run(edges, **kw):
    out = kcore_decomposition(_ds(edges), **kw).take_all()
    return {r["node"]: r["core"] for r in out}


def test_clique_plus_tail(ray_session):
    # 5-clique (coreness 4) with a path hanging off it (coreness 1)
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(4, 10), (10, 11), (11, 12)]
    got = _run(edges, strategy="local")
    assert {n: got[n] for n in range(5)} == {n: 4 for n in range(5)}
    assert got[10] == got[11] == got[12] == 1
    assert got == _simple_coreness(edges)


def test_two_triangles_bridge(ray_session):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got = _run(edges, strategy="local")
    assert got == {0: 2, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2}


@pytest.mark.parametrize("seed", [1, 7])
def test_random_graph_matches_peeling(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 60
    m = 180
    edges = set()
    while len(edges) < m:
        a, b = int(rng.integers(n)), int(rng.integers(n))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    ref = _simple_coreness(edges)
    got = _run(edges, strategy="local")
    assert got == ref


def test_exchange_matches_local_and_bucket_invariance(ray_session):
    rng = np.random.default_rng(3)
    edges = set()
    while len(edges) < 120:
        a, b = int(rng.integers(40)), int(rng.integers(40))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    local = _run(edges, strategy="local")
    for nb in (1, 3, 8):
        got = _run(edges, strategy="exchange", n_buckets=nb)
        assert got == local, f"n_buckets={nb}"


def test_sort_kernel_matches_hist_kernel(ray_session):
    """The local fixpoint's two round kernels (clipped histogram vs
    lexsort) reach the same fixpoint — force the sort path with a zero
    cell budget and compare."""
    rng = np.random.default_rng(9)
    edges = set()
    while len(edges) < 150:
        a, b = int(rng.integers(50)), int(rng.integers(50))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    hist = _run(edges, strategy="local")
    sort = _run(edges, strategy="local", hist_cells=0)
    assert hist == sort == _simple_coreness(edges)


def test_empty_edges(ray_session):
    out = kcore_decomposition(
        ray.data.from_arrow(pa.table({"u": pa.array([], pa.int64()),
                                      "v": pa.array([], pa.int64())})))
    t = out.take_all()
    assert t == []


def test_combine_hist_matches_sort_fallback(monkeypatch):
    """_kcore_combine's histogram kernel and its lexsort fallback reach
    identical estimates (direct in-process call; the cell budget flips
    the branch)."""
    from rho_contracts_ray.stages import graph as g

    rng = np.random.default_rng(2)
    nodes = np.arange(20, dtype=np.int64)
    rng.shuffle(nodes)
    est = pa.table({"node": pa.array(nodes, pa.int64()),
                    "est": pa.array(rng.integers(1, 9, 20), pa.int64())})
    msgs = []
    for _ in range(3):
        n = rng.integers(0, 20, 15).astype(np.int64)
        msgs.append(pa.table({
            "node": pa.array(nodes[n], pa.int64()),
            "val": pa.array(rng.integers(1, 9, 15), pa.int64()),
            "cnt": pa.array(rng.integers(1, 4, 15), pa.int64())}))
    fn = g._kcore_combine._function
    hist_out, hist_ch = fn(est, *msgs)
    monkeypatch.setattr(g, "_KCORE_HIST_CELLS", 0)
    sort_out, sort_ch = fn(est, *msgs)
    assert hist_ch == sort_ch
    ho = {r["node"]: r["est"] for r in hist_out.to_pylist()}
    so = {r["node"]: r["est"] for r in sort_out.to_pylist()}
    assert ho == so

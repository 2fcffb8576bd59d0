"""PageRank (stages/graph.py): local power-iteration reference match,
partitioning invariance at a pinned bucket count, rank-mass conservation,
and empties."""

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.graph import pagerank


def _ref_pagerank(edges, iters=20, d=0.85):
    out, deg = defaultdict(list), Counter()
    for u, v in edges:
        for a, b in ((u, v), (v, u)):
            out[a].append(b)
            deg[a] += 1
    nodes = sorted(out)
    n = len(nodes)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        acc = {x: 0.0 for x in nodes}
        for a in nodes:
            w = r[a] / deg[a]
            for b in out[a]:
                acc[b] += w
        r = {x: (1.0 - d) / n + d * acc[x] for x in nodes}
    return r


def _edges_ds(edges, parts=4):
    return rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64())})) \
        .repartition(parts)


def test_pagerank_vs_reference(ray_session):
    rng = np.random.default_rng(11)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 40, size=(120, 2)) if a != b})
    got = pagerank(_edges_ds(edges), iters=20, n_buckets=4).to_pandas()
    want = _ref_pagerank(edges)
    assert set(got["node"]) == set(want)
    gm = dict(zip(got["node"], got["rank"]))
    for n, r in want.items():
        assert abs(gm[n] - r) < 1e-10, n
    assert abs(got["rank"].sum() - 1.0) < 1e-9   # mass conserved


def test_pagerank_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 60, size=(200, 2)) if a != b})
    a = pagerank(_edges_ds(edges, parts=2), iters=8, n_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = pagerank(_edges_ds(edges, parts=7), iters=8, n_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    # same bucket count -> identical float fold order -> byte-equal
    assert a.equals(b)


def test_pagerank_star_ranks_center_highest(ray_session):
    edges = [(0, i) for i in range(1, 9)]
    got = pagerank(_edges_ds(edges), iters=30, n_buckets=2).to_pandas()
    gm = dict(zip(got["node"], got["rank"]))
    assert gm[0] == max(gm.values())
    assert len({round(gm[i], 12) for i in range(1, 9)}) == 1  # leaves tie


def test_pagerank_empty(ray_session):
    ds = rd.from_arrow(pa.table({"u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())}))
    out = pagerank(ds, iters=3)
    assert out.count() == 0
    assert out.schema().names == ["node", "rank"]

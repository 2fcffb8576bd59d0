"""Hypothesis property tests for the round-4 additions: token-set
Jaccard overlap and multi-source BFS vs pure-Python references."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from rho_contracts_ray.stages.graph import bfs_distances
from rho_contracts_ray.stages.text import group_token_jaccard

_word = st.sampled_from(["a", "b", "cc", "dd", "e"])
_text = st.lists(_word, max_size=8).map(" ".join)
_src = st.sampled_from(["s1", "s2", "s3", None])


def _ref_jaccard(rows):
    sets = defaultdict(set)
    for g, txt in rows:
        if g is None:
            continue
        for tok in (txt or "").split():
            sets[g].add(tok)
    out = {}
    gs = sorted(sets)
    for i, a in enumerate(gs):
        for b in gs[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]),
                               inter / (len(sets[a]) + len(sets[b])
                                        - inter))
    return out


@settings(max_examples=12, deadline=None)
@given(rows=st.lists(st.tuples(_src, _text), min_size=0, max_size=40),
       parts=st.integers(1, 4))
def test_token_jaccard_property(ray_session, rows, parts):
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.string()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    got = group_token_jaccard(rd.from_arrow(t).repartition(parts),
                              "src", "text")
    gm = {(r["source_a"], r["source_b"]):
          (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
          for r in got.to_pylist()}
    assert gm == _ref_jaccard(rows)


def _ref_bfs(edges, seeds, depth):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, depth + 1):
        frontier = {m for n in frontier for m in adj[n] if m not in dist}
        for m in frontier:
            dist[m] = d
    return dist


@settings(max_examples=10, deadline=None)
@given(pairs=st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                      min_size=0, max_size=60),
       seeds=st.sets(st.integers(0, 25), min_size=1, max_size=3),
       depth=st.integers(0, 4))
def test_bfs_property_both_strategies(ray_session, pairs, seeds, depth):
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    if not edges:
        return
    eds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64())}))
    st_seeds = pa.table({"node": pa.array(sorted(seeds), pa.int64())})
    ref = _ref_bfs(edges, seeds, depth)
    for strat in ("local", "exchange"):
        got = bfs_distances(eds, st_seeds, depth, strategy=strat,
                            n_buckets=4).to_pandas()
        assert dict(zip(got["node"], got["dist"])) == ref, strat


def _ref_components(edges):
    # union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None)
@given(pairs=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                      min_size=1, max_size=80))
def test_connected_components_property(ray_session, pairs):
    from rho_contracts_ray.stages.graph import graph_connected_components

    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    if not edges:
        return
    eds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64())}))
    ref = _ref_components(edges)
    for strat in ("local", "exchange"):
        got = graph_connected_components(eds, strategy=strat,
                                   n_buckets=4).to_pandas()
        assert dict(zip(got["node"], got["comp"])) == ref, strat


def _ref_max_concurrent(iv):
    events = []
    for s, e in iv:
        events.append((s, 1))
        events.append((e, -1))
    events.sort(key=lambda x: (x[0], -x[1]))   # +1 before -1 at ties
    cur = best = 0
    at = None
    for ts, d in events:
        cur += d
        if cur > best:
            best, at = cur, ts
    return best, at


@settings(max_examples=15, deadline=None)
@given(iv=st.lists(
    st.tuples(st.integers(0, 4 * 86_400_000_000),
              st.integers(0, 600_000_000)),
    min_size=1, max_size=40))
def test_max_concurrent_property(ray_session, iv):
    from rho_contracts_ray.stages.skew import max_concurrent_intervals

    spans = [(s, s + d) for s, d in iv]
    t = pa.table({"s_us": pa.array([s for s, _ in spans], pa.int64()),
                  "e_us": pa.array([e for _, e in spans], pa.int64())})
    out = max_concurrent_intervals(rd.from_arrow(t).repartition(3))
    best, at = _ref_max_concurrent(spans)
    assert out["max_concurrent"].to_pylist() == [best]
    assert out["at_us"].to_pylist() == [at]
    assert out["n_intervals"].to_pylist() == [len(spans)]
    # routing granularity must not change the answer (scale knob)
    hourly = max_concurrent_intervals(rd.from_arrow(t).repartition(3),
                                      bucket_us=3_600_000_000)
    assert hourly.equals(out)


# -- round-4 continuation: suggest_constraints vs a pure-Python reference ----

_ints = st.lists(st.one_of(st.none(), st.integers(-5, 5)),
                 min_size=1, max_size=25)
_strs = st.lists(st.one_of(st.none(), st.sampled_from(["p", "q", "r", ""])),
                 min_size=1, max_size=25)


def _ref_profile(ints, strs, cap):
    """Scalar reference of the suggest fold for one int + one str col."""
    out = {}
    nn = [v for v in ints if v is not None]
    n = len(ints)
    out["i"] = {
        "n_null": n - len(nn),
        "completeness_bp": (len(nn) * 10000) // n,
        "min_num": float(min(nn)) if nn else None,
        "max_num": float(max(nn)) if nn else None,
    }
    sv = [v for v in strs if v is not None]
    dom = sorted(set(sv))
    out["s"] = {
        "n_null": len(strs) - len(sv),
        "min_str": min(sv) if sv else None,
        "max_str": max(sv) if sv else None,
        "domain": "|".join(dom) if 0 < len(dom) <= cap else None,
    }
    return out


@settings(max_examples=12, deadline=None)
@given(ints=_ints, strs=_strs, blocks=st.integers(1, 4),
       cap=st.integers(1, 4))
def test_suggest_profile_property(ray_session, ints, strs, blocks, cap):
    from rho_contracts_ray.constraints.suggest import suggest_constraints

    m = min(len(ints), len(strs))
    ints, strs = ints[:m], strs[:m]
    t = pa.table({"i": pa.array(ints, pa.int64()),
                  "s": pa.array(strs, pa.string())})
    prof = suggest_constraints(rd.from_arrow(t).repartition(blocks),
                               domain_cap=cap)
    rows = {r["column"]: r for r in prof.to_pylist()}
    ref = _ref_profile(ints, strs, cap)
    for col, exp in ref.items():
        for k, v in exp.items():
            assert rows[col][k] == v, (col, k, rows[col][k], v)
    # suggestion string internally consistent
    if ref["i"]["n_null"] == 0:
        assert "complete" in rows["i"]["suggestions"]
    if ref["s"]["domain"] is not None:
        assert rows["s"]["suggestions"].endswith(
            "inSet:" + ref["s"]["domain"])

"""Parity of jsval.inspect with the real Node util.inspect(v, false, 5,
false) — the renderer the reference uses for every error message
(reference src/utils.js:59-65)."""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from rho_contracts_ray.contracts import jsval
from tests.oracle import specs

VALUES = [
    None, True, False, 0, 5, -3, 5.5, 45.2, 0.1, -0.0, 1e21, 1.5e-7, 0.000001,
    123456789012345, "", "asd", "it's", 'both " and \'', "line1\nline2",
    "x" * 90, "word " * 40, [], [1, 2, 3], [1.5, 2.25, 3],
    list(range(7)), list(range(12)), list(range(120)),
    ["aa"] * 8, [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14]],
    [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]],
    [{"a": 1}, {"a": 2}, {"a": 3}, {"a": 4}, {"a": 5}, {"a": 6}, {"a": 7}],
    {}, {"x": 5}, {"x": 5, "y": "a"}, {"a": {"b": {"c": {"d": 1}}}},
    {"a": {"b": {"c": 1}}}, {"x": {"a": {"b": {"c": 1}}}, "y": 1},
    {"a": {"b": {"c": {"d": {"e": {"f": 1}}}}}},
    {"long1": "a" * 20, "long2": "b" * 20, "long3": "c" * 20},
    {"arr": [{"p": 1, "q": 2}, {"p": 3, "q": 4}]},
    {"name": "corner park", "acres": 0.1,
     "playunit": {"junglebars": True, "slides": 2,
                  "ladders": [{"color": "red", "size": "large"},
                              {"color": "blue", "size": 0}]}},
    {"weird key": 1, "0": 2, "_ok": 3},
    ["mixed", 1, None, True, {"k": []}],
    [0.5] * 64,  # embedding-like
    {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5, "f": 6, "g": 7},
]


@pytest.fixture(scope="module")
def node_renderings():
    if not specs.node_available():
        pytest.skip("node not available")
    script = (
        "let input='';process.stdin.on('data',d=>input+=d);"
        "process.stdin.on('end',()=>{const util=require('util');"
        "const vals=JSON.parse(input);"
        "const out=vals.map(v=>util.inspect(decode(v),false,5,false));"
        "process.stdout.write(JSON.stringify(out));});"
        "function decode(v){if(v===null||typeof v!=='object')return v;"
        "if(v.__nan__)return NaN;if(v.__neg0__)return -0;"
        "if(Array.isArray(v))return v.map(decode);"
        "const o={};for(const k of Object.keys(v))o[k]=decode(v[k]);return o;}"
    )
    enc = []
    for v in VALUES:
        enc.append(_encode(v))
    proc = subprocess.run(["node", "-e", script], input=json.dumps(enc).encode(),
                          capture_output=True, timeout=60)
    assert proc.returncode == 0, proc.stderr.decode()[:500]
    return json.loads(proc.stdout.decode())


def _encode(v):
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return {"__nan__": 1}
        if v == 0 and math.copysign(1, v) < 0:
            return {"__neg0__": 1}
    if isinstance(v, list):
        return [_encode(x) for x in v]
    if isinstance(v, dict):
        return {k: _encode(x) for k, x in v.items()}
    return v


@pytest.mark.parametrize("idx", range(len(VALUES)), ids=lambda i: f"v{i}")
def test_inspect_matches_node(idx, node_renderings):
    mine = jsval.inspect(VALUES[idx])
    assert mine == node_renderings[idx], (
        f"inspect mismatch for {VALUES[idx]!r}:\n"
        f"--- engine ---\n{mine}\n--- node ---\n{node_renderings[idx]}"
    )

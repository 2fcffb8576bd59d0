"""Seeded random differential fuzzing against the ACTUAL reference
library: ~400 random (contract, value) pairs per run, verdicts and
messages must match byte-for-byte.  Deterministic seed so CI is stable."""

from __future__ import annotations

import random

import pytest

from rho_contracts_ray import check_verdict
from tests.oracle import specs
from tests.oracle.specs import build_contract, decode_value

SEED = 20260817
N_CASES = 600

LEAF_SPECS = [
    {"t": "string"}, {"t": "number"}, {"t": "integer"}, {"t": "bool"},
    {"t": "any"}, {"t": "falsy"}, {"t": "truthy"},
    {"t": "value", "v": 5}, {"t": "value", "v": "a"}, {"t": "value", "v": 0},
    {"t": "oneOf", "vs": ["x", "y", 3]}, {"t": "matches", "pattern": "ab+"},
]

SCALARS = [0, 1, -2, 5, 2.5, "", "a", "ab", "abb", "x", True, False, None,
           {"__nan__": 1}, 45.2, "it's", 'say "hi"', "tab\there",
           "line\nbreak", "x" * 95]


def _rand_contract(rng: random.Random, depth: int) -> dict:
    if depth <= 0 or rng.random() < 0.4:
        spec = dict(rng.choice(LEAF_SPECS))
    else:
        kind = rng.choice(["and", "or", "array", "tuple", "object", "hash"])
        if kind in ("and", "or"):
            spec = {"t": kind,
                    "cs": [_rand_contract(rng, depth - 1)
                           for _ in range(rng.randint(2, 3))]}
        elif kind == "array":
            spec = {"t": "array", "item": _rand_contract(rng, depth - 1)}
        elif kind == "tuple":
            spec = {"t": "tuple",
                    "cs": [_rand_contract(rng, depth - 1)
                           for _ in range(rng.randint(1, 3))],
                    "strict": rng.random() < 0.3}
        elif kind == "hash":
            spec = {"t": "hash", "value": _rand_contract(rng, depth - 1)}
        else:
            fields = {f"f{i}": _rand_contract(rng, depth - 1)
                      for i in range(rng.randint(1, 3))}
            spec = {"t": "object", "fields": fields,
                    "strict": rng.random() < 0.25}
    if rng.random() < 0.2:
        spec = dict(spec)
        spec["optional"] = True
    return spec


def _rand_value(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.45:
        return rng.choice(SCALARS)
    kind = rng.choice(["list", "dict"])
    if kind == "list":
        return [_rand_value(rng, depth - 1) for _ in range(rng.randint(0, 3))]
    return {f"f{i}": _rand_value(rng, depth - 1)
            for i in range(rng.randint(0, 3))}


def _cases():
    rng = random.Random(SEED)
    out = []
    for i in range(N_CASES):
        out.append({
            "id": f"fz{i}",
            "contract": _rand_contract(rng, 3),
            "value": _rand_value(rng, 3),
            "name": "thing" if rng.random() < 0.8 else None,
        })
    return out


def _normalize(msg):
    return msg.replace("undefined", "null") if msg else msg


def test_reference_fuzz():
    if not specs.node_available():
        pytest.skip("node or reference not available")
    cases = _cases()
    refs = {r["id"]: r for r in specs.run_reference(cases)}
    mismatches = []
    ref_crashes = 0
    compared = 0
    for case in cases:
        ref = refs[case["id"]]
        if (ref["message"] or "").startswith("BUILD_ERROR"):
            continue
        if not ref["ok"] and ref.get("name") not in ("ContractError",
                                                     "ContractLibraryError"):
            # DOCUMENTED DIVERGENCE: the reference CRASHES (raw JS
            # TypeError, e.g. "data.forEach is not a function") when an
            # `or` branch's structural contract meets mismatched data —
            # its or-collection fail() doesn't throw, so nestedChecker
            # runs on the wrong type (contract.impl.js:34-49,442-451).
            # Our interpreter returns the branch failure instead of
            # crashing; verified as the only divergence class.
            ref_crashes += 1
            continue
        compared += 1
        contract = build_contract(case["contract"])
        ok, viol = check_verdict(contract, decode_value(case["value"]),
                                 case["name"])
        if ok != ref["ok"]:
            mismatches.append((case["id"], "verdict", case, ref["message"],
                               viol.message if viol else None))
        elif not ok and _normalize(viol.message) != _normalize(ref["message"]):
            mismatches.append((case["id"], "message", case, ref["message"],
                               viol.message))
    assert compared > 300, f"too few comparable cases: {compared}"
    assert ref_crashes < 60, f"unexpectedly many reference crashes: {ref_crashes}"
    assert not mismatches, (
        f"{len(mismatches)} mismatches of {compared}; first: "
        + "\n".join(str(x) for x in mismatches[0])
    )

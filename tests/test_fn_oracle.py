"""Differential oracle for FUNCTION contracts: wrap a stub with the actual
reference library, call it, and require identical verdicts + messages from
our api_guard wrapper (FIXTURES.md F6 / SURVEY.md §2.4)."""

from __future__ import annotations

import pytest

from rho_contracts_ray.contracts import ast
from rho_contracts_ray.contracts.errors import RowContractError
from rho_contracts_ray.functions import api_guard
from tests.oracle import specs
from tests.oracle.specs import NAN, build_contract, decode_value

NUM = {"t": "number"}
STR = {"t": "string"}
OPT_NUM = {"t": "number", "optional": True}

# (id, fn_spec, call_args, impl_returns)
FN_CASES = [
    ("fn_ok", {"t": "fn", "args": [NUM, NUM], "returns": NUM}, [1, 2], 3),
    ("fn_wrong_count", {"t": "fn", "args": [NUM, NUM]}, [1], 7),
    ("fn_too_many", {"t": "fn", "args": [NUM, OPT_NUM]}, [1, 2, 3], 7),
    ("fn_too_few", {"t": "fn", "args": [NUM, OPT_NUM]}, [], 7),
    ("fn_optional_omitted", {"t": "fn", "args": [NUM, OPT_NUM]}, [1], 7),
    ("fn_bad_arg", {"t": "fn", "args": [NUM], "returns": NUM}, ["x"], 7),
    ("fn_bad_arg2", {"t": "fn", "args": [STR, NUM]}, ["a", "b"], 7),
    ("fn_bad_result", {"t": "fn", "args": [NUM], "returns": STR}, [1], 7),
    ("fn_deep_arg",
     {"t": "fn", "args": [{"t": "object", "fields": {"x": NUM}}]},
     [{"x": "bad"}], 7),
    ("fn_extra_ok",
     {"t": "fn", "args": [NUM], "extraArgs": {"t": "array", "item": STR}},
     [1, "a", "b"], 7),
    ("fn_extra_bad",
     {"t": "fn", "args": [NUM], "extraArgs": {"t": "array", "item": STR}},
     [1, "a", 5], 7),
    ("fun_named_ok",
     {"t": "fun", "named": [["fstArg", NUM], ["sndArg", STR]]}, [1, "a"], 7),
    ("fun_named_bad",
     {"t": "fun", "named": [["fstArg", NUM], ["sndArg", STR]]}, [1, 2], 7),
    ("fn_nan_arg", {"t": "fn", "args": [NUM]}, [NAN], 7),
    ("fn_null_arg", {"t": "fn", "args": [NUM]}, [None], 7),
]


def _build_fn_contract(spec: dict) -> api_guard.FnContract:
    if spec["t"] == "fn":
        fc = api_guard.fn(*[build_contract(s) for s in spec.get("args", [])])
    else:
        fc = api_guard.fun(*[{nm: build_contract(s)}
                             for nm, s in spec.get("named", [])])
    if spec.get("returns"):
        fc = fc.returns(build_contract(spec["returns"]))
    if spec.get("extraArgs"):
        fc = fc.extraArgs(build_contract(spec["extraArgs"]))
    return fc


@pytest.fixture(scope="module")
def oracle_results():
    if not specs.node_available():
        pytest.skip("node or reference not available")
    payload = [
        {"id": i, "contract": ct, "call": args, "impl_returns": ret,
         "name": "theFn"}
        for i, ct, args, ret in FN_CASES
    ]
    res = specs.run_reference(payload)
    return {r["id"]: r for r in res}


def _normalize(msg):
    return msg.replace("undefined", "null") if msg else msg


def test_fn_contract_fuzz():
    """Random function contracts + calls vs the actual reference: arg
    counts, optional tails, extraArgs, nested arg contracts, result
    contracts — byte-identical messages."""
    import random

    if not specs.node_available():
        pytest.skip("node or reference not available")
    rng = random.Random(77)
    leafs = [NUM, STR, {"t": "bool"}, {"t": "oneOf", "vs": ["x", 3]},
             {"t": "object", "fields": {"q": NUM}},
             {"t": "array", "item": NUM}]
    arg_vals = [1, 2.5, "a", "x", True, None, {"q": 1}, {"q": "bad"},
                [1, 2], ["a"], 3]
    cases = []
    for i in range(250):
        n_req = rng.randint(0, 3)
        n_opt = rng.randint(0, 2)
        args = [dict(rng.choice(leafs)) for _ in range(n_req)]
        for _ in range(n_opt):
            a = dict(rng.choice(leafs))
            a["optional"] = True
            args.append(a)
        spec = {"t": "fn", "args": args}
        if rng.random() < 0.5:
            spec["returns"] = dict(rng.choice(leafs))
        if rng.random() < 0.3:
            spec["extraArgs"] = {"t": "array", "item": rng.choice([NUM, STR])}
        call = [rng.choice(arg_vals)
                for _ in range(rng.randint(0, n_req + n_opt + 2))]
        ret = rng.choice(arg_vals)
        cases.append({"id": f"ff{i}", "contract": spec, "call": call,
                      "impl_returns": ret, "name": "theFn"})
    refs = {r["id"]: r for r in specs.run_reference(cases)}
    mismatches = 0
    for case in cases:
        ref = refs[case["id"]]
        if (ref["message"] or "").startswith("BUILD_ERROR"):
            continue
        if not ref["ok"] and ref.get("name") not in ("ContractError",
                                                     "ContractLibraryError"):
            continue  # reference crash class (documented divergence)
        fc = _build_fn_contract(case["contract"])
        impl = lambda *a: decode_value(case["impl_returns"])  # noqa: E731
        wrapped = api_guard.wrap(fc, impl, "theFn")
        ok, message = True, None
        try:
            wrapped(*[decode_value(a) for a in case["call"]])
        except RowContractError as e:
            ok, message = False, e.violation.message
        if ok != ref["ok"] or (
                not ok and _normalize(message) != _normalize(ref["message"])):
            mismatches += 1
            if mismatches == 1:
                print("MISMATCH", case, "\n--- ref ---\n", ref["message"],
                      "\n--- mine ---\n", message, "ok:", ok, ref["ok"])
    assert mismatches == 0


@pytest.mark.parametrize("case_id,fn_spec,call_args,impl_ret",
                         FN_CASES, ids=[x[0] for x in FN_CASES])
def test_fn_contract_parity(case_id, fn_spec, call_args, impl_ret,
                            oracle_results):
    ref = oracle_results[case_id]
    assert not (ref["message"] or "").startswith("BUILD_ERROR"), ref["message"]
    fc = _build_fn_contract(fn_spec)
    impl = lambda *a: decode_value(impl_ret)  # noqa: E731
    wrapped = api_guard.wrap(fc, impl, "theFn")
    ok, message = True, None
    try:
        wrapped(*[decode_value(a) for a in call_args])
    except RowContractError as e:
        ok, message = False, e.violation.message
    assert ok == ref["ok"], (
        f"{case_id}: engine ok={ok}, reference ok={ref['ok']}, "
        f"ref_msg={ref['message']!r} my_msg={message!r}")
    if not ok:
        assert _normalize(message) == _normalize(ref["message"]), (
            f"{case_id}:\n--- engine ---\n{message}\n"
            f"--- reference ---\n{ref['message']}")
    assert fc.to_string() == ref["tostring"]


def test_this_and_method_fuzz():
    """Random thisArg/method contracts + calls with random `this` values
    vs the actual reference — byte-identical messages."""
    import random

    if not specs.node_available():
        pytest.skip("node or reference not available")
    rng = random.Random(4242)
    this_specs = [
        {"t": "object", "fields": {"x": STR}},
        {"t": "object", "fields": {"x": NUM, "y": STR}},
        {"t": "hash", "value": NUM},
    ]
    this_vals = [{"x": "w"}, {"x": 5}, {"x": 1, "y": "s"}, {"k": 2},
                 {"k": "bad"}, None]
    arg_vals = [1, "a", None, 2.5]
    cases = []
    for i in range(120):
        kind = rng.choice(["fn_this", "method"])
        ths = rng.choice(this_specs)
        if kind == "fn_this":
            spec = {"t": "fn", "args": [NUM], "thisArg": dict(ths)}
        else:
            spec = {"t": "method", "ths": dict(ths),
                    "named": [["y", rng.choice([NUM, STR])]]}
        if rng.random() < 0.5:
            spec["returns"] = rng.choice([NUM, STR])
        call = [rng.choice(arg_vals) for _ in range(rng.randint(0, 2))]
        tv = rng.choice(this_vals)
        case = {"id": f"tf{i}", "contract": spec, "call": call,
                "impl_this_field": "x", "name": "theFn"}
        if tv is not None:
            case["this_obj"] = tv
        cases.append(case)
    refs = {r["id"]: r for r in specs.run_reference(cases)}
    mismatches = 0
    first = None
    for case in cases:
        ref = refs[case["id"]]
        if (ref["message"] or "").startswith("BUILD_ERROR"):
            continue
        if not ref["ok"] and ref.get("name") not in ("ContractError",
                                                     "ContractLibraryError"):
            continue  # reference crash class (documented divergence)
        contract = specs.build_contract(case["contract"])
        impl = decode_value({"__fn_this__": "x"})
        wrapped = api_guard.wrap(contract, impl, "theFn")
        call = wrapped if "this_obj" not in case else \
            wrapped.with_this(decode_value(case["this_obj"]))
        ok, msg = True, None
        try:
            call(*[decode_value(a) for a in case["call"]])
        except api_guard.RowContractError as e:
            ok, msg = False, e.violation.message
        except Exception:
            ok, msg = False, "PYTHON_CRASH"
        ref_msg = _normalize(ref["message"]) if ref["message"] else None
        if ok != ref["ok"] or (not ok and _normalize(msg) != ref_msg):
            mismatches += 1
            if first is None:
                first = (case, ref["message"], msg, ok, ref["ok"])
    assert mismatches == 0, first

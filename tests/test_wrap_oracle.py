"""Differential oracle for CONTAINER-recursive wrap and method/thisArg:
wrap data structures holding functions with the ACTUAL reference library,
invoke members, and require identical verdicts + byte-identical messages
(reference contract.impl.js:65-87 wrapWContext; contract.spec.js:259-265
hash wrap; function-contracts.js:167-171,437-451 thisArg/method)."""

from __future__ import annotations

import pytest

from rho_contracts_ray.contracts.errors import (ContractLibraryError,
                                                RowContractError)
from rho_contracts_ray.functions import api_guard
from tests.oracle import specs
from tests.oracle.specs import build_contract, decode_value

NUM = {"t": "number"}
STR = {"t": "string"}
FN0 = {"t": "fn"}
FN_NUM = {"t": "fn", "args": [NUM], "returns": NUM}

# (id, contract_spec, value, invoke{path,args,this_obj?}) — container cases
INVOKE_CASES = [
    ("hash_wrap_wrong_count", {"t": "hash", "value": FN0},
     {"thk": {"__fn__": 1}}, {"path": ["thk"], "args": [5]}),
    ("hash_wrap_ok", {"t": "hash", "value": FN0},
     {"thk": {"__fn__": 1}}, {"path": ["thk"], "args": []}),
    ("obj_field_bad_arg",
     {"t": "object", "fields": {"x": STR, "cb": FN_NUM}},
     {"x": "foo", "cb": {"__fn__": 3}}, {"path": ["cb"], "args": ["bad"]}),
    ("obj_field_bad_result",
     {"t": "object", "fields": {"cb": {"t": "fn", "args": [NUM],
                                       "returns": STR}}},
     {"cb": {"__fn__": 3}}, {"path": ["cb"], "args": [1]}),
    ("obj_field_ok",
     {"t": "object", "fields": {"x": STR, "cb": FN_NUM}},
     {"x": "foo", "cb": {"__fn__": 3}}, {"path": ["cb"], "args": [2]}),
    ("array_item_bad_arg", {"t": "array", "item": FN_NUM},
     [{"__fn__": 1}, {"__fn__": 2}], {"path": [1], "args": ["bad"]}),
    ("tuple_item_wrong_count",
     {"t": "tuple", "cs": [STR, FN_NUM]},
     ["a", {"__fn__": 1}], {"path": [1], "args": [1, 2]}),
    ("nested_obj_fn",
     {"t": "object",
      "fields": {"inner": {"t": "object", "fields": {"cb": FN_NUM}}}},
     {"inner": {"cb": {"__fn__": 1}}},
     {"path": ["inner", "cb"], "args": ["bad"]}),
    ("or_fn_branch_bad_arg",
     {"t": "or", "cs": [STR, FN_NUM]},
     {"__fn__": 1}, {"path": [], "args": ["bad"]}),
    ("hash_of_obj_fn",
     {"t": "hash", "value": {"t": "object", "fields": {"cb": FN0}}},
     {"k1": {"cb": {"__fn__": 1}}}, {"path": ["k1", "cb"], "args": [9]}),
]

# (id, contract_spec, value) — wrap-time failures on data
WRAP_FAIL_CASES = [
    ("wrap_non_function", FN_NUM, 5),
    ("wrap_hash_bad_data", {"t": "hash", "value": FN0}, {"thk": 5}),
    ("wrap_obj_missing_fn_field",
     {"t": "object", "fields": {"cb": FN0}}, {}),
]

# (id, fn_spec, call_args, impl, this_obj|None) — this/method cases
THIS_CASES = [
    ("thisarg_ok",
     {"t": "fn", "args": [NUM], "returns": STR,
      "thisArg": {"t": "object", "fields": {"x": STR}}},
     [4], {"__fn_this__": "x"}, {"x": "w"}),
    ("thisarg_bad_this",
     {"t": "fn", "args": [NUM], "returns": STR,
      "thisArg": {"t": "object", "fields": {"x": STR}}},
     [4], {"__fn_this__": "x"}, {"x": 50}),
    ("thisarg_missing_this",
     {"t": "fn", "args": [NUM],
      "thisArg": {"t": "object", "fields": {"x": STR}}},
     [4], {"__fn_this__": "x"}, None),
    ("method_ok",
     {"t": "method", "ths": {"t": "object", "fields": {"x": STR}},
      "named": [["y", NUM]], "returns": STR},
     [4], {"__fn_this__": "x"}, {"x": "w"}),
    ("method_bad_this",
     {"t": "method", "ths": {"t": "object", "fields": {"x": STR}},
      "named": [["y", NUM]], "returns": STR},
     [4], {"__fn_this__": "x"}, {"x": 5}),
    ("method_bad_arg",
     {"t": "method", "ths": {"t": "object", "fields": {"x": STR}},
      "named": [["y", NUM]], "returns": STR},
     ["bad"], {"__fn_this__": "x"}, {"x": "w"}),
    ("method_bad_result",
     {"t": "method", "ths": {"t": "object", "fields": {"x": STR}},
      "named": [["y", NUM]], "returns": NUM},
     [4], {"__fn_this__": "x"}, {"x": "w"}),
    ("fun_thisarg_bad_this",
     {"t": "fun", "named": [["y", NUM]], "returns": STR,
      "thisArg": {"t": "object", "fields": {"x": STR}}},
     [4], {"__fn_this__": "x"}, {"x": 50}),
]


def _normalize(msg):
    return msg.replace("undefined", "null") if msg else msg


@pytest.fixture(scope="module")
def oracle_results():
    if not specs.node_available():
        pytest.skip("node or reference not available")
    payload = []
    for i, ct, val, invoke in INVOKE_CASES:
        payload.append({"id": i, "contract": ct, "value": val,
                        "invoke": invoke, "name": "theThing"})
    for i, ct, val in WRAP_FAIL_CASES:
        payload.append({"id": i, "contract": ct, "value": val,
                        "invoke": {"path": [], "args": []},
                        "name": "theThing"})
    for i, ct, args, impl, this_obj in THIS_CASES:
        case = {"id": i, "contract": ct, "call": args, "name": "theFn"}
        if "__fn_this__" in impl:
            case["impl_this_field"] = impl["__fn_this__"]
        else:
            case["impl_returns"] = impl.get("__fn__")
        if this_obj is not None:
            case["this_obj"] = this_obj
        payload.append(case)
    res = specs.run_reference(payload)
    return {r["id"]: r for r in res}


def _run_invoke(ct, val, invoke):
    contract = build_contract(ct)
    data = decode_value(val)
    wrapped = api_guard.wrap(contract, data, "theThing")
    target = wrapped
    for p in invoke["path"]:
        target = target[p]
    args = [decode_value(a) for a in invoke.get("args", [])]
    target(*args)


@pytest.mark.parametrize("cid,ct,val,invoke",
                         INVOKE_CASES, ids=[c[0] for c in INVOKE_CASES])
def test_container_wrap_matches_reference(oracle_results, cid, ct, val,
                                          invoke):
    ref = oracle_results[cid]
    try:
        _run_invoke(ct, val, invoke)
        ok, msg = True, None
    except RowContractError as e:
        ok, msg = False, e.violation.message
    assert ok == ref["ok"], (cid, msg, ref["message"])
    if not ok:
        assert msg == _normalize(ref["message"]), (
            f"{cid}\nOURS:\n{msg}\nREF:\n{ref['message']}")


@pytest.mark.parametrize("cid,ct,val",
                         WRAP_FAIL_CASES, ids=[c[0] for c in WRAP_FAIL_CASES])
def test_wrap_time_failures_match_reference(oracle_results, cid, ct, val):
    ref = oracle_results[cid]
    try:
        api_guard.wrap(build_contract(ct), decode_value(val), "theThing")
        ok, msg = True, None
    except RowContractError as e:
        ok, msg = False, e.violation.message
    assert ok == ref["ok"], (cid, msg, ref["message"])
    if not ok:
        assert msg == _normalize(ref["message"]), (
            f"{cid}\nOURS:\n{msg}\nREF:\n{ref['message']}")


@pytest.mark.parametrize("cid,ct,args,impl,this_obj",
                         THIS_CASES, ids=[c[0] for c in THIS_CASES])
def test_this_and_method_match_reference(oracle_results, cid, ct, args,
                                         impl, this_obj):
    ref = oracle_results[cid]
    contract = build_contract(ct)
    f = decode_value(impl)
    wrapped = api_guard.wrap(contract, f, "theFn")
    call = wrapped if this_obj is None else \
        wrapped.with_this(decode_value(this_obj))
    try:
        call(*[decode_value(a) for a in args])
        ok, msg = True, None
    except RowContractError as e:
        ok, msg = False, e.violation.message
    assert ok == ref["ok"], (cid, msg, ref["message"])
    if not ok:
        assert msg == _normalize(ref["message"]), (
            f"{cid}\nOURS:\n{msg}\nREF:\n{ref['message']}")
    # toString parity for this/method contracts
    assert contract.to_string() == ref["tostring"], (
        contract.to_string(), ref["tostring"])


def test_wrap_returns_plain_data_unchanged():
    contract = build_contract({"t": "object", "fields": {"x": STR}})
    v = {"x": "foo"}
    assert api_guard.wrap(contract, v) is v


def test_and_wrap_refused():
    fc = build_contract({"t": "and", "cs": [FN0, FN0]})
    with pytest.raises(ContractLibraryError):
        api_guard.wrap(fc, decode_value({"__fn__": 1}))


def test_method_requires_contract_this():
    with pytest.raises(ContractLibraryError):
        api_guard.method("not a contract")


# -- constructs(): Python class-wrapping analogue ---------------------------
# (reference function-contracts.js:177-357 + contract-es6.spec.js; no
# byte-parity claim for prototype-surgery itself — argument/this/method
# messages reuse the node-diffed fun machinery)


def _example_contract(c):
    return c.fun({"initial": c.number}).constructs({
        "inc": c.fn(c.number).returns(c.number),
    })


class _ExampleImpl:
    def __init__(self, initial):
        self.x = initial

    def inc(self, n):
        self.x += n
        return self.x

    def _dec(self, n):  # not in the contract: stays unguarded
        self.x -= n
        return self.x


def test_constructs_builds_usable_instances():
    from rho_contracts_ray import c

    Example = c.wrap(_example_contract(c), _ExampleImpl)
    inst = Example(10)
    assert inst.x == 10
    assert inst.inc(2) == 12
    assert inst._dec(3) == 9  # uncontracted methods work normally


def test_constructs_isinstance_and_isa():
    from rho_contracts_ray import c

    Example = c.wrap(_example_contract(c), _ExampleImpl)
    inst = Example(5)
    assert isinstance(inst, Example)
    assert isinstance(inst, _ExampleImpl)
    c.check(c.isA(Example), inst)
    c.check(c.isA(_ExampleImpl), inst)


def test_constructs_checks_constructor_and_method_args():
    from rho_contracts_ray import c

    Example = c.wrap(_example_contract(c), _ExampleImpl)
    with pytest.raises(RowContractError, match="number"):
        Example("nope")
    inst = Example(1)
    with pytest.raises(RowContractError, match="number.*'nope'"):
        inst.inc("nope")
    with pytest.raises(RowContractError, match="Wrong number of arg"):
        inst.inc(1, 2)


def test_constructs_checks_this_isa():
    from rho_contracts_ray import c

    Example = c.wrap(_example_contract(c), _ExampleImpl)
    unbound = Example.__dict__["inc"]
    with pytest.raises(RowContractError) as ei:
        unbound(object(), 2)  # wrong `this`
    assert "isA(_ExampleImpl)" in ei.value.violation.message
    assert "`this` argument" in ei.value.violation.message
    # a proper instance passes through the same unbound path
    assert unbound(Example(3), 2) == 5


def test_constructs_missing_prototype_field():
    from rho_contracts_ray import c

    bad = c.fun({"i": c.number}).constructs({"nope": c.fn()})
    with pytest.raises(RowContractError) as ei:
        c.wrap(bad, _ExampleImpl, "Example")
    assert ("constructs: some fields present in Example's prototype "
            "contract are missing on the prototype: nope"
            ) in ei.value.violation.message


def test_constructs_method_result_checked():
    from rho_contracts_ray import c

    class Bad:
        def __init__(self, initial):
            self.x = initial

        def inc(self, n):
            return "not a number"

    Example = c.wrap(c.fun({"initial": c.number}).constructs({
        "inc": c.fn(c.number).returns(c.number),
    }), Bad)
    inst = Example(1)
    with pytest.raises(RowContractError, match="number"):
        inst.inc(2)


def test_generate_docs_renders_registry():
    from rho_contracts_ray import c
    from rho_contracts_ray.functions import api_guard

    api_guard.document_module("DocsDemo", "A demo module.")
    api_guard.document_category("DocsDemo", "Numbers", "numeric helpers")
    api_guard.document_type("DocsDemo", c.integer.rename("count_t"))
    api_guard.publish("DocsDemo", {"add": lambda a, b: a + b},
                      {"add": c.fn(c.number, c.number).returns(c.number)})
    md = api_guard.generate_docs("DocsDemo")
    assert "# DocsDemo" in md
    assert "A demo module." in md
    assert "**add**: `c.fn(c.number, c.number -> c.number)`" in md
    assert "## Numbers" in md and "numeric helpers" in md
    assert "count_t" in md


def test_generate_docs_html_renders_registry():
    """HTML flavour: same registry, the reference template's element
    classes, category grouping via the per-contract category that .doc()
    latches after documentCategory, object types as field tables."""
    from rho_contracts_ray import c
    from rho_contracts_ray.contracts import ast as _ast
    from rho_contracts_ray.functions import api_guard

    # the current category is global (like the reference's
    # currentCategory) — clear whatever a previous test latched
    _ast._CURRENT_CATEGORY[0] = False
    api_guard.document_module("HtmlDemo", "An html demo.")
    api_guard.publish("HtmlDemo", {"plain": lambda: 1},
                      {"plain": c.fn().returns(c.number).doc("no category")})
    api_guard.document_category("HtmlDemo", "Shapes", "shape helpers")
    api_guard.document_type(
        "HtmlDemo",
        c.object({"x": c.number.doc("the x"), "y": c.number})
        .rename("point_t").doc("a 2d point"))
    api_guard.publish("HtmlDemo", {"mk": lambda x, y: (x, y)},
                      {"mk": c.fn(c.number, c.number).doc("make a point")})
    html = api_guard.generate_docs_html("HtmlDemo")
    assert "<title>HtmlDemo</title>" in html
    assert "<h1>HtmlDemo</h1>" in html and "An html demo." in html
    # uncategorized value appears BEFORE the Shapes category header
    assert html.index("plain") < html.index('<h2 class="category">Shapes</h2>')
    assert '<p>shape helpers</p>' in html
    assert '<div class="type-name">point_t</div>' in html
    assert '<td class="field-name">x</td>' in html     # object field table
    assert '<td class="value-name">mk</td>' in html
    assert "make a point" in html
    # unknown module raises the library error, like the reference's
    # missing-table path
    from rho_contracts_ray.contracts.errors import ContractLibraryError
    with pytest.raises(ContractLibraryError):
        api_guard.generate_docs_html("NoSuchModule")
    # reset the latched category so later tests see the default
    _ast._CURRENT_CATEGORY[0] = False


def test_container_wrap_fuzz():
    """Random container contracts holding fn contracts + random member
    invocations vs the actual reference — byte-identical messages.  Covers
    hash/object/array/tuple nesting, optional fn fields, arg/result
    violations and arg-count failures that the hand-picked matrix above
    cannot enumerate."""
    import random

    if not specs.node_available():
        pytest.skip("node or reference not available")
    rng = random.Random(1234)
    fn_specs = [
        {"t": "fn"},
        {"t": "fn", "args": [NUM]},
        {"t": "fn", "args": [NUM, STR], "returns": NUM},
        {"t": "fn", "args": [{"t": "object", "fields": {"q": NUM}}]},
        {"t": "fn", "args": [NUM], "returns": STR},
    ]
    call_pools = [[], [1], [2.5, "a"], ["bad"], [{"q": 1}], [{"q": "no"}],
                  [1, "x"], [None], [1, 2, 3]]

    cases = []
    for i in range(120):
        fn_spec = dict(rng.choice(fn_specs))
        ret = rng.choice([1, "s", None, 2.5])
        shape = rng.choice(["hash", "object", "array", "tuple",
                            "obj_nested", "obj_opt"])
        if shape == "hash":
            ct = {"t": "hash", "value": fn_spec}
            val = {"k": {"__fn__": ret}}
            path = ["k"]
        elif shape == "object":
            ct = {"t": "object", "fields": {"x": STR, "cb": fn_spec}}
            val = {"x": "v", "cb": {"__fn__": ret}}
            path = ["cb"]
        elif shape == "array":
            ct = {"t": "array", "item": fn_spec}
            val = [{"__fn__": ret}, {"__fn__": ret}]
            path = [rng.randint(0, 1)]
        elif shape == "tuple":
            ct = {"t": "tuple", "cs": [NUM, fn_spec]}
            val = [7, {"__fn__": ret}]
            path = [1]
        elif shape == "obj_nested":
            ct = {"t": "object",
                  "fields": {"in": {"t": "hash", "value": fn_spec}}}
            val = {"in": {"z": {"__fn__": ret}}}
            path = ["in", "z"]
        else:  # optional fn field, present
            opt = dict(fn_spec)
            opt["optional"] = True
            ct = {"t": "object", "fields": {"cb": opt}}
            val = {"cb": {"__fn__": ret}}
            path = ["cb"]
        args = rng.choice(call_pools)
        cases.append({"id": f"wf{i}", "contract": ct, "value": val,
                      "invoke": {"path": path, "args": args},
                      "name": "theThing"})
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
        ok, msg = True, None
        try:
            _run_invoke(case["contract"], case["value"], case["invoke"])
        except RowContractError as e:
            ok, msg = False, e.violation.message
        if ok != ref["ok"] or (
                not ok and _normalize(msg) != _normalize(ref["message"])):
            mismatches += 1
            if first is None:
                first = (case, ref["message"], msg, ok, ref["ok"])
    assert mismatches == 0, first


def test_constructs_result_checks_instance_not_args():
    from rho_contracts_ray import c

    ok_contract = c.fun({"initial": c.number}) \
        .returns(c.isA(_ExampleImpl)) \
        .constructs({"inc": c.fn(c.number).returns(c.number)})
    Example = c.wrap(ok_contract, _ExampleImpl)
    inst = Example(3)          # must NOT trip on the args tuple
    assert inst.x == 3

    bad_contract = c.fun({"initial": c.number}) \
        .returns(c.pred(lambda inst: isinstance(inst.x, str),
                        name="x_is_str")) \
        .constructs({"inc": c.fn(c.number).returns(c.number)})
    Example2 = c.wrap(bad_contract, _ExampleImpl)
    with pytest.raises(RowContractError, match="x_is_str"):
        Example2(3)            # constructed instance violates .returns


def test_constructs_rejects_non_class():
    from rho_contracts_ray import c

    fc = c.fun({"i": c.number}).constructs({"inc": c.fn()})
    with pytest.raises(RowContractError, match="missing on the prototype"):
        c.wrap(fc, lambda i: i, "factory")

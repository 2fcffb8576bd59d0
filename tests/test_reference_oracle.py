"""Differential oracle: run the ACTUAL reference library (node, with a
minimal underscore shim) against the engine's row interpreter on the same
case matrix the mocha suite covers (reference src/contract.spec.js), and
require identical verdicts and identical error messages.

The matrix follows FIXTURES.md F3/F4: leaves, combinators, structural
contracts, optional-field semantics, strict/extend composition, deep
toContract promotion (the kidPark example at contract.spec.js:19-66).
"""

from __future__ import annotations

import re

import pytest

from rho_contracts_ray import check_verdict
from tests.oracle import specs
from tests.oracle.specs import NAN, UNDEF, INF, build_contract, date, decode_value

S = lambda **kw: kw  # spec literal


def _c(t, **kw):
    return {"t": t, **kw}


STRING = _c("string")
NUMBER = _c("number")
INTEGER = _c("integer")
BOOL = _c("bool")
DATE = _c("date")
ANY = _c("any")

CASES: list[tuple[str, dict, object, object]] = []  # (id, contract, value, name)


def case(id_, contract, value, name="theThing"):
    CASES.append((id_, contract, value, name))


# -- leaves (contract.spec.js:68-131, README type table) ---------------------
case("string_pass", STRING, "asd")
case("string_num", STRING, 6)
case("string_null", STRING, None)
case("string_undef", STRING, UNDEF)
case("string_noname", STRING, 6, None)
case("number_pass", NUMBER, 5)
case("number_nan", NUMBER, NAN)          # NaN IS a number (impl.js:331)
case("number_str", NUMBER, "x")
case("number_bool", NUMBER, True)        # booleans are not numbers
case("integer_int", INTEGER, 5)
case("integer_frac", INTEGER, 45.2)
case("integer_floatwhole", INTEGER, 5.0)
case("integer_str", INTEGER, "5")
case("integer_bool", INTEGER, True)
case("integer_null", INTEGER, None)
case("integer_nan", INTEGER, NAN)
case("integer_inf", INTEGER, INF)        # Math.floor(Inf)===Inf
case("bool_pass", BOOL, True)
case("bool_num", BOOL, 0)
case("date_pass", DATE, date("2020-01-02T03:04:05.678Z"))
case("date_str", DATE, "2020-01-02")
case("any_pass", ANY, 5)
case("any_null", ANY, None)
case("nothing_fail", _c("nothing"), 5)
case("falsy_false", _c("falsy"), False)
case("falsy_zero", _c("falsy"), 0)
case("falsy_empty", _c("falsy"), "")
case("falsy_nan", _c("falsy"), NAN)
case("falsy_null", _c("falsy"), None)
case("falsy_five", _c("falsy"), 5)
case("falsy_arr", _c("falsy"), [])       # [] is truthy in JS
case("truthy_五", _c("truthy"), 5)
case("truthy_zero", _c("truthy"), 0)
case("truthy_str", _c("truthy"), "a")
case("value_pass", _c("value", v=5), 5)
case("value_fail", _c("value", v=5), 6)
case("value_float", _c("value", v=5), 5.0)   # 5 === 5.0 in JS
case("value_str", _c("value", v=5), "5")
case("value_strval", _c("value", v="yes"), "yes")
case("oneof_pass", _c("oneOf", vs=["y", "n"]), "y")
case("oneof_fail", _c("oneOf", vs=["y", "n"]), "x")
case("oneof_null", _c("oneOf", vs=["y", "n"]), None)
case("oneof_mixed", _c("oneOf", vs=[5, "five"]), 5)
case("oneof_mixed2", _c("oneOf", vs=[5, "five"]), "five")
case("oneof_mixed3", _c("oneOf", vs=[5, "five"]), 6)
case("matches_pass", _c("matches", pattern="x+"), "xxx")
case("matches_fail", _c("matches", pattern="x+"), "---")
case("matches_null", _c("matches", pattern="x+"), None)  # no coercion (spec:178-181)
case("matches_num", _c("matches", pattern="x+"), 6)
case("matches_hex", _c("matches", pattern="^[0-9a-f]{40}$"), "a" * 40)
case("matches_hex_bad", _c("matches", pattern="^[0-9a-f]{40}$"), "ZZ")
case("rename_fail", _c("string", rename="myStr"), 6)

# -- optional (spec:355-370 semantics) ---------------------------------------
OPT_STR = _c("string", optional=True)
case("opt_null", OPT_STR, None)
case("opt_undef", OPT_STR, UNDEF)
case("opt_pass", OPT_STR, "a")
case("opt_fail", OPT_STR, 6)
case("opt_nan", _c("value", v=5, optional=True), NAN)   # NaN is NOT missing
case("opt_zero", _c("value", v=5, optional=True), 0)
case("opt_empty", _c("value", v=5, optional=True), "")

# -- and / or (spec:133-169) -------------------------------------------------
AND_SV = _c("and", cs=[STRING, _c("value", v="asd")])
case("and_pass", AND_SV, "asd")
case("and_fail1", AND_SV, 6)      # 1st branch fails
case("and_fail2", AND_SV, "x")    # 2nd branch fails -> .and(1) frame
case("sand_fail2", _c("silentAnd", cs=[STRING, _c("value", v="asd")]), "x")
OR_SV = _c("or", cs=[STRING, _c("value", v=6)])
case("or_pass1", OR_SV, "a")
case("or_pass2", OR_SV, 6)
case("or_fail", OR_SV, 7)
case("or_fail3", _c("or", cs=[STRING, NUMBER, BOOL]), None)

# -- array (spec:183-211) ----------------------------------------------------
ARR_N = _c("array", item=NUMBER)
case("arr_empty", ARR_N, [])
case("arr_pass", ARR_N, [1, 2, 3])
case("arr_fail0", ARR_N, ["x", 2])
case("arr_fail1", ARR_N, [10, "5"])
case("arr_nonarr", ARR_N, 5)
case("arr_null", ARR_N, None)
case("arr_nested", _c("array", item=ARR_N), [[1], [2, "x"]])
case("arr_float", ARR_N, [1.5, 2.5])

# -- tuple (spec:213-248) ----------------------------------------------------
TUP = _c("tuple", cs=[STRING, NUMBER])
case("tup_pass", TUP, ["a", 1])
case("tup_short", TUP, ["a"])
case("tup_extra", TUP, ["a", 1, True])   # extras pass
case("tup_badpos", TUP, ["a", "b"])
case("tup_badpos0", TUP, [1, 2])
TUPS = _c("tuple", cs=[STRING, NUMBER], strict=True)
case("tups_pass", TUPS, ["a", 1])
case("tups_extra", TUPS, ["a", 1, True])
case("tups_short", TUPS, ["a"])

# -- hash (spec:250-266) -----------------------------------------------------
HASH_S = _c("hash", value=STRING)
case("hash_pass", HASH_S, {"a": "x", "b": "y"})
case("hash_fail", HASH_S, {"a": "x", "d": 1})
case("hash_empty", HASH_S, {})
case("hash_nonobj", HASH_S, 5)
case("hash_bool", _c("hash", value=BOOL), {"a": True, "b": 1})

# -- object (spec:278-421) ---------------------------------------------------
OBJ_XN = _c("object", fields={"x": NUMBER})
case("obj_pass", OBJ_XN, {"x": 5})
case("obj_badfield", OBJ_XN, {"x": "a"})
case("obj_missing", OBJ_XN, {})
case("obj_nullfield", OBJ_XN, {"x": None})
case("obj_undeffield", OBJ_XN, {"x": UNDEF})
case("obj_extra_ok", OBJ_XN, {"x": 5, "y": 6})
case("obj_nonobj", OBJ_XN, 5)
case("obj_null", OBJ_XN, None)
OBJ_OPT = _c("object", fields={"x": _c("value", v=5, optional=True)})
case("objopt_absent", OBJ_OPT, {})
case("objopt_null", OBJ_OPT, {"x": None})
case("objopt_undef", OBJ_OPT, {"x": UNDEF})
case("objopt_pass", OBJ_OPT, {"x": 5})
case("objopt_fail", OBJ_OPT, {"x": 6})
case("objopt_nan", OBJ_OPT, {"x": NAN})   # NaN present -> checked -> fails
case("objopt_zero", OBJ_OPT, {"x": 0})
case("objopt_empty", OBJ_OPT, {"x": ""})
OBJ_NEST = _c("object", fields={"x": _c("object", fields={"y": NUMBER})})
case("objnest_pass", OBJ_NEST, {"x": {"y": 1}})
case("objnest_fail", OBJ_NEST, {"x": {"y": "a"}})   # path .x.y
case("objnest_missing", OBJ_NEST, {"x": {}})

# -- strict / extend (spec:423-521) ------------------------------------------
OBJ_STRICT = _c("object", fields={"x": NUMBER}, strict=True)
case("strict_pass", OBJ_STRICT, {"x": 1})
case("strict_extra1", OBJ_STRICT, {"x": 1, "z": 2})
case("strict_extra2", OBJ_STRICT, {"x": 1, "z": 2, "w": 3})
case("extend_strict", _c("object", fields={"x": NUMBER}, extend={"y": STRING},
                         strict=True), {"x": 1, "y": "a"})
case("strict_extend", _c("object", fields={"x": NUMBER}, strict=True,
                         extendAfterStrict={"y": STRING}), {"x": 1, "y": "a", "q": 0})

# -- toContract deep promotion (kidPark, spec:12-66) -------------------------
KIDPARK = {
    "name": "corner park",
    "acres": 0.1,
    "playunit": {
        "junglebars": True,
        "slides": 2,
        "ladders": [
            {"color": "red", "size": "large"},
            {"color": "blue", "size": "small"},
        ],
    },
}
KIDPARK_BAD = {
    "name": "corner park",
    "acres": 0.1,
    "playunit": {
        "junglebars": True,
        "slides": 2,
        "ladders": [
            {"color": "red", "size": "large"},
            {"color": "blue", "size": 0},
        ],
    },
}
TC_KIDPARK = _c("toContract", v={
    "name": "", "acres": 0, "playunit": {
        "junglebars": True, "slides": 0,
        "ladders": [{"color": "", "size": ""}],
    },
})
# toContract promotes scalars to value() — use fromExample for type-shaped
FE_KIDPARK = _c("fromExample", v=KIDPARK)
case("kidpark_pass", FE_KIDPARK, KIDPARK)
case("kidpark_bad", FE_KIDPARK, KIDPARK_BAD)   # path .playunit.ladders[1].size
case("tocontract_scalar_pass", _c("toContract", v=5), 5)
case("tocontract_scalar_fail", _c("toContract", v=5), 6)
case("tocontract_arr", _c("toContract", v=[{"a": 0}]), [{"a": 1}, {"a": "x"}])

# -- fromExample with ? keys (impl.js:744-748) -------------------------------
case("fromex_q", _c("fromExample", v={"a": 1, "?b": "x"}, q=True), {"a": 2})

# -- deep paths with arrays of objects ---------------------------------------
AOO = _c("array", item=_c("object", fields={"name": STRING, "n": NUMBER}))
case("aoo_pass", AOO, [{"name": "a", "n": 1}])
case("aoo_fail", AOO, [{"name": "a", "n": 1}, {"name": 2, "n": 1}])
case("aoo_missing", AOO, [{"n": 1}])

# -- or composite over structural branches -----------------------------------
case("or_struct", _c("or", cs=[STRING, _c("object", fields={"x": NUMBER})]),
     {"x": 1})

# -- `contract` meta-leaf (contract.impl.js:362-365, contract.js:283-287):
#    accepts contract instances, arrays, and non-objects (the
#    auto-promotable domain); plain objects, functions and dates fail
CONTRACT_LEAF = _c("contract")
case("contractleaf_instance", CONTRACT_LEAF, {"__contract__": STRING})
case("contractleaf_combinator", CONTRACT_LEAF,
     {"__contract__": _c("or", cs=[STRING, NUMBER])})
case("contractleaf_array", CONTRACT_LEAF, [1, 2])
case("contractleaf_number", CONTRACT_LEAF, 6)
case("contractleaf_string", CONTRACT_LEAF, "s")
case("contractleaf_null", CONTRACT_LEAF, None)
case("contractleaf_undef", CONTRACT_LEAF, UNDEF)
case("contractleaf_nan", CONTRACT_LEAF, NAN)
case("contractleaf_plain_object", CONTRACT_LEAF, {"x": 1})
case("contractleaf_function", CONTRACT_LEAF, {"__fn__": 1})
case("contractleaf_date", CONTRACT_LEAF, date("2020-01-02T03:04:05Z"))


def _normalize(msg: str) -> str:
    # Arrow has no `undefined`; both null and undefined are "missing"
    # (utils.js:20-22), so renderings unify on null.
    return msg.replace("undefined", "null") if msg else msg


@pytest.fixture(scope="module")
def oracle_results():
    if not specs.node_available():
        pytest.skip("node or reference not available")
    payload = [
        {"id": i, "contract": ct, "value": v, "name": n}
        for i, ct, v, n in CASES
    ]
    res = specs.run_reference(payload)
    return {r["id"]: r for r in res}


@pytest.mark.parametrize("case_id,contract_spec,value,name",
                         CASES, ids=[x[0] for x in CASES])
def test_reference_parity(case_id, contract_spec, value, name, oracle_results):
    ref = oracle_results[case_id]
    assert not (ref["message"] or "").startswith("BUILD_ERROR"), ref["message"]
    contract = build_contract(contract_spec)
    data = decode_value(value)
    ok, viol = check_verdict(contract, data, name)
    assert ok == ref["ok"], (
        f"verdict mismatch for {case_id}: engine={ok} reference={ref['ok']} "
        f"ref_msg={ref['message']!r}"
    )
    if not ok:
        assert _normalize(viol.message) == _normalize(ref["message"]), (
            f"message mismatch for {case_id}:\n"
            f"--- engine ---\n{viol.message}\n--- reference ---\n{ref['message']}"
        )
    # contract pretty-printing parity (toString drives `in contract:` lines)
    assert contract.to_string() == ref["tostring"], (
        f"toString mismatch: {contract.to_string()!r} vs {ref['tostring']!r}"
    )

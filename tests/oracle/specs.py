"""Shared contract-spec mini-language for the differential oracle.

A case is (id, contract_spec, encoded_value, name).  `runner.js` builds the
contract with the ACTUAL reference library and checks the value; this module
builds the equivalent engine contract and decodes the equivalent Python
value.  The pytest then compares verdicts and exact messages.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import shutil
import subprocess
from typing import Any

from rho_contracts_ray import c
from rho_contracts_ray.contracts import ast

ORACLE_DIR = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference/index.js"


def node_available() -> bool:
    return shutil.which("node") is not None and os.path.exists(REFERENCE)


# -- value encoding ----------------------------------------------------------

NAN = {"__nan__": 1}
UNDEF = {"__undef__": 1}
INF = {"__inf__": 1}
NEG_INF = {"__inf__": -1}


def date(iso: str) -> dict:
    return {"__date__": iso}


def decode_value(v: Any) -> Any:
    """JSON-encoded case value -> Python value (mirror of runner.js)."""
    if v is None or not isinstance(v, (dict, list)):
        return v
    if isinstance(v, list):
        return [decode_value(x) for x in v]
    if "__nan__" in v:
        return float("nan")
    if "__undef__" in v:
        return None  # Arrow world: undefined == null == missing
    if "__inf__" in v:
        return math.inf if v["__inf__"] > 0 else -math.inf
    if "__date__" in v:
        s = v["__date__"].replace("Z", "+00:00")
        return dt.datetime.fromisoformat(s).replace(tzinfo=None)
    if "__fn_this__" in v:
        field = v["__fn_this__"]

        def _stub_this(this, *args, _f=field):
            # JS property access: missing key -> undefined (None), like
            # `this.x` on an object without x
            if isinstance(this, dict):
                return this.get(_f)
            return getattr(this, _f, None)

        _stub_this.__name__ = ""  # JS side is an anonymous function
        return _stub_this
    if "__contract__" in v:
        return build_contract(v["__contract__"])
    if "__fn__" in v:
        ret = decode_value(v["__fn__"])

        def _stub(*args, _r=ret):
            return _r

        _stub.__name__ = ""  # JS side is an anonymous function
        return _stub
    return {k: decode_value(x) for k, x in v.items()}


# -- contract building (mirror of runner.js buildContract) -------------------


def build_contract(spec: dict) -> ast.Contract:
    t = spec["t"]
    if t == "any":
        base = c.any
    elif t == "nothing":
        base = c.nothing
    elif t == "falsy":
        base = c.falsy
    elif t == "truthy":
        base = c.truthy
    elif t == "string":
        base = c.string
    elif t == "number":
        base = c.number
    elif t == "integer":
        base = c.integer
    elif t == "bool":
        base = c.bool
    elif t == "date":
        base = c.date
    elif t == "contract":
        base = c.contract
    elif t == "value":
        base = c.value(decode_value(spec["v"]))
    elif t == "oneOf":
        base = c.oneOf(*[decode_value(v) for v in spec["vs"]])
    elif t == "matches":
        base = c.matches(spec["pattern"], spec.get("flags", ""))
    elif t == "and":
        base = c.and_(*[build_contract(s) for s in spec["cs"]])
    elif t == "silentAnd":
        base = c.silentAnd(*[build_contract(s) for s in spec["cs"]])
    elif t == "or":
        base = c.or_(*[build_contract(s) for s in spec["cs"]])
    elif t == "array":
        base = c.array(build_contract(spec["item"]))
    elif t == "tuple":
        base = c.tuple(*[build_contract(s) for s in spec["cs"]])
        if spec.get("strict"):
            base = base.strict()
    elif t == "hash":
        base = c.hash(build_contract(spec["value"]))
    elif t == "object":
        fields = {k: build_contract(s) for k, s in (spec.get("fields") or {}).items()}
        base = c.object(fields)
        if spec.get("extend"):
            base = base.extend({k: build_contract(s) for k, s in spec["extend"].items()})
        if spec.get("strict"):
            base = base.strict()
        if spec.get("extendAfterStrict"):
            base = base.extend(
                {k: build_contract(s) for k, s in spec["extendAfterStrict"].items()}
            )
    elif t == "toContract":
        base = c.toContract(decode_value(spec["v"]))
    elif t == "fromExample":
        base = c.fromExample(decode_value(spec["v"]), bool(spec.get("q")))
    elif t in ("fn", "fun", "method"):
        from rho_contracts_ray.functions import api_guard

        if t == "fn":
            base = api_guard.fn(*[build_contract(s)
                                  for s in spec.get("args", [])])
        elif t == "fun":
            base = api_guard.fun(*[{nm: build_contract(s)}
                                   for nm, s in spec.get("named", [])])
        else:
            base = api_guard.method(
                build_contract(spec["ths"]),
                *[{nm: build_contract(s)} for nm, s in spec.get("named", [])])
        if spec.get("returns"):
            base = base.returns(build_contract(spec["returns"]))
        if spec.get("extraArgs"):
            base = base.extraArgs(build_contract(spec["extraArgs"]))
        if spec.get("thisArg"):
            base = base.thisArg(build_contract(spec["thisArg"]))
    else:
        raise ValueError(f"unknown spec {t}")
    if spec.get("rename"):
        base = base.rename(spec["rename"])
    if spec.get("optional"):
        base = base.optional()
    return base


# -- running the reference ---------------------------------------------------


def run_reference(cases: list[dict]) -> list[dict]:
    env = dict(os.environ)
    env["NODE_PATH"] = os.path.join(ORACLE_DIR, "node_modules")
    proc = subprocess.run(
        ["node", os.path.join(ORACLE_DIR, "runner.js")],
        input=json.dumps(cases).encode(),
        capture_output=True,
        env=env,
        timeout=120,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"oracle runner failed: {proc.stderr.decode()[:2000]}")
    return json.loads(proc.stdout.decode())

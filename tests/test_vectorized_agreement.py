"""The compiler invariant: for every row, the vectorized Arrow mask equals
the row interpreter's verdict (see compile.py docstring).  Covers every
node type across every relevant Arrow column type, including nested."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pyarrow as pa
import pytest

from rho_contracts_ray import c, check_verdict
from rho_contracts_ray.contracts import compile as cc
from rho_contracts_ray.validate import arrow_value_to_js

NAN = float("nan")
TS = dt.datetime(2020, 1, 2, 3, 4, 5)


def agree(contract, values, arrow_type=None):
    col = pa.array(values, type=arrow_type)
    mask = cc.eval_mask(contract, col)
    pyvals = [arrow_value_to_js(v, col.type) for v in col.to_pylist()]
    for i, v in enumerate(pyvals):
        expected, _ = check_verdict(contract, v)
        assert mask[i] == expected, (
            f"row {i}: value={v!r} type={col.type} mask={mask[i]} "
            f"interp={expected} contract={contract.to_string()}"
        )


STR_VALS = ["asd", "", None, "x" * 50]
INT_VALS = [0, 5, -3, None, 2**40]
FLOAT_VALS = [0.0, 5.0, 45.2, -1.5, NAN, math.inf, -math.inf, None]
BOOL_VALS = [True, False, None]
TS_VALS = [TS, None]

LEAVES = [
    c.any, c.nothing, c.falsy, c.truthy, c.string, c.number, c.integer,
    c.bool, c.date, c.value(5), c.value("asd"), c.value(0), c.value(None),
    c.oneOf("y", "n"), c.oneOf(5, "five", None), c.matches("x+"),
    c.matches("^[0-9a-f]{4}$"), c.optional(c.string), c.optional(c.number),
    c.and_(c.number, c.integer), c.or_(c.string, c.number),
    c.or_(c.value(0), c.value("")), c.silentAnd(c.truthy, c.number),
    c.pred(lambda v: isinstance(v, (int, float)) and not isinstance(v, bool) and v > 2),
    c.contract,   # meta-leaf: non-objects/arrays pass, Dates/objects fail
]

COLUMNS = [
    (STR_VALS, pa.string()),
    (STR_VALS, pa.large_string()),
    (INT_VALS, pa.int64()),
    ([0, 5, 200, None], pa.uint8()),
    (FLOAT_VALS, pa.float64()),
    ([0.5, 1.0, None], pa.float32()),
    (BOOL_VALS, pa.bool_()),
    (TS_VALS, pa.timestamp("us")),
    ([None, None], pa.null()),
]


@pytest.mark.parametrize("ci", range(len(LEAVES)), ids=lambda i: LEAVES[i].to_string())
@pytest.mark.parametrize("vi", range(len(COLUMNS)), ids=lambda i: str(COLUMNS[i][1]))
def test_leaf_agreement(ci, vi):
    vals, t = COLUMNS[vi]
    agree(LEAVES[ci], vals, t)


LIST_VALS = [[], [1, 2], [1, None], None, [0], list(range(10))]
NESTED_LIST = [[[1], [2, 3]], [], None, [[]], [[None]]]


@pytest.mark.parametrize("contract", [
    c.array(c.number), c.array(c.integer), c.array(c.optional(c.number)),
    c.array(c.truthy), c.tuple(c.number, c.number),
    c.tuple(c.number).strict(), c.optional(c.array(c.number)),
    c.string, c.falsy, c.truthy, c.contract,
], ids=lambda x: x.to_string())
def test_list_agreement(contract):
    agree(contract, LIST_VALS, pa.list_(pa.int64()))
    agree(contract, LIST_VALS, pa.large_list(pa.int64()))


def test_nested_list_agreement():
    agree(c.array(c.array(c.number)), NESTED_LIST, pa.list_(pa.list_(pa.int64())))
    agree(c.array(c.array(c.optional(c.number))), NESTED_LIST,
          pa.list_(pa.list_(pa.int64())))


STRUCT_T = pa.struct([("x", pa.int64()), ("y", pa.string())])
STRUCT_VALS = [
    {"x": 1, "y": "a"}, {"x": None, "y": "b"}, {"x": 2, "y": None}, None,
]


@pytest.mark.parametrize("contract", [
    c.object({"x": c.number, "y": c.string}),
    c.object({"x": c.number, "y": c.optional(c.string)}),
    c.object({"x": c.optional(c.number)}),
    c.object({"z": c.number}),
    c.object({"z": c.optional(c.number)}),
    c.object({"x": c.falsy}),
    c.object({"x": c.number}).strict(),
    c.object({"x": c.number, "y": c.string}).strict(),
    c.hash(c.number),
    c.optional(c.object({"x": c.number, "y": c.string})),
    c.string, c.contract,
], ids=lambda x: x.to_string())
def test_struct_agreement(contract):
    agree(contract, STRUCT_VALS, STRUCT_T)


MAP_T = pa.map_(pa.string(), pa.string())
MAP_VALS = [[("a", "x")], [], [("k", None)], None, [("a", "x"), ("b", "y")]]


@pytest.mark.parametrize("contract", [
    c.hash(c.string), c.hash(c.optional(c.string)), c.hash(c.truthy),
    c.object({}), c.string, c.contract,
], ids=lambda x: x.to_string())
def test_map_agreement(contract):
    agree(contract, MAP_VALS, MAP_T)


def test_deep_struct_agreement():
    t = pa.struct([
        ("name", pa.string()),
        ("playunit", pa.struct([
            ("slides", pa.int64()),
            ("ladders", pa.list_(pa.struct([("color", pa.string()),
                                            ("size", pa.string())]))),
        ])),
    ])
    vals = [
        {"name": "a", "playunit": {"slides": 2,
                                   "ladders": [{"color": "r", "size": "l"}]}},
        {"name": "a", "playunit": {"slides": 2,
                                   "ladders": [{"color": "r", "size": None}]}},
        {"name": None, "playunit": None},
        None,
    ]
    contract = c.object({
        "name": c.string,
        "playunit": c.object({
            "slides": c.integer,
            "ladders": c.array(c.object({"color": c.string, "size": c.string})),
        }),
    })
    agree(contract, vals, t)


def test_cyclic_unrolls_to_schema_depth():
    # recursive contract over a finite nested schema (README animal example)
    person = c.cyclic()
    person.close_cycle(c.object({
        "name": c.string,
        "child": c.optional(person),
    }))
    t = pa.struct([("name", pa.string()),
                   ("child", pa.struct([("name", pa.string())]))])
    vals = [
        {"name": "a", "child": {"name": "b"}},
        {"name": "a", "child": None},
        {"name": None, "child": None},
    ]
    agree(person, vals, t)


def test_dictionary_encoded_column():
    col = pa.array(["py", "js", "py", None]).dictionary_encode()
    mask = cc.eval_mask(c.oneOf("py", "js"), col)
    assert mask.tolist() == [True, True, True, False]


def test_vectorized_pred():
    import pyarrow.compute as pc
    p = c.pred(lambda v: v is not None and v > 10,
               vectorized=lambda col: pc.greater(col, 10))
    agree(p, [5, 20, None, 11], pa.int64())

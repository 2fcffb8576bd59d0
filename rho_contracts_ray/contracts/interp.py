"""Row-at-a-time contract interpreter.

A faithful re-expression of the reference's recursive checker
(reference src/contract.impl.js:30-63 `checkWContext`) over Python values.
The engine's hot path is the vectorized Arrow compiler (`compile.py`); this
interpreter exists for two reasons:

  1. message parity — it is invoked ONLY on rows the vectorized kernel
     already marked as failing (sparse), to produce the exact
     ContractError wording the mocha suite pins;
  2. testability — every data-applicable mocha case is asserted against
     this interpreter AND cross-checked against the vectorized verdicts.

Throws on the first failure per value, like the reference
(contract.impl.js:108-111).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

from . import ast, jsval
from .errors import (
    FRAME_SILENT,
    ContractLibraryError,
    Frame,
    MessageBuilder,
    RowContractError,
    Violation,
    frame_and,
    frame_array_item,
    frame_hash_item,
    frame_object_field,
    frame_tuple_item,
)


class _Context:
    """Per-check mutable context (contract.impl.js:102-115)."""

    __slots__ = ("thing_name", "data", "stack", "contract", "wrapping",
                 "blame_me", "is_function_contract", "fail")

    def __init__(self, thing_name, data, contract, fail, wrapping=False,
                 blame_me=True, is_function_contract=False):
        self.thing_name = thing_name
        self.data = data
        self.stack: list[Frame] = []
        self.contract = contract
        self.wrapping = wrapping
        self.blame_me = blame_me
        self.is_function_contract = is_function_contract
        self.fail = fail


def _path_of(stack: list[Frame]) -> str:
    return "".join(f.short for f in stack if not f.silent)


def _mk_violation(ctx: _Context, mb: MessageBuilder, *, expected=None, got=None,
                  contract_name="") -> Violation:
    return Violation(
        message=mb.message,
        expected=expected,
        got=got,
        path=_path_of(ctx.stack),
        contract_name=contract_name,
        blame=(f"check on `{ctx.thing_name}` failed:" if ctx.thing_name else ""),
    )


def _fail_expected(ctx: _Context, contract: ast.Contract, data: Any,
                   full: bool = True) -> None:
    """`context.fail(ContractError(ctx).expected(name, data)
    .fullContractAndValue())` — contract.impl.js:34-40."""
    mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=ctx.wrapping,
                       blame_me=ctx.blame_me,
                       is_function_contract=ctx.is_function_contract).init()
    mb.expected(contract.contract_name, data)
    if full:
        mb.full_contract(ctx.stack, ctx.contract.to_string())
        mb.full_value(ctx.data, bool(ctx.stack))
    ctx.fail(_mk_violation(ctx, mb, expected=contract.contract_name,
                           got=jsval.inspect(data),
                           contract_name=contract.contract_name))


def first_checker(contract: ast.Contract, data: Any) -> bool:
    """The shallow type guard of each node (contract.impl.js:156-158 default;
    per-node overrides cited on each branch)."""
    t = type(contract)
    if t is ast.AnyC:
        return True
    if t is ast.NothingC:
        return False  # contract.impl.js:289-292
    if t is ast.PredC:
        return jsval.is_truthy(contract.fn(data))  # :284-287 (JS truthiness)
    if t is ast.FalsyC:
        return jsval.is_falsy(data)  # :298-301
    if t is ast.TruthyC:
        return jsval.is_truthy(data)  # :303-306
    if t is ast.OneOfC or t is ast.ValueC:
        return any(jsval.strict_eq(data, v) for v in contract.values)  # :308-326
    if t is ast.StringC:
        return jsval.is_string(data)  # :328
    if t is ast.NumberC:
        return jsval.is_number(data)  # :331 (NaN passes)
    if t is ast.IntegerC:
        return jsval.is_integerlike(data)  # :334-337
    if t is ast.BoolC:
        return jsval.is_bool(data)  # :339
    if t is ast.DateC:
        return jsval.is_date(data)  # :345
    if t is ast.MatchesC:
        return jsval.is_string(data) and bool(contract.compiled.search(data))  # :412-418
    if t is ast.ArrayC or t is ast.TupleC:
        return jsval.is_array(data)  # :521, :547
    if t is ast.HashC:
        return jsval.is_object(data) and not isinstance(data, ast.Contract)  # :612-614
    if t is ast.ObjectC:
        return jsval.is_object(data)  # :649
    if t is ast.RegexpC:
        return isinstance(data, re.Pattern)  # :342
    if t is ast.AnyFunctionC:
        return callable(data)  # :348
    if t is ast.IsAC:
        return isinstance(data, contract.cls)  # :351-357
    if t is ast.ContractLeafC:
        # contract instance, array, or non-object (impl.js:362-365);
        # lodash _.isObject counts dicts AND functions, so both fail
        return (isinstance(data, ast.Contract) or jsval.is_array(data)
                or not (jsval.is_object(data) or callable(data)))
    if t is ast.CyclicC:
        return first_checker(contract.resolved(), data)
    if t in (ast.AndC, ast.OrC):
        return True  # combinators defer to nestedChecker
    if getattr(contract, "is_function_contract", False):
        return callable(data)  # fn/fun/method: firstChecker _.isFunction
    return True


def _field_get(data: Any, field: str) -> Any:
    if isinstance(data, dict):
        return data.get(field, jsval.MISSING)
    return jsval.MISSING  # JS `arr.someName` is undefined


def _nested_safe_in_js(contract: ast.Contract, data: Any) -> bool:
    """After a non-throwing fail (or-collection mode) the reference STILL
    runs nestedChecker (contract.impl.js:34-49).  On mismatched data some
    structural checkers then CRASH with a raw TypeError (`data.forEach is
    not a function`, `null[f]`…) — a latent reference bug we do not
    reproduce.  This predicate marks the paths that do NOT crash in JS, so
    collection mode matches the reference exactly on every non-crash
    input."""
    t = type(contract)
    if t is ast.ArrayC:
        return jsval.is_array(data)  # forEach exists only on arrays
    if t is ast.TupleC:
        return jsval.is_array(data) or isinstance(data, str)  # .length/.slice
    if t is ast.ObjectC:
        return not jsval.is_missing(data)  # null[f] throws
    return True


def check_w_context(contract: ast.Contract, data: Any, ctx: _Context) -> None:
    """contract.impl.js:30-63."""
    if isinstance(contract, ast.CyclicC):
        contract = contract.resolved()
    if contract.is_optional and jsval.is_missing(data):
        return
    if not first_checker(contract, data):
        _fail_expected(ctx, contract, data)
        # fail() raised unless an or-collector swallowed it; the reference
        # then continues into nestedChecker (collecting more failures) on
        # every path that doesn't crash in JS
        if not _nested_safe_in_js(contract, data):
            return

    def nxt(next_contract: ast.Contract, next_v: Any, frame: Frame) -> None:
        # the push/recurse/pop discipline at contract.impl.js:49-61
        if not frame.silent:
            ctx.stack.append(frame)
        try:
            check_w_context(ast.auto_to_contract(next_contract), next_v, ctx)
        finally:
            if not frame.silent:
                ctx.stack.pop()

    _nested_checker(contract, data, nxt, ctx)


def _nested_checker(contract, data, nxt, ctx: _Context) -> None:
    t = type(contract)

    if t is ast.AndC:
        # contract.impl.js:377-410
        for i, c in enumerate(contract.contracts):
            nxt(c, data, FRAME_SILENT if contract.silent else frame_and(i))

    elif t is ast.OrC:
        # contract.impl.js:434-473 — try each, collect failures, compose.
        # `_.union` identity-dedupes the branch list (shared singletons like
        # c.integer appear once).
        seen_ids = set()
        branches = []
        for c in contract.contracts:
            if id(c) not in seen_ids:
                seen_ids.add(id(c))
                branches.append(c)
        exceptions: list[tuple[ast.Contract, Violation]] = []
        success = False
        old_fail = ctx.fail
        for c in branches:
            if success:
                break
            failed = [False]

            def collect(v, _failed=failed):
                _failed[0] = True
                exceptions.append((c, v))

            ctx.fail = collect
            try:
                nxt(c, data, FRAME_SILENT)
            finally:
                ctx.fail = old_fail
            if not failed[0]:
                success = True
        if not success:
            lines = "\n".join(f" - {c.to_string()}" for c in branches)
            fails = "\n\n".join(
                f"[{i + 1}] --\n{c.to_string()}: {v.message}"
                for i, (c, v) in enumerate(exceptions)
            )
            msg = (
                f"none of the contracts passed:\n{lines}\n\n"
                f"The failures were:\n{fails}\n"
            )
            mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=ctx.wrapping,
                       blame_me=ctx.blame_me,
                       is_function_contract=ctx.is_function_contract).init(msg)
            mb.full_contract(ctx.stack, ctx.contract.to_string())
            mb.full_value(ctx.data, bool(ctx.stack))
            ctx.fail(_mk_violation(ctx, mb, got=jsval.inspect(data),
                                   contract_name="or"))

    elif t is ast.ArrayC:
        # contract.impl.js:522-527
        for i, item in enumerate(data):
            nxt(contract.item, item, frame_array_item(i))

    elif t is ast.TupleC:
        # contract.impl.js:548-598; strict length check runs FIRST (:579-588)
        # and neither fail returns — in or-collection mode the reference
        # continues into the positional checks (zip pads with undefined)
        n = len(contract.contracts)
        if contract.is_strict and len(data) != n:
            mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=ctx.wrapping,
                       blame_me=ctx.blame_me,
                       is_function_contract=ctx.is_function_contract).init()
            mb.expected(f"tuple of exactly size {n}", data)
            mb.full_contract(ctx.stack, ctx.contract.to_string())
            mb.full_value(ctx.data, bool(ctx.stack))
            ctx.fail(_mk_violation(ctx, mb, expected=f"tuple of exactly size {n}",
                                   got=jsval.inspect(data), contract_name="tuple.strict"))
        if len(data) < n:
            # NOTE: min-length error has no fullContractAndValue (:550-557)
            mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=ctx.wrapping,
                       blame_me=ctx.blame_me,
                       is_function_contract=ctx.is_function_contract).init()
            mb.expected(f"tuple of size {n}", data)
            ctx.fail(_mk_violation(ctx, mb, expected=f"tuple of size {n}",
                                   got=jsval.inspect(data), contract_name="tuple"))
        for i, c in enumerate(contract.contracts):
            v = data[i] if i < len(data) else jsval.MISSING
            nxt(c, v, frame_tuple_item(i))

    elif t is ast.HashC:
        # contract.impl.js:615-620 (underscore's each also iterates
        # array-likes — strings included — by index)
        if isinstance(data, dict):
            for k in jsval.js_key_order(data.keys()):
                nxt(contract.value_contract, data[k], frame_hash_item(k))
        elif isinstance(data, (list, tuple, str)):
            for i, v in enumerate(data):
                nxt(contract.value_contract, v, frame_hash_item(str(i)))

    elif t is ast.ObjectC:
        # strict extra-field check first (contract.impl.js:695-711).  After
        # a collected (non-throwing) fail the reference CONTINUES into the
        # field checks — no early returns anywhere in this branch.
        if contract.is_strict:
            keys = list(data.keys()) if isinstance(data, dict) else [
                str(i) for i in range(len(data))
            ] if isinstance(data, (list, tuple)) else []
            extra = [k for k in keys if k not in contract.fields]
            if extra:
                extra_str = ", ".join(f"`{k}`" for k in extra)
                word = "field " if len(extra) == 1 else "fields "
                msg = f"Found the extra {word}{extra_str} in {jsval.inspect(data)}\n"
                mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=ctx.wrapping,
                       blame_me=ctx.blame_me,
                       is_function_contract=ctx.is_function_contract).init(msg)
                mb.full_contract(ctx.stack, ctx.contract.to_string())
                mb.full_value(ctx.data, bool(ctx.stack))
                ctx.fail(_mk_violation(ctx, mb, got=jsval.inspect(data),
                                       contract_name="object.strict"))
        # field presence + recursion (contract.impl.js:653-664)
        for field_name, c in contract.fields.items():
            v = _field_get(data, field_name)
            if not c.is_optional and jsval.is_missing(v):
                msg = f"Field `{field_name}` required, got {jsval.inspect(data)}"
                mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=ctx.wrapping,
                       blame_me=ctx.blame_me,
                       is_function_contract=ctx.is_function_contract).init(msg)
                mb.full_contract(ctx.stack, ctx.contract.to_string())
                mb.full_value(ctx.data, bool(ctx.stack))
                ctx.fail(_mk_violation(ctx, mb, got=jsval.inspect(data),
                                       contract_name=contract.contract_name))
            if not jsval.is_missing(v):
                nxt(c, v, frame_object_field(field_name))

    # leaves: nothing nested to do


def check_row(contract, data: Any, name: Optional[str] = None) -> Any:
    """`c.check(contract, data, name)` — contract.impl.js:265-269.
    Returns data unchanged; raises RowContractError on the first failure.
    Refuses wrapping (function) contracts with the reference's wording
    (contract.impl.js:41-47)."""
    contract = ast.auto_to_contract(contract)
    if contract.needs_wrapping:
        raise ContractLibraryError(
            "check",
            "This contract requires wrapping. Call wrap() instead and "
            "retain the wrapped result.")

    def fail(v: Violation):
        raise RowContractError(v)

    ctx = _Context(name, data, contract, fail)
    check_w_context(contract, data, ctx)
    return data


def check_verdict(contract, data: Any, name: Optional[str] = None):
    """(ok, Violation|None) — non-throwing wrapper."""
    try:
        check_row(contract, data, name)
        return True, None
    except RowContractError as e:
        return False, e.violation

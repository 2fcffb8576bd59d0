"""Function contracts — the reference's "higher-order" half
(reference src/function-contracts.js), re-expressed as a Python decorator
surface used to guard the engine's own API (SURVEY.md §2.4: Arrow tables
cannot hold callables, so these are NOT table operators).

What carries over 1:1:
  * argument-count checks and their messages (function-contracts.js:28-67);
  * the blame algebra — blame flips for argument checks (caller's fault,
    "broke the contract on `f()`") vs result checks ("`f()` broke its
    contract") (function-contracts.js:91-152);
  * `.arg(i)` / named-argument path frames and `for the return value of
    the call.` long frames (contract-errors.js:12-23);
  * check() refuses wrapping contracts with the reference's exact wording
    (contract.impl.js:41-47).

Out of scope (documented, not built): `constructs` prototype surgery and
`this`-contract wrapping — Python methods guard `self` via a plain
argument contract instead.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

from ..contracts import ast, interp, jsval
from ..contracts.errors import (
    ContractLibraryError, Frame, FRAME_RESULT, MessageBuilder,
    RowContractError, Violation, frame_argument,
)

CHECK_NEEDS_WRAPPING_MSG = (
    "This contract requires wrapping. Call wrap() instead and retain the "
    "wrapped result."
)


class FnContract(ast.Contract):
    """fn(...argContracts) / fun({name: c}, ...) — a contract on a callable."""

    def __init__(self, *argument_contracts, name: str = "fn",
                 arg_names: Optional[list] = None):
        super().__init__(name)
        self.argument_contracts = tuple(
            ast.auto_to_contract(c) for c in argument_contracts)
        self.arg_names = list(arg_names) if arg_names else [None] * len(
            self.argument_contracts)
        self.result_contract: ast.Contract = ast.AnyC()
        self.extra_argument_contract: Optional[ast.Contract] = None
        # formal check: no required argument right of an optional one
        # (function-contracts.js:13-26)
        options_only = False
        for i, c in enumerate(self.argument_contracts):
            if options_only and not c.is_optional:
                raise ContractLibraryError(
                    "fun",
                    f"The non-optional {i}th arguments cannot follow an "
                    f"optional arguments.")
            options_only = options_only or c.is_optional

    @property
    def needs_wrapping(self) -> bool:
        return True

    def returns(self, c) -> "FnContract":
        return self._clone(result_contract=ast.auto_to_contract(c))

    def extraArgs(self, c=None) -> "FnContract":
        return self._clone(
            extra_argument_contract=ast.auto_to_contract(c)
            if c is not None else ast.AnyC())

    extra_args = extraArgs

    def to_string(self) -> str:
        # function-contracts.js:359-366
        args = []
        for nm, c in zip(self.arg_names, self.argument_contracts):
            if nm:
                args.append(f"{{ {nm}: {c.to_string()} }}")
            else:
                args.append(c.to_string())
        extra = (f"...{self.extra_argument_contract.to_string()}"
                 if self.extra_argument_contract else "")
        return (f"c.{self.contract_name}({', '.join(args)}{extra}"
                f" -> {self.result_contract.to_string()})")


def fn(*argument_contracts) -> FnContract:
    """Positional argument contracts (function-contracts.js:370-373)."""
    return FnContract(*argument_contracts, name="fn")


def fun(*arg_specs) -> FnContract:
    """Named-argument contracts: fun({'x': c.number}, {'y': c.string})
    (function-contracts.js:375-435, incl. its exactly-one-key checks)."""
    names, contracts = [], []
    for i, spec in enumerate(arg_specs):
        if isinstance(spec, ast.Contract):
            raise ContractLibraryError(
                "fun",
                f"expected a one-field object specifying the name and the "
                f"contract of the {jsval.ith(i)} argument, but got a "
                f"contract {spec.to_string()}")
        if not isinstance(spec, dict):
            raise ContractLibraryError(
                "fun",
                f"expected an object with exactly one field to specify the "
                f"name of the {jsval.ith(i)} argument, but got "
                f"{jsval.inspect(spec)}")
        if len(spec) != 1:
            raise ContractLibraryError(
                "fun",
                f"expected exactly one key to specify the name of the "
                f"{jsval.ith(i)} arguments, but got {jsval.inspect(len(spec))}")
        ((nm, c),) = spec.items()
        names.append(nm)
        contracts.append(c)
    out = FnContract(*contracts, name="fun", arg_names=names)
    return out


class _WrapContext:
    def __init__(self, thing_name, contract):
        self.thing_name = thing_name
        self.blame_me = True
        self.stack: list[Frame] = []
        self.contract = contract


def _fail(ctx: _WrapContext, msg: Optional[str]) -> None:
    """Arg-count failure: `ContractError(context, msg).fullContract()` —
    note NO fullValue (the context data is the function itself, which the
    reference never prints)."""
    mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=True,
                        blame_me=ctx.blame_me, is_function_contract=True)
    mb.init(msg)
    mb.full_contract(ctx.stack, ctx.contract.to_string())
    raise RowContractError(Violation(
        message=mb.message, expected=None, got=None,
        path="".join(f.short for f in ctx.stack if not f.silent),
        contract_name=ctx.contract.contract_name,
        blame=(mb.message.splitlines() or [""])[0]))


def _check_argument_count(fc: FnContract, n_actual: int,
                          ctx: _WrapContext) -> None:
    # function-contracts.js:28-67 (messages verbatim)
    n_optional = sum(1 for c in fc.argument_contracts if c.is_optional)
    n_required = len(fc.argument_contracts) - n_optional
    if n_optional == 0 and fc.extra_argument_contract is None:
        if n_actual != n_required:
            _fail(ctx, f"Wrong number of arguments, expected {n_required} "
                       f"but got {n_actual}")
    elif n_actual < n_required:
        _fail(ctx, f"Too few arguments, expected at least {n_required} but "
                   f"got {n_actual}")
    elif fc.extra_argument_contract is None and \
            n_actual > n_required + n_optional:
        _fail(ctx, f"Too many arguments, expected at most "
                   f"{n_required + n_optional} but got {n_actual}")


def _check_value(contract: ast.Contract, value: Any, ctx: _WrapContext,
                 frame: Frame) -> None:
    """Run the row interpreter with a context seeded with the call-site
    frame and wrap-mode blame — failures carry the reference's exact frames
    (`.arg(0).x` etc.).  The context `data` is the wrapped FUNCTION, which
    the reference never renders (contract-errors.js:186)."""

    def fail(v: Violation):
        raise RowContractError(v)

    ictx = interp._Context(ctx.thing_name, _the_function_marker, ctx.contract,
                           fail, wrapping=True, blame_me=ctx.blame_me,
                           is_function_contract=True)
    ictx.stack = list(ctx.stack) + [frame]
    interp.check_w_context(ast.auto_to_contract(contract), value, ictx)


def _the_function_marker():  # callable sentinel: full_value always skips it
    raise AssertionError("never called")


def wrap(contract, f: Callable, name: Optional[str] = None) -> Callable:
    """`c.wrap(fnContract, f)` — returns a guarded callable that validates
    arguments (blaming the caller) and the result (blaming `f`) on every
    call (function-contracts.js:79-160)."""
    fc = contract
    if not isinstance(fc, FnContract):
        # plain data contract: eager check, return the value unchanged
        interp.check_row(fc, f, name)
        return f
    thing = name or getattr(f, "__name__", None)

    @functools.wraps(f)
    def guarded(*args):
        ctx = _WrapContext(thing, fc)
        ctx.blame_me = False  # argument errors blame the caller
        _check_argument_count(fc, len(args), ctx)
        for i, (c, nm) in enumerate(zip(fc.argument_contracts, fc.arg_names)):
            if i < len(args):
                _check_value(c, args[i], ctx, frame_argument(nm if nm else i))
            elif not c.is_optional:
                _check_value(c, None, ctx, frame_argument(nm if nm else i))
        if fc.extra_argument_contract is not None:
            extras = list(args[len(fc.argument_contracts):])
            from ..contracts.errors import Frame as _F
            _check_value(fc.extra_argument_contract, extras, ctx,
                         _F(".extraArguments",
                            "for the extra argument array of the call"))
        result = f(*args)
        ctx.blame_me = True  # result errors blame the function
        _check_value(fc.result_contract, result, ctx, FRAME_RESULT)
        return result

    guarded.__contract__ = fc
    return guarded


def contract_fn(*argument_contracts, returns=None, name=None):
    """Decorator sugar: @contract_fn(c.number, c.number, returns=c.number)."""
    fc = fn(*argument_contracts)
    if returns is not None:
        fc = fc.returns(returns)

    def deco(f):
        return wrap(fc, f, name)

    return deco


# -- module publication (contract.impl.js:825-846) ---------------------------

documentation_table: dict = {}


def publish(module_name: Optional[str], impl: dict, contracts: dict,
            additional_exports: Optional[dict] = None) -> dict:
    """Wrap each member of `impl` with its contract; record docs.  Raises
    the reference's error when a contracted member is missing
    (contract.impl.js:825-841)."""
    key = module_name if module_name is not None else False
    entry = documentation_table.setdefault(
        key, {"doc": [], "categories": [], "types": {}, "values": {}})
    result = dict(additional_exports or {})
    for n, con in contracts.items():
        if n not in impl:
            raise ContractLibraryError(
                "publish", f"{n} is missing in the implementation")
        entry["values"][n] = con
        result[n] = wrap(con, impl[n], n)
    return result


def wrap_all(impl: dict, contracts: dict) -> dict:
    """publish() without a module name (contract.impl.js:843-846)."""
    return publish(None, impl, contracts)


def document_module(module_name: str, *docs: str) -> None:
    key = module_name
    entry = documentation_table.setdefault(
        key, {"doc": [], "categories": [], "types": {}, "values": {}})
    entry["doc"].extend(docs)


def document_category(module_name: str, category: str, *docs: str) -> None:
    """contract.impl.js:797-806."""
    entry = documentation_table.setdefault(
        module_name, {"doc": [], "categories": [], "types": {}, "values": {}})
    entry["categories"].append({"name": category, "doc": list(docs)})


def document_type(module_name: str, contract: ast.Contract) -> None:
    entry = documentation_table.setdefault(
        module_name, {"doc": [], "categories": [], "types": {}, "values": {}})
    if contract.contract_name in entry["types"]:
        raise ContractLibraryError(
            "documentType",
            f"`documentType` called with a contract whose name that is "
            f"already documented: {contract.to_string()}")
    entry["types"][contract.contract_name] = contract

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
    (contract.impl.js:41-47);
  * container-recursive wrap — callables inside arrays / tuples / hashes /
    objects / or-branches get guard proxies (contract.impl.js:65-87
    wrapWContext; the per-container wrappers at :528-534, :565-573,
    :621-632, :666-681), with the reference's call-time frame semantics
    (container frames unwind before the call; object fields become the
    thingName) and even its or-wrap first-branch quirk (:475-478);
  * method(thisC, ...) / .thisArg(c) — the `this` value is checked before
    the arguments with the `.this` frame (function-contracts.js:105-119,
    167-171, 437-451).  Python has no implicit `this`, so a contracted
    `this` is passed to the implementation as its first parameter and
    callers bind it via `wrapped.with_this(obj)(...)`.

Analogues rather than ports (Python has no JS prototype chains and no
mustache templating in scope): `.constructs()` wraps CLASSES via a
guarded subclass (see its docstring), and `generate_docs()` renders the
documentationTable to markdown instead of generateHTML's HTML.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

from ..contracts import ast, interp, jsval
from ..contracts.errors import (
    ContractLibraryError, Frame, FRAME_RESULT, FRAME_THIS, MessageBuilder,
    RowContractError, Violation, frame_argument, frame_array_item,
    frame_hash_item, frame_object_field, frame_tuple_item,
)

CHECK_NEEDS_WRAPPING_MSG = (
    "This contract requires wrapping. Call wrap() instead and retain the "
    "wrapped result."
)


class FnContract(ast.Contract):
    """fn(...argContracts) / fun({name: c}, ...) — a contract on a callable."""

    is_function_contract = True

    def __init__(self, *argument_contracts, name: str = "fn",
                 arg_names: Optional[list] = None):
        super().__init__(name)
        self.argument_contracts = tuple(
            ast.auto_to_contract(c) for c in argument_contracts)
        self.arg_names = list(arg_names) if arg_names else [None] * len(
            self.argument_contracts)
        self.result_contract: ast.Contract = ast.AnyC()
        self.extra_argument_contract: Optional[ast.Contract] = None
        self.this_contract: ast.Contract = ast.AnyC()
        self.thing_name: Optional[str] = None  # set by object-field wrap
        self.constructs_fields: Optional[dict] = None  # set by .constructs()
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

    def thisArg(self, c) -> "FnContract":
        """Contract on the `this` value of the call
        (function-contracts.js:167-171)."""
        return self._clone(this_contract=ast.auto_to_contract(c))

    ths = thisArg  # reference back-compat alias (function-contracts.js:171)

    def constructs(self, prototype_fields: dict) -> "FnContract":
        """Constructor contract (function-contracts.js:177-357), mapped to
        Python CLASS wrapping: wrap() returns a SUBCLASS whose __init__
        checks the constructor arguments and whose listed methods are
        guarded (their `this` defaults to isA(cls), mirroring
        function-contracts.js:315-335).  `instanceof`/isA hold against
        both the wrapped and the original class because the wrapper IS a
        subclass — the Python analogue of the reference's prototype-chain
        construction.  Message parity is kept for the argument/this/result
        checks (same fun machinery); the prototype-surgery corner cases of
        JS have no Python analogue and are not claimed."""
        return self._clone(constructs_fields={
            k: ast.auto_to_contract(v) for k, v in prototype_fields.items()})

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
        this = ("" if isinstance(self.this_contract, ast.AnyC)
                else f"this: {self.this_contract.to_string()}, ")
        extra = (f"...{self.extra_argument_contract.to_string()}"
                 if self.extra_argument_contract else "")
        return (f"c.{self.contract_name}({this}{', '.join(args)}{extra}"
                f" -> {self.result_contract.to_string()})")


def fn(*argument_contracts) -> FnContract:
    """Positional argument contracts (function-contracts.js:370-373)."""
    return FnContract(*argument_contracts, name="fn")


def method(ths, *arg_specs) -> FnContract:
    """`c.method(thisC, {name: c}, ...)` — a fun whose `this` is contracted
    (function-contracts.js:437-451; the 'by got' typo is the reference's)."""
    if not isinstance(ths, ast.Contract):
        raise ContractLibraryError(
            "method",
            f"expected a Contract for the `this` argument, by got "
            f"{jsval.inspect(ths)}")
    return _fun_helper("method", arg_specs).thisArg(ths)


def _fun_helper(who: str, arg_specs) -> FnContract:
    """Named-argument parsing shared by fun/method
    (function-contracts.js:375-435, incl. its exactly-one-key checks)."""
    names, contracts = [], []
    for i, spec in enumerate(arg_specs):
        if isinstance(spec, ast.Contract):
            raise ContractLibraryError(
                who,
                f"expected a one-field object specifying the name and the "
                f"contract of the {jsval.ith(i)} argument, but got a "
                f"contract {spec.to_string()}")
        if not isinstance(spec, dict):
            raise ContractLibraryError(
                who,
                f"expected an object with exactly one field to specify the "
                f"name of the {jsval.ith(i)} argument, but got "
                f"{jsval.inspect(spec)}")
        if len(spec) != 1:
            raise ContractLibraryError(
                who,
                f"expected exactly one key to specify the name of the "
                f"{jsval.ith(i)} arguments, but got {jsval.inspect(len(spec))}")
        ((nm, c),) = spec.items()
        names.append(nm)
        contracts.append(c)
    return FnContract(*contracts, name=who, arg_names=names)


def fun(*arg_specs) -> FnContract:
    """Named-argument contracts: fun({'x': c.number}, {'y': c.string})."""
    return _fun_helper("fun", arg_specs)


class _WrapContext:
    def __init__(self, thing_name, contract, data=None):
        self.thing_name = thing_name
        self.blame_me = True
        self.stack: list[Frame] = []
        self.contract = contract
        # the ORIGINAL top-level wrapped value: `fullValue` renders it in
        # call-time errors (skipped when it is itself a function)
        self.data = data if data is not None else _the_function_marker


def _fail(ctx: _WrapContext, msg: Optional[str]) -> None:
    """Arg-count failure: `ContractError(context, msg).fullContract()` —
    note NO fullValue (the context data is the function itself, which the
    reference never prints)."""
    mb = MessageBuilder(thing_name=ctx.thing_name, wrapping=True,
                        blame_me=ctx.blame_me,
                        is_function_contract=isinstance(ctx.contract,
                                                        FnContract))
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


def _the_function_marker():  # callable sentinel: full_value always skips it
    raise AssertionError("never called")


_FRAME_EXTRA = Frame(".extraArguments",
                     "for the extra argument array of the call")


def _check_for_wrap(contract: ast.Contract, value: Any,
                    ctx: _WrapContext) -> None:
    """The CHECK half of checkWrapWContext (contract.impl.js:88-101) run in
    wrap mode — unlike interp.check_row it does not refuse wrapping
    contracts, and the context stack/blame come from the wrap context."""

    def fail(v: Violation):
        raise RowContractError(v)

    ictx = interp._Context(ctx.thing_name, ctx.data, ctx.contract,
                           fail, wrapping=True, blame_me=ctx.blame_me,
                           is_function_contract=isinstance(
                               ctx.contract, FnContract))
    ictx.stack = list(ctx.stack)
    interp.check_w_context(ast.auto_to_contract(contract), value, ictx)


def _wrap_w_context(c: ast.Contract, v: Any, ctx: _WrapContext):
    """The WRAP half (contract.impl.js:65-87): recursively clone containers,
    replacing values under function contracts with guarded callables whose
    closures capture the container frames — e.g. a failing call to
    `wrap(c.hash(c.fn()), x).thk(5)` blames `.thk` exactly like the
    reference (contract.spec.js:259-265)."""
    c = ast.auto_to_contract(c)
    if c.is_optional and jsval.is_missing(v):
        return v

    def nxt(sub: ast.Contract, val: Any, frame: Frame):
        sub = ast.auto_to_contract(sub)
        if not sub.needs_wrapping:
            return val
        if not frame.silent:
            ctx.stack.append(frame)
        try:
            return _wrap_w_context(sub, val, ctx)
        finally:
            if not frame.silent:
                ctx.stack.pop()

    if isinstance(c, FnContract):
        if c.constructs_fields is not None:
            return _make_wrapped_class(c, v, ctx)
        return _make_guarded(c, v, ctx)
    if isinstance(c, ast.CyclicC):
        return _wrap_w_context(c.resolved(), v, ctx)
    if isinstance(c, ast.AndC):
        # contract.impl.js:393-398
        raise ContractLibraryError("wrap", "Cannot wrap an `and` contract")
    if isinstance(c, ast.OrC):
        # the reference re-runs its nestedChecker with a NOOP `next`
        # (contract.impl.js:475-478 "this is a bit of a hack"), so nothing
        # can fail and the FIRST branch in union(non-wrapping, wrapping)
        # order always "succeeds": or-wrap wraps only when every branch is
        # a wrapping contract (i.e. the single allowed fn branch) —
        # replicated verbatim, quirk and all
        non_wrap = [b for b in c.contracts
                    if not ast.auto_to_contract(b).needs_wrapping]
        wrapping = [b for b in c.contracts
                    if ast.auto_to_contract(b).needs_wrapping]
        ordered = non_wrap + wrapping
        if not ordered:
            return v
        return nxt(ordered[0], v, Frame(".or", ""))
    if isinstance(c, ast.ArrayC):
        return [nxt(c.item, item, frame_array_item(i))
                for i, item in enumerate(v)]
    if isinstance(c, ast.TupleC):
        # tuple wrapper truncates to the contracted arity
        # (contract.impl.js:565-573)
        return [nxt(sub, item, frame_tuple_item(i))
                for i, (sub, item) in enumerate(
                    zip(c.contracts, v[:len(c.contracts)]))]
    if isinstance(c, ast.HashC):
        out = dict(v)
        for k in out:
            out[k] = nxt(c.value_contract, out[k], frame_hash_item(k))
        return out
    if isinstance(c, ast.ObjectC):
        out = dict(v)
        for field, sub in c.fields.items():
            sub = ast.auto_to_contract(sub)
            if sub.needs_wrapping:
                # thingName becomes the field name
                # (contract.impl.js:674-678)
                named = sub._clone(thing_name=field) \
                    if isinstance(sub, FnContract) else sub
                out[field] = nxt(named, v.get(field),
                                 frame_object_field(field))
        return out
    return v


def _make_guarded(fc: FnContract, f: Callable, wrap_ctx: _WrapContext):
    """The fn-contract wrapper (function-contracts.js:79-160): returns a
    guarded callable whose closure captures the wrap-time frame stack and
    the TOP-LEVEL contract for error rendering."""
    thing = fc.thing_name or wrap_ctx.thing_name \
        or getattr(f, "__name__", None)
    top_contract = wrap_ctx.contract
    top_data = wrap_ctx.data
    # NOTE: the reference's fn wrapper closes over the MUTABLE wrap context
    # whose container frames are popped again by the time the wrapped
    # function is called — so call-time error stacks start EMPTY; only
    # thingName (field name for object fields) survives
    # (contract.impl.js:65-87 push/pop + function-contracts.js:86-89 clone).

    def _call(this, args):
        ctx = _WrapContext(thing, top_contract, top_data)
        # reverseBlame around the arg-count check: blame the caller
        ctx.blame_me = False
        _check_argument_count(fc, len(args), ctx)
        ctx.blame_me = True

        def nxt(sub, val, frame: Frame, reverse_blame: bool):
            sub = ast.auto_to_contract(sub)
            ctx.stack.append(frame)
            if reverse_blame:
                ctx.blame_me = not ctx.blame_me
            try:
                _check_for_wrap(sub, val, ctx)
                if sub.needs_wrapping:
                    val = _wrap_w_context(sub, val, ctx)
                return val
            finally:
                if reverse_blame:
                    ctx.blame_me = not ctx.blame_me
                ctx.stack.pop()

        if not isinstance(fc.this_contract, ast.AnyC):
            nxt(fc.this_contract, this, FRAME_THIS, True)
        final_args = []
        for i, (c, nm) in enumerate(zip(fc.argument_contracts, fc.arg_names)):
            if i < len(args):
                final_args.append(
                    nxt(c, args[i], frame_argument(nm if nm else i), True))
            elif not c.is_optional:
                nxt(c, None, frame_argument(nm if nm else i), True)
        extras = list(args[len(fc.argument_contracts):])
        if fc.extra_argument_contract is not None:
            extras = nxt(fc.extra_argument_contract, extras,
                         _FRAME_EXTRA, True)
        # Python has no implicit `this`: when the contract declares one,
        # the implementation receives it as its first parameter
        if not isinstance(fc.this_contract, ast.AnyC):
            result = f(this, *(final_args + extras))
        else:
            result = f(*(final_args + extras))
        return nxt(fc.result_contract, result, FRAME_RESULT, False)

    @functools.wraps(f)
    def guarded(*args):
        return _call(None, args)

    guarded.with_this = lambda this: (lambda *args: _call(this, args))
    guarded.__contract__ = fc
    return guarded


def _make_wrapped_class(fc: FnContract, cls: type, wrap_ctx: _WrapContext):
    """constructs() wrapper: a subclass whose __init__ runs the fun
    argument checks and whose contracted methods are guarded with
    `this` = isA(cls) by default."""
    thing = fc.thing_name or wrap_ctx.thing_name \
        or getattr(cls, "__name__", None)
    # missing-method check (function-contracts.js:184-201, message kept).
    # A non-class value has none of the prototype fields, so it fails here
    # too instead of silently dropping the prototype contract.
    missing = [k for k in fc.constructs_fields if not hasattr(cls, k)]
    if missing:
        whose = f"{thing}'s" if thing else "the"
        raise RowContractError(Violation(
            message=(f"constructs: some fields present in {whose} prototype "
                     f"contract are missing on the prototype: "
                     f"{', '.join(missing)}"),
            expected=None, got=None, path="",
            contract_name=fc.contract_name, blame=""))
    if not isinstance(cls, type):
        raise ContractLibraryError(
            "wrap", "constructs() requires a class to wrap")

    # the constructor's .returns() applies to the constructed INSTANCE
    # (reference checks the constructor result), so the argument checker
    # must NOT result-check the intermediate args tuple
    init_fc = fc._clone(constructs_fields=None,
                        result_contract=ast.AnyC(),
                        thing_name=fc.thing_name or thing)
    result_contract = fc.result_contract
    ctx = _WrapContext(thing, wrap_ctx.contract, wrap_ctx.data)
    check_args = _make_guarded(init_fc, lambda *a: a, ctx)

    namespace = {}

    def __init__(self, *args):
        final = check_args(*args)
        cls.__init__(self, *final)
        if not isinstance(result_contract, ast.AnyC):
            rctx = _WrapContext(thing, wrap_ctx.contract, wrap_ctx.data)
            rctx.stack = [FRAME_RESULT]
            _check_for_wrap(result_contract, self, rctx)

    namespace["__init__"] = __init__
    for mname, mc in fc.constructs_fields.items():
        if not isinstance(mc, FnContract):
            continue  # non-function prototype fields: presence-checked only
        mc2 = mc if not isinstance(mc.this_contract, ast.AnyC) \
            else mc.thisArg(ast.IsAC(cls, cls.__name__))
        mc2 = mc2._clone(thing_name=mname)
        orig = getattr(cls, mname)
        guarded = _make_guarded(mc2, orig, ctx)

        def make_method(_g=guarded):
            def m(self, *args):
                return _g.with_this(self)(*args)
            return m

        namespace[mname] = make_method()

    wrapped = type(cls.__name__, (cls,), namespace)
    wrapped.__qualname__ = cls.__qualname__
    return wrapped


def wrap(contract, f: Callable, name: Optional[str] = None) -> Callable:
    """`c.wrap(contract, value)` — check, then recursively install guard
    proxies wherever the contract holds a function contract: bare
    callables, and callables inside arrays / tuples / hashes / objects /
    or-branches (contract.impl.js:88-101 checkWrapWContext)."""
    fc = ast.auto_to_contract(contract) if not isinstance(contract,
                                                          ast.Contract) \
        else contract
    thing = name
    if thing is None and isinstance(fc, FnContract) and callable(f):
        thing = getattr(f, "__name__", None)
    ctx = _WrapContext(thing, fc, f)
    _check_for_wrap(fc, f, ctx)
    if not fc.needs_wrapping:
        return f
    return _wrap_w_context(fc, f, ctx)


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
    """contract.impl.js:797-806.  Also latches the CURRENT category that
    subsequent .doc() calls record on their contracts (the reference's
    `currentCategory` mechanism — note its own categories-list push at
    generateHTML time is what groups values by that attribute)."""
    entry = documentation_table.setdefault(
        module_name, {"doc": [], "categories": [], "types": {}, "values": {}})
    entry["categories"].append({"name": category, "doc": list(docs)})
    ast._CURRENT_CATEGORY[0] = category


def document_type(module_name: str, contract: ast.Contract) -> None:
    entry = documentation_table.setdefault(
        module_name, {"doc": [], "categories": [], "types": {}, "values": {}})
    if contract.contract_name in entry["types"]:
        raise ContractLibraryError(
            "documentType",
            f"`documentType` called with a contract whose name that is "
            f"already documented: {contract.to_string()}")
    entry["types"][contract.contract_name] = contract


_HTML_CSS = """\
body { margin-left: 20%; margin-right: 20%; }
pre { margin-left: 30pt; background-color: rgb(223,223,233); }
code { background-color: rgb(223,223,233);  }
table { border: 1px solid grey; padding: 10pt; }
td { padding: 7px; padding-top: 35px; margin-right: 15pt; vertical-align: top; }
h3, .type-name { font-size: 40px; font-weight: bold; margin-top: 40px; }

.field-type, .value-type { width: 180px; }
"""


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _render_doc_html(lines) -> str:
    # marked() analogue for the doc strings the registry actually holds:
    # plain paragraphs (no template engine / markdown lib in scope)
    return "<p>" + "</p>\n<p>".join(_esc(x) for x in lines) + "</p>" \
        if lines else ""


def generate_docs_html(module_name: str = "Contracts") -> str:
    """HTML flavour of the docs generator — same renderModule data flow
    as the reference (generateHTML.js:99-160: values/types filtered into
    categories by the per-contract `category` attribute that .doc()
    latched, the uncategorized block first without a header) and the
    same element classes/CSS as its resources/module.mustache, rendered
    with f-strings instead of mustache."""
    mod = documentation_table.get(module_name)
    if mod is None:
        raise ContractLibraryError(
            "generateHTML", f"no documentation for module {module_name!r}")

    def for_cat(d: dict, cat) -> dict:
        return {n: v for n, v in d.items()
                if getattr(v, "category", False) == cat}

    def value_rows(values: dict) -> str:
        rows = [
            f'<tr class="value">\n'
            f'  <td class="value-name">{_esc(n)}</td>\n'
            f'  <td class="value-type"><code>{_esc(v.to_string())}</code>'
            f'</td>\n'
            f'  <td class="value-doc">{_render_doc_html(v.the_doc)}</td>'
            f'</tr>'
            for n, v in values.items()]
        return ('<h3>Values and Functions</h3>\n\n'
                '<table class="values-table">\n' + "\n".join(rows)
                + "\n</table>")

    def type_divs(types: dict) -> str:
        parts = ["<h3>Types</h3>"]
        for tname, t in types.items():
            parts.append(f'<div class="type-name">{_esc(tname)}</div>')
            parts.append(f'<div class="type-doc">'
                         f'{_render_doc_html(t.the_doc)}</div>')
            fields = getattr(t, "fields", None)
            if fields:                      # object contract: field table
                rows = [
                    f'<tr class="field-row">\n'
                    f'  <td class="field-name">{_esc(fn)}</td>\n'
                    f'  <td class="field-type"><code>'
                    f'{_esc(fc.to_string())}</code></td>\n'
                    f'  <td class="field-doc">'
                    f'{_render_doc_html(fc.the_doc)}</td></tr>'
                    for fn, fc in fields.items()]
                parts.append('<table class="field-table">\n'
                             + "\n".join(rows) + "\n</table>")
            else:
                parts.append(f'<code class="type-type">'
                             f'{_esc(t.to_string())}</code>')
        return "\n".join(parts)

    sections = []
    cat_names = [c["name"] for c in mod["categories"]]
    # uncategorized block FIRST, headerless (generateHTML.js:122-129)
    for cat in [False] + cat_names:
        types = for_cat(mod["types"], cat)
        values = for_cat(mod["values"], cat)
        if not types and not values:
            continue
        block = []
        if cat is not False:
            cdoc = next(c["doc"] for c in mod["categories"]
                        if c["name"] == cat)
            block.append(f'<h2 class="category">{_esc(cat)}</h2>')
            block.append(f'<p class="types-category-doc">'
                         f'{_render_doc_html(cdoc)}</p>')
        if types:
            block.append(type_divs(types))
        if values:
            block.append(value_rows(values))
        sections.append("\n\n".join(block))

    body = "\n\n".join(sections)
    doc = _render_doc_html(mod["doc"])
    return (f"<html>\n\n\n<style type=\"text/css\">\n{_HTML_CSS}</style>\n\n"
            f"<head>\n  <title>{_esc(module_name)}</title>\n</head>\n\n"
            f"<body>\n\n<h1>{_esc(module_name)}</h1>\n\n{doc}\n\n"
            f"{body}\n\n</body>\n</html>\n")


def generate_docs(module_name: Optional[str] = None) -> str:
    """Markdown analogue of the reference's generateHTML
    (generateHTML.js:133-160): render the documentationTable — module doc,
    categories, documented types and contracted values with their
    toString() signatures and doc lines.  Markdown instead of the
    mustache/HTML pipeline (no template engine in scope); same source
    registry, same grouping."""
    names = [module_name] if module_name is not None \
        else [k for k in documentation_table if k is not False]
    out: list[str] = []
    for name in names:
        mod = documentation_table.get(name)
        if mod is None:
            continue
        out.append(f"# {name}")
        for line in mod["doc"]:
            out.append(line)
        cats = {c["name"]: c for c in mod["categories"]}

        def emit(types: dict, values: dict) -> None:
            if types:
                out.append("")
                out.append("## Types")
                for tname, tcon in types.items():
                    out.append(f"- **{tname}**: `{tcon.to_string()}`")
                    for d in getattr(tcon, "the_doc", ()):
                        out.append(f"  - {d}")
            if values:
                out.append("")
                out.append("## Values")
                for vname, vcon in values.items():
                    out.append(f"- **{vname}**: `{vcon.to_string()}`")
                    for d in getattr(vcon, "the_doc", ()):
                        out.append(f"  - {d}")

        emit(mod["types"], mod["values"])
        for cat in cats.values():
            out.append("")
            out.append(f"## {cat['name']}")
            for line in cat["doc"]:
                out.append(line)
        out.append("")
    return "\n".join(out)

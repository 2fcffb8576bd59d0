"""The contract AST — the engine's schema language.

Re-expresses the reference's contract algebra (reference
src/contract.impl.js:127-729) as a small Python node tree.  Nodes are
value-semantics objects: every fluent method (`rename`, `optional`,
`strict`, `extend`, `doc`) returns a *clone* — mirroring the reference's
persistent `gentleUpdate` (src/utils.js:30-37) so shared sub-contracts are
never mutated.

A node does NOT validate anything itself; it is compiled two ways:
  * `interp.check_row(node, value)` — faithful row-at-a-time interpreter
    (message parity with the mocha oracle), used only on failing rows;
  * `compile.mask_kernel(node)` — vectorized Arrow verdict kernel, used
    inside `Dataset.map_batches` for every row.
"""

from __future__ import annotations

import copy
import math
import re as _re
from typing import Any, Callable, Optional, Sequence

from .errors import ContractLibraryError
from . import jsval


def _js_string(v: Any) -> str:
    """JS String(v) coercion — used for names like oneOf(y, n)
    (contract.impl.js:309: template-string join of raw args)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == math.floor(v) and abs(v) < 1e21:
            return str(int(v))
    return str(v)


# module-level current documentation category (contract.impl.js:125
# `currentCategory`): documentCategory sets it, Contract.doc latches it
_CURRENT_CATEGORY: list = [False]


class Contract:
    """Base node — reference Contract prototype (contract.impl.js:139-218)."""

    contract_name: str = ""

    def __init__(self, name: str):
        self.contract_name = name
        self.is_optional = False
        self.the_doc: tuple[str, ...] = ()
        self.category = False   # set by doc() from the current category
        self._renamed: Optional[str] = None
        self._optional_wrap = False

    # -- persistent updates (gentleUpdate analogue, utils.js:30-37)
    def _clone(self, **updates) -> "Contract":
        other = copy.copy(self)
        for k, v in updates.items():
            setattr(other, k, v)
        return other

    def rename(self, name: str) -> "Contract":
        # contract.impl.js:188-198 — rename switches toString to `c.<name>`
        return self._clone(contract_name=name, _renamed=name, _optional_wrap=False)

    def optional(self) -> "Contract":
        # contract.impl.js:200-210
        return self._clone(is_optional=True, _optional_wrap=True)

    def doc(self, *lines: str) -> "Contract":
        # the category is latched at doc() time from the module-level
        # current category (contract.impl.js:212-217 + :125)
        return self._clone(the_doc=tuple(lines),
                           category=_CURRENT_CATEGORY[0])

    # -- pretty-printing (contract.impl.js:181-187)
    def sub_to_string(self) -> list[str]:
        return []

    def _base_str(self) -> str:
        if self._renamed is not None:
            return f"c.{self._renamed}"
        return f"c.{self.contract_name}({', '.join(self.sub_to_string())})"

    def to_string(self) -> str:
        base = self._base_str()
        if self._optional_wrap:
            return f"c.optional({base})"
        return base

    def __repr__(self) -> str:
        return self.to_string()

    # -- meta
    @property
    def needs_wrapping(self) -> bool:
        # needsWrappingIfAny: true iff any child subtree holds a function
        # contract (contract.impl.js:149-154); FnContract overrides to True
        return any(c is not None and c.needs_wrapping for c in self.children())

    def children(self) -> list["Contract"]:
        return []


# ---------------------------------------------------------------------------
# Leaves (contract.impl.js:281-370,412-418)
# ---------------------------------------------------------------------------


class AnyC(Contract):
    def __init__(self):
        super().__init__("any")


class PredC(Contract):
    """pred(fn) — the user-extension escape hatch (contract.impl.js:284-287).

    `fn` takes a Python row value and returns a JS-truthy result.  If
    `vectorized_fn` is given it takes a `pyarrow.Array` and returns a boolean
    mask — that is the fast path used by the compiler."""

    def __init__(self, fn: Callable[[Any], Any], vectorized_fn=None, name="unamed-pred"):
        super().__init__(name)
        self.fn = fn
        self.vectorized_fn = vectorized_fn


class FalsyC(Contract):
    def __init__(self):
        super().__init__("falsy")
        self._renamed = "falsy"


class TruthyC(Contract):
    def __init__(self):
        super().__init__("truthy")
        self._renamed = "truthy"


class NothingC(Contract):
    def __init__(self):
        super().__init__("nothing")
        self._renamed = "nothing"


class OneOfC(Contract):
    def __init__(self, *values: Any):
        name = f"oneOf({', '.join(_js_string(v) for v in values)})"
        super().__init__(name)
        self._renamed = name  # oneOf's toString is `c.<name>` (impl.js:315-318)
        self.values = tuple(values)


class ValueC(OneOfC):
    def __init__(self, v: Any):
        super().__init__(v)
        n = f"value({_js_string(v)})"
        self.contract_name = n
        self._renamed = n


class StringC(Contract):
    def __init__(self):
        super().__init__("string")
        self._renamed = "string"


class NumberC(Contract):
    def __init__(self):
        super().__init__("number")
        self._renamed = "number"


class IntegerC(Contract):
    def __init__(self):
        super().__init__("integer")
        self._renamed = "integer"


class BoolC(Contract):
    def __init__(self):
        super().__init__("bool")
        self._renamed = "bool"


class DateC(Contract):
    def __init__(self):
        super().__init__("Date")
        self._renamed = "Date"


class MatchesC(Contract):
    """matches(re) — string AND re.test (search semantics)
    (contract.impl.js:412-418).  Non-strings (including null) fail — the
    spec pins no-coercion at contract.spec.js:171-181."""

    def __init__(self, pattern: str, flags: str = ""):
        name = f"matches(/{pattern}/{flags})"
        super().__init__(name)
        self._renamed = name
        self.pattern = pattern
        self.flags = flags
        py_flags = 0
        if "i" in flags:
            py_flags |= _re.IGNORECASE
        if "m" in flags:
            py_flags |= _re.MULTILINE
        if "s" in flags:
            py_flags |= _re.DOTALL
        self.compiled = _re.compile(pattern, py_flags)


# ---------------------------------------------------------------------------
# Combinators (contract.impl.js:377-511)
# ---------------------------------------------------------------------------


class AndC(Contract):
    """and(...cs): all pass; failing branch gets an `.and(i)` frame; the
    silent variant suppresses the frame (contract.impl.js:377-410)."""

    def __init__(self, *contracts, silent: bool = False):
        super().__init__("and")
        self.contracts = tuple(auto_to_contract(c) for c in contracts)
        self.silent = silent

    def sub_to_string(self):
        return [c.to_string() for c in self.contracts]

    def children(self):
        return list(self.contracts)


class OrC(Contract):
    """or(...cs): first passing branch wins; total failure produces the
    composite "none of the contracts passed" message
    (contract.impl.js:420-482)."""

    def __init__(self, *contracts):
        super().__init__("or")
        self.contracts = tuple(auto_to_contract(c) for c in contracts)
        wrapping = [c for c in self.contracts if c.needs_wrapping]
        if len(wrapping) > 1:
            # contract.impl.js:427-431
            raise ContractLibraryError(
                "or",
                "Or-contracts can only take at most one wrapping contracts, "
                f"got {[c.to_string() for c in wrapping]}")

    def sub_to_string(self):
        # the reference's `or` never sets subToString, so it prints `c.or()`
        # (contract.impl.js:420-481 vs the base at :181-187)
        return []

    def children(self):
        return list(self.contracts)


class CyclicC(Contract):
    """cyclic()/closeCycle(c) — forward reference for recursive contracts
    (contract.impl.js:484-511).  The vectorized compiler unrolls it to the
    Arrow schema's (finite) depth."""

    def __init__(self, name: str = "cyclic"):
        super().__init__(name)
        # shared ref-cell: clones made BEFORE closeCycle (e.g. via
        # `.optional()`) must still see the eventually-closed target
        self._cell: dict = {}

    @property
    def target(self) -> Optional[Contract]:
        return self._cell.get("target")

    @property
    def needs_wrapping(self) -> bool:
        # the reference makes this an explicit flag on cyclic()/forwardRef()
        # (contract.impl.js:484-511); recursing through the cycle would not
        # terminate.  Data contracts never wrap, so: False.
        return False

    def close_cycle(self, c: Contract) -> "CyclicC":
        self._cell["target"] = auto_to_contract(c)
        return self

    # forwardRef flavor (contract.impl.js:505-511)
    set_ref = close_cycle

    def resolved(self) -> Contract:
        t = self.target
        if t is None:
            raise ContractLibraryError(
                self.contract_name, "cycle was never closed — call closeCycle()/setRef()"
            )
        return t

    def to_string(self):
        # avoid infinite recursion on self-referential pretty-printing
        return f"c.{self.contract_name}"

    def children(self):
        return [self.target] if self.target is not None else []


# ---------------------------------------------------------------------------
# Structural contracts (contract.impl.js:518-729)
# ---------------------------------------------------------------------------


class ArrayC(Contract):
    def __init__(self, item: Any):
        super().__init__("array")
        self.item = auto_to_contract(item)

    def sub_to_string(self):
        return [self.item.to_string()]

    def children(self):
        return [self.item]


class TupleC(Contract):
    """tuple(...cs): array of length >= n, positions checked, extras ignored;
    .strict() pins length == n (contract.impl.js:544-606)."""

    def __init__(self, *contracts, strict: bool = False):
        super().__init__("tuple")
        self.contracts = tuple(auto_to_contract(c) for c in contracts)
        self.is_strict = strict
        if strict:
            self._renamed = "tuple.strict"
            self.contract_name = "tuple.strict"

    def strict(self) -> "TupleC":
        if self.is_strict:
            return self  # idempotent (contract.impl.js:591-594)
        out = self._clone(is_strict=True, _renamed="tuple.strict",
                          contract_name="tuple.strict")
        return out

    def sub_to_string(self):
        return [c.to_string() for c in self.contracts]

    def children(self):
        return list(self.contracts)


class HashC(Contract):
    """hash(valueC): every value of a string-keyed map passes
    (contract.impl.js:609-640)."""

    def __init__(self, value_contract: Any):
        super().__init__("hash")
        self.value_contract = auto_to_contract(value_contract)

    def sub_to_string(self):
        return [self.value_contract.to_string()]

    def children(self):
        return [self.value_contract]


class ObjectC(Contract):
    """object({f: c, ...}): declared fields present (unless optional) and
    passing; extra fields allowed unless strict (contract.impl.js:642-729)."""

    def __init__(self, fields: Optional[dict[str, Any]] = None, strict: bool = False):
        super().__init__("object")
        self.fields: dict[str, Contract] = {
            k: auto_to_contract(v) for k, v in (fields or {}).items()
        }
        self.is_strict = strict
        if strict:
            self._renamed = "object.strict"
            self.contract_name = "object.strict"

    def strict(self) -> "ObjectC":
        if self.is_strict:
            return self  # idempotent (contract.impl.js:713-716)
        return self._clone(is_strict=True, _renamed="object.strict",
                           contract_name="object.strict")

    def extend(self, new_fields: dict[str, Any]) -> "ObjectC":
        # contract.impl.js:683-689 — merge preserves strictness
        merged = dict(self.fields)
        merged.update({k: auto_to_contract(v) for k, v in new_fields.items()})
        return self._clone(fields=merged)

    def _base_str(self):
        if self._renamed is not None:
            return f"c.{self._renamed}"
        inner = ", ".join(f"{k}: {v.to_string()}" for k, v in self.fields.items())
        return "c.object({" + inner + "})"

    def children(self):
        return list(self.fields.values())


# -- meta leaves with no table representation (interp-only) -----------------


class RegexpC(Contract):
    def __init__(self):
        super().__init__("regexp")
        self._renamed = "regexp"


class AnyFunctionC(Contract):
    def __init__(self):
        super().__init__("fun(...)")
        self._renamed = "fun(...)"


class IsAC(Contract):
    def __init__(self, cls: type, name: Optional[str] = None):
        n = name or getattr(cls, "__name__", "...")
        super().__init__(f"isA({n})")
        self._renamed = f"isA({n})"
        self.cls = cls


class ContractLeafC(Contract):
    """The `contract` meta-leaf (contract.impl.js:362-365, published at
    contract.js:283-287): accepts values that either ARE contracts or
    are auto-promotable to one — contract instances, arrays, and
    non-objects.  Plain objects and functions fail (lodash `_.isObject`
    counts both); this is exactly the domain `auto_to_contract` accepts
    without raising, which is how the reference uses it to validate
    combinator arguments in its self-hosted API."""

    def __init__(self):
        super().__init__("contract")
        self._renamed = "contract"


# ---------------------------------------------------------------------------
# Promotion (contract.impl.js:227-263) and inference (:737-768)
# ---------------------------------------------------------------------------


def _to_contract(v: Any, upgrade_objects: bool) -> Contract:
    if isinstance(v, Contract):
        return v
    if isinstance(v, (list, tuple)):
        if len(v) == 0 or v[0] is None:
            raise ContractLibraryError(
                "toContract", f"the example element of the array is missing. {v}"
            )
        if len(v) > 1:
            raise ContractLibraryError(
                "toContract", f"the given array has more than one element: {list(v)}"
            )
        return ArrayC(_to_contract(v[0], upgrade_objects))
    if not isinstance(v, dict) and not callable(v):
        return ValueC(v)
    if isinstance(v, dict) and upgrade_objects:
        return ObjectC({k: _to_contract(vv, True) for k, vv in v.items()})
    raise ContractLibraryError(
        "toContract", f"Cannot promote {jsval.inspect(v)} to a contract"
    )


def auto_to_contract(v: Any) -> Contract:
    """Promotion without object upgrade — applied to every combinator
    argument (contract.impl.js:256-259)."""
    return _to_contract(v, False)


def to_contract(v: Any) -> Contract:
    """Deep promotion including plain dicts (contract.impl.js:261-263)."""
    return _to_contract(v, True)


def from_example(v: Any, with_question_mark: bool = False) -> Contract:
    """Infer a contract from a sample value (contract.impl.js:737-768).
    With `with_question_mark`, dict keys starting with '?' are skipped."""
    if isinstance(v, (list, tuple)):
        if not v:
            raise ContractLibraryError("fromExample", "can't infer from an empty array")
        return ArrayC(from_example(v[0]))
    if isinstance(v, dict):
        fields = {}
        for k, vv in v.items():
            if with_question_mark and isinstance(k, str) and k.startswith("?"):
                continue
            fields[k] = from_example(vv)
        return ObjectC(fields)
    if isinstance(v, bool):
        return BoolC()
    if isinstance(v, str):
        return StringC()
    if jsval.is_number(v):
        return NumberC()
    if callable(v):
        return AnyFunctionC()
    raise ContractLibraryError("fromExample", f"can't create a contract from {v}")

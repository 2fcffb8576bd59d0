"""Public contract-construction API.

Mirrors the reference's `c` namespace (reference src/contract.js publishes
the same surface, :202-588): `c.string`, `c.object({...})`, `c.or_(...)`,
etc.  Python keywords force `and_`/`or_`; `array`/`tuple_`/`hash_`/`object_`
get trailing underscores too but un-suffixed aliases exist on the `c`
namespace object for JS-likeness.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from . import ast, compile as compile_mod, interp, jsval
from .ast import (
    AnyC, AndC, ArrayC, BoolC, Contract, CyclicC, DateC, FalsyC, HashC,
    IntegerC, IsAC, MatchesC, NothingC, NumberC, ObjectC, OneOfC, OrC,
    PredC, StringC, TruthyC, TupleC, ValueC,
    auto_to_contract, from_example, to_contract,
)
from .errors import ContractLibraryError, RowContractError, Violation
from .interp import check_row, check_verdict

# -- builders ---------------------------------------------------------------


def pred(fn: Callable[[Any], Any], vectorized: Optional[Callable] = None,
         name: str = "unamed-pred") -> PredC:
    """User-extension predicate (contract.impl.js:284-287).  Supply
    `vectorized` (pyarrow.Array -> bool mask) for the fast path."""
    return PredC(fn, vectorized_fn=vectorized, name=name)


def oneOf(*values: Any) -> OneOfC:
    return OneOfC(*values)


def value(v: Any) -> ValueC:
    return ValueC(v)


def matches(pattern: str, flags: str = "") -> MatchesC:
    return MatchesC(pattern, flags)


def and_(*contracts) -> AndC:
    return AndC(*contracts)


def silentAnd(*contracts) -> AndC:
    return AndC(*contracts, silent=True)


def or_(*contracts) -> OrC:
    return OrC(*contracts)


def array(item) -> ArrayC:
    return ArrayC(item)


def tuple_(*contracts) -> TupleC:
    return TupleC(*contracts)


def hash_(value_contract) -> HashC:
    return HashC(value_contract)


def object_(fields: Optional[dict] = None) -> ObjectC:
    return ObjectC(fields)


def optional(contract) -> Contract:
    return auto_to_contract(contract).optional()


def cyclic() -> CyclicC:
    return CyclicC("cyclic")


def forwardRef() -> CyclicC:
    return CyclicC("forwardRef")


def isA(cls: type, name: Optional[str] = None) -> IsAC:
    return IsAC(cls, name)


def quacksLike(example: Any, name: Optional[str] = None) -> Contract:
    return from_example(example).rename(f"quacksLike({name or '...'})")


class _Namespace:
    """`from rho_contracts_ray import c` — JS-flavoured access."""

    any = AnyC()
    nothing = NothingC()
    falsy = FalsyC()
    truthy = TruthyC()
    string = StringC()
    number = NumberC()
    integer = IntegerC()
    bool = BoolC()
    date = DateC()
    regexp = ast.RegexpC()
    anyFunction = ast.AnyFunctionC()
    error = IsAC(Exception, "Error").rename("error")
    # is-this-a-contract(-or-promotable) meta-leaf (contract.js:283-287)
    contract = ast.ContractLeafC()

    pred = staticmethod(pred)
    oneOf = staticmethod(oneOf)
    value = staticmethod(value)
    matches = staticmethod(matches)
    and_ = staticmethod(and_)
    silentAnd = staticmethod(silentAnd)
    or_ = staticmethod(or_)
    array = staticmethod(array)
    tuple = staticmethod(tuple_)
    hash = staticmethod(hash_)
    object = staticmethod(object_)
    optional = staticmethod(optional)
    cyclic = staticmethod(cyclic)
    forwardRef = staticmethod(forwardRef)
    isA = staticmethod(isA)
    quacksLike = staticmethod(quacksLike)
    toContract = staticmethod(to_contract)
    fromExample = staticmethod(from_example)
    check = staticmethod(check_row)


c = _Namespace()

__all__ = [
    "c", "Contract", "Violation", "RowContractError", "ContractLibraryError",
    "check_row", "check_verdict", "auto_to_contract", "to_contract",
    "from_example", "pred", "oneOf", "value", "matches", "and_", "silentAnd",
    "or_", "array", "tuple_", "hash_", "object_", "optional", "cyclic",
    "forwardRef", "isA", "quacksLike",
]

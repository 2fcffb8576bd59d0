"""Violation / error message rendering with reference-parity wording.

Re-expresses the reference's ContractError message assembly
(reference src/contract-errors.js:124-242) and its "stack context item"
path frames (contract-errors.js:11-66).  The mocha suite pins message
fragments with regexes (contract.spec.js) — those are the conformance
oracle for the strings produced here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from . import jsval


@dataclass(frozen=True)
class Frame:
    """One path frame — contract-errors.js:11-66."""

    short: str
    long: str = ""
    silent: bool = False
    index: Optional[int] = None  # set on array items (used by extraArguments)


def frame_and(i: int) -> Frame:
    return Frame(f".and({i})", f"for the {jsval.ith(i)} branch of the `and` contract")


def frame_array_item(i: int) -> Frame:
    return Frame(f"[{i}]", f"for the {jsval.ith(i)} element of the array", index=i)


def frame_tuple_item(i: int) -> Frame:
    return Frame(f"[{i}]", f"for the {jsval.ith(i)} element of the tuple")


def frame_hash_item(k: str) -> Frame:
    return Frame(f".{k}", f"for the key `{k}` of the hash")


def frame_object_field(f: str) -> Frame:
    return Frame(f".{f}", f"for the field `{f}` of the object")


def frame_argument(arg) -> Frame:
    if isinstance(arg, int):
        return Frame(f".arg({arg})", f"for the {jsval.ith(arg)} argument of the call.")
    return Frame(f".{arg}", f"for the `{arg}` argument of the call.")


FRAME_THIS = Frame(".this", "for the `this` argument of the call.")
FRAME_RESULT = Frame(".result", "for the return value of the call.")
FRAME_SILENT = Frame("", "", silent=True)


class ContractLibraryError(Exception):
    """Misuse of the engine itself, not a data failure
    (contract-errors.js:244-254)."""

    def __init__(self, fn_name: str, msg: str):
        self.function_name = fn_name
        super().__init__(f"{fn_name}: {msg}")


@dataclass
class MessageBuilder:
    """Builds a failure message exactly as ContractError does
    (contract-errors.js:124-239): blame line, optional free-form msg,
    `Expected X, but got Y`, last-frame long form, `at position` path,
    `in contract:` pretty print, `The full value being checked was:`."""

    thing_name: Optional[str] = None
    wrapping: bool = False
    blame_me: bool = True
    is_function_contract: bool = False
    message: str = ""
    _expected: Optional[str] = None
    _printed_value: bool = False

    def init(self, msg: Optional[str] = None) -> "MessageBuilder":
        # ContractError constructor, contract-errors.js:124-141
        has_blame = self.thing_name is not None
        if has_blame:
            name = self.thing_name + ("()" if self.is_function_contract else "")
            if not self.wrapping:
                self.message += f"check on `{name}` failed:"
            elif self.blame_me:
                self.message += f"`{name}` broke its contract:"
            else:
                self.message += f"broke the contract on `{name}`:"
        if has_blame and msg:
            self.message += " "
        if msg:
            self.message += msg
        if has_blame or msg:
            self.message += "\n"
        return self

    def expected(self, expected: str, data: Any) -> "MessageBuilder":
        # contract-errors.js:172-180
        self._expected = expected
        self.message += f"Expected {expected}, but got {jsval.inspect(data)}\n"
        return self

    def full_contract(self, stack: list[Frame], contract_str: str) -> "MessageBuilder":
        # contract-errors.js:200-231
        if stack:
            stack = list(stack)
            immediate = stack[-1]
            if (len(stack) >= 2 and stack[-2].short == ".extraArguments"
                    and immediate.index is not None):
                # special case for extra-argument errors (:209-217)
                self.message += (f"for the {jsval.ith(immediate.index)} extra "
                                 f"argument of the call.\n")
                stack = stack[:-2]
            elif immediate.long:
                self.message += f"{immediate.long}\n"
                stack = stack[:-1]
            if stack:
                shorts = "".join(f.short for f in stack)
                self.message += f"at position {shorts}\nin contract:\n{contract_str}\n"
        return self

    def full_value(self, data: Any, stack_nonempty: bool) -> "MessageBuilder":
        # contract-errors.js:182-198.  NOTE the reference's `!self.expected`
        # guard never fires: `expected` is a prototype METHOD (truthy) until
        # overwritten, so the full value prints iff the stack is nonempty.
        if callable(data):
            return self
        if stack_nonempty:
            self.message += (
                f"The full value being checked was:\n{jsval.inspect(data)}\n"
            )
        return self


@dataclass
class Violation:
    """Structured per-row validation failure — the engine's analogue of a
    thrown ContractError.  `message` reproduces the reference wording."""

    message: str
    expected: Optional[str] = None
    got: Optional[str] = None
    path: str = ""  # joined short frames, e.g. ".playunit.ladders[1].size"
    contract_name: str = ""
    blame: str = ""

    def __str__(self) -> str:  # pragma: no cover
        return self.message


class RowContractError(Exception):
    """Raised by the row interpreter on the first failing check (the
    reference throws on first error — contract.impl.js:108-111)."""

    def __init__(self, violation: Violation):
        self.violation = violation
        super().__init__(violation.message)

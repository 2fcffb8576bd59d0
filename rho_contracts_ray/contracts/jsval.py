"""JS-value semantics over Python values.

The reference (rho-contracts) validates JavaScript values; our engine validates
Arrow table rows.  When a row is pulled out of an Arrow batch for message
rendering it becomes a Python value (str / int / float / bool / None /
list / dict / datetime).  This module re-expresses the JS type predicates the
reference relies on (underscore.js `_.isString` etc., used at
reference src/contract.impl.js:328-349) and Node's `util.inspect` rendering
(reference src/utils.js:59-65) over those Python values.

Key semantic notes (cited against the reference):
  * "missing" means null-or-undefined (utils.js:20-22).  Arrow has no
    `undefined`; `None` covers both.
  * `number` accepts NaN (contract.impl.js:331 — `_.isNumber(NaN)` is true).
  * `integer` is `Math.floor(v) === v` (contract.impl.js:334-337): floats with
    zero fraction pass, +/-Infinity passes, NaN fails, non-numbers fail
    (strict `===` never holds across types).
  * falsy = JS `!v`: false, 0, '', NaN, null, undefined
    (contract.impl.js:298-301).
  * booleans are NOT numbers (underscore `_.isNumber(true)` is false) — we must
    special-case `bool` because `isinstance(True, int)` holds in Python.
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from typing import Any, Optional

_IDENT_RE = re.compile(r"^[A-Za-z_$][A-Za-z0-9_$]*$")

# Sentinel for "field absent" when it matters to distinguish from None; the
# reference treats both identically via isMissing (utils.js:20-22).
MISSING = object()


def is_missing(v: Any) -> bool:
    """utils.js:20-22 — undefined or null."""
    return v is None or v is MISSING


def is_string(v: Any) -> bool:
    return isinstance(v, str)


def is_number(v: Any) -> bool:
    """JS number: int/float but never bool (underscore _.isNumber)."""
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def is_bool(v: Any) -> bool:
    return isinstance(v, bool)


def is_integerlike(v: Any) -> bool:
    """contract.impl.js:334-337 — Math.floor(v) === v."""
    if isinstance(v, bool):
        return False  # Math.floor(true)=1, 1===true is false
    if isinstance(v, int):
        return True
    if isinstance(v, float):
        if math.isnan(v):
            return False  # NaN !== NaN
        if math.isinf(v):
            return True  # Math.floor(Infinity) === Infinity
        return math.floor(v) == v
    return False  # strict === across types never holds


def is_date(v: Any) -> bool:
    return isinstance(v, (_dt.datetime, _dt.date))


def is_array(v: Any) -> bool:
    return isinstance(v, (list, tuple))


def is_object(v: Any) -> bool:
    """underscore _.isObject: objects, arrays, functions, dates — not
    primitives/null.  (contract.impl.js:649 uses this as `object`'s
    firstChecker; note a JS array IS an object.)"""
    return isinstance(v, (dict, list, tuple, _dt.datetime, _dt.date)) or callable(v)


def is_falsy(v: Any) -> bool:
    """JS `!v` (contract.impl.js:298-301)."""
    if v is None or v is MISSING:
        return True
    if isinstance(v, bool):
        return not v
    if isinstance(v, (int, float)):
        return v == 0 or (isinstance(v, float) and math.isnan(v))
    if isinstance(v, str):
        return v == ""
    return False  # objects/arrays/dates are always truthy in JS


def is_truthy(v: Any) -> bool:
    return not is_falsy(v)


def strict_eq(a: Any, b: Any) -> bool:
    """JS `===` between a Python-ified row value `a` and a contract-spec
    constant `b` (used by oneOf/value, contract.impl.js:308-326).

    NaN === NaN is false; 5 === 5.0 is true (JS has one number type);
    true === 1 is false; objects compare by identity (never equal for values
    deserialized from Arrow)."""
    if isinstance(b, bool) or isinstance(a, bool):
        return (isinstance(a, bool) and isinstance(b, bool)) and a is b
    if b is None:
        return a is None or a is MISSING
    if is_number(a) and is_number(b):
        if (isinstance(a, float) and math.isnan(a)) or (
            isinstance(b, float) and math.isnan(b)
        ):
            return False
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def _fmt_number(v: Any) -> str:
    """JS Number->string: 5.0 renders `5`, -0.0 renders `-0`, NaN/Infinity
    by name, decimal notation for exponents in (-7, 21), else e-notation."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == 0:
            return "-0" if math.copysign(1.0, v) < 0 else "0"
        if v == math.floor(v) and abs(v) < 1e21:
            return str(int(v))
        exp = math.floor(math.log10(abs(v)))
        if -7 < exp < 21:
            import numpy as _np
            return _np.format_float_positional(v, unique=True, trim="-")
        import numpy as _np
        s = _np.format_float_scientific(v, unique=True, trim="-")
        mant, e = s.split("e")
        if mant.endswith("."):
            mant = mant[:-1]
        sign = "+" if int(e) >= 0 else "-"
        return f"{mant}e{sign}{abs(int(e))}"
    return str(v)


# -- faithful port of node's util.inspect (v20, compact=3, breakLength=80) --

_KEY_RE = re.compile(r"^[a-zA-Z_][a-zA-Z_0-9]*$")
_ESCAPES = {8: "\\b", 9: "\\t", 10: "\\n", 11: "\\v", 12: "\\f", 13: "\\r",
            92: "\\\\"}
_MIN_LINE_LENGTH = 16


_ESCAPE_TEST = re.compile(r"[\x00-\x1f'\\\x7f-\x9f]")
_ESCAPE_TEST_NO_QUOTE = re.compile(r"[\x00-\x1f\\\x7f-\x9f]")


def _str_escape(s: str) -> str:
    """node strEscape: quote choice (single -> double -> backtick) plus
    control-char escaping.  Fast path mirrors node's: if nothing needs
    escaping, just add quotes (matters when rendering large content
    strings into violation messages)."""
    quote = "'"
    if "'" in s:
        if '"' not in s:
            quote = '"'
        elif "`" not in s and "${" not in s:
            quote = "`"
    test = _ESCAPE_TEST if quote == "'" else _ESCAPE_TEST_NO_QUOTE
    if test.search(s) is None:
        return quote + s + quote
    out = []
    for ch in s:
        p = ord(ch)
        if ch == quote or p == 92 or p < 32 or (126 < p < 160):
            if p in _ESCAPES and ch != quote:
                out.append(_ESCAPES[p])
            elif ch == quote:
                out.append("\\" + quote)
            elif p in _ESCAPES:
                out.append(_ESCAPES[p])
            else:
                out.append(f"\\x{p:02x}")
        else:
            out.append(ch)
    return quote + "".join(out) + quote


class _Ctx:
    __slots__ = ("indentation_lvl", "current_depth", "depth", "break_length",
                 "compact", "max_array_length", "max_string_length")

    def __init__(self, depth: int):
        self.indentation_lvl = 0
        self.current_depth = 0
        self.depth = depth
        self.break_length = 80
        self.compact = 3
        self.max_array_length = 100
        self.max_string_length = 10000


def _format_string(ctx: _Ctx, s: str) -> str:
    trailer = ""
    if len(s) > ctx.max_string_length:
        remaining = len(s) - ctx.max_string_length
        s = s[: ctx.max_string_length]
        trailer = f"... {remaining} more character{'s' if remaining > 1 else ''}"
    if (len(s) > _MIN_LINE_LENGTH
            and len(s) > ctx.break_length - ctx.indentation_lvl - 4):
        # split after every newline (node formatPrimitive)
        lines = re.split(r"(?<=\n)", s)
        if lines and lines[-1] == "":
            lines.pop()
        if len(lines) > 1:
            sep = " +\n" + " " * (ctx.indentation_lvl + 2)
            return sep.join(_str_escape(ln) for ln in lines) + trailer
    return _str_escape(s) + trailer


def _format_primitive(ctx: _Ctx, v: Any) -> str:
    if v is MISSING:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if is_number(v):
        return _fmt_number(v)
    if isinstance(v, str):
        return _format_string(ctx, v)
    if isinstance(v, bytes):
        hexpairs = " ".join(f"{b:02x}" for b in v[:50])
        more = f" ... {len(v) - 50} more bytes" if len(v) > 50 else ""
        return f"<Buffer {hexpairs}{more}>"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.") + f"{v.microsecond // 1000:03d}Z"
    if isinstance(v, _dt.date):
        return v.isoformat()
    return repr(v)


def _is_below_break_length(ctx: _Ctx, output: list[str], start: int, base: str) -> bool:
    total = len(output) + start
    if total + len(output) > ctx.break_length:
        return False
    for e in output:
        total += len(e)
        if total > ctx.break_length:
            return False
    return base == "" or "\n" not in base


def _group_array_elements(ctx: _Ctx, output: list[str], value) -> list[str]:
    """node groupArrayElements — column-packs short array entries."""
    total_length = 0
    max_length = 0
    output_length = len(output)
    has_more = False
    if value is not None and ctx.max_array_length < len(value):
        output_length -= 1  # exclude the "... n more items" entry
        has_more = True
    separator_space = 2
    data_len = [0] * output_length
    for i in range(output_length):
        ln = len(output[i])
        data_len[i] = ln
        total_length += ln + separator_space
        if max_length < ln:
            max_length = ln
    actual_max = max_length + separator_space
    if (actual_max * 3 + ctx.indentation_lvl < ctx.break_length
            and (total_length / actual_max > 5 or max_length <= 6)):
        approx_char_heights = 2.5
        average_bias = math.sqrt(actual_max - total_length / len(output))
        biased_max = max(actual_max - 3 - average_bias, 1)
        columns = min(
            _js_round(math.sqrt(approx_char_heights * biased_max * output_length)
                      / biased_max),
            (ctx.break_length - ctx.indentation_lvl) // actual_max,
            ctx.compact * 4,
            15,
        )
        if columns <= 1:
            return output
        tmp = []
        max_line_length = []
        for i in range(columns):
            line_max = 0
            j = i
            while j < output_length:
                if data_len[j] > line_max:
                    line_max = data_len[j]
                j += columns
            max_line_length.append(line_max + separator_space)
        # padStart for all-number arrays, else padEnd
        pad_start = True
        if value is not None:
            for item in value:
                if not (isinstance(item, (int, float)) and not isinstance(item, bool)):
                    pad_start = False
                    break
        else:
            pad_start = False
        i = 0
        while i < output_length:
            mx = min(i + columns, output_length)
            line = ""
            j = i
            while j < mx - 1:
                padding = max_line_length[j - i]
                cell = output[j] + ", "
                line += cell.rjust(padding) if pad_start else cell.ljust(padding)
                j += 1
            if pad_start:
                padding = max_line_length[j - i] - separator_space
                line += output[j].rjust(padding)
            else:
                line += output[j]
            tmp.append(line)
            i += columns
        if has_more:
            tmp.append(output[output_length])
        output = tmp
    return output


def _js_round(x: float) -> int:
    return math.floor(x + 0.5)


def _reduce_to_single_string(ctx: _Ctx, output: list[str], base: str,
                             braces: tuple[str, str], is_array: bool,
                             recurse: int, value) -> str:
    entries = len(output)
    if is_array and entries > 6:
        output = _group_array_elements(ctx, output, value)
    if ctx.current_depth - recurse < ctx.compact and entries == len(output):
        start = len(output) + ctx.indentation_lvl + len(braces[0]) + len(base) + 10
        if _is_below_break_length(ctx, output, start, base):
            joined = ", ".join(output)
            if "\n" not in joined:
                return ((f"{base} " if base else "") + braces[0] + " "
                        + joined + " " + braces[1])
    indentation = "\n" + " " * ctx.indentation_lvl
    return ((f"{base} " if base else "") + braces[0] + indentation + "  "
            + f",{indentation}  ".join(output) + indentation + braces[1])


def _format_raw(ctx: _Ctx, v: Any, recurse: int) -> str:
    is_array = isinstance(v, (list, tuple))
    if recurse > ctx.depth:
        return "[Array]" if is_array else "[Object]"
    ctx.current_depth = recurse
    output: list[str] = []
    if is_array:
        n = min(len(v), ctx.max_array_length)
        for i in range(n):
            ctx.indentation_lvl += 2
            output.append(_format_value(ctx, v[i], recurse + 1))
            ctx.indentation_lvl -= 2
        remaining = len(v) - n
        if remaining > 0:
            output.append(f"... {remaining} more item{'s' if remaining > 1 else ''}")
        if not output:
            return "[]"
        return _reduce_to_single_string(ctx, output, "", ("[", "]"), True,
                                        recurse, list(v))
    # dict
    if not v:
        return "{}"
    for k in js_key_order(v.keys()):
        vv = v[k]
        ctx.indentation_lvl += 2
        s = _format_value(ctx, vv, recurse + 1)
        ctx.indentation_lvl -= 2
        key = k if isinstance(k, str) and _KEY_RE.match(k) else _str_escape(str(k))
        output.append(f"{key}: {s}")
    return _reduce_to_single_string(ctx, output, "", ("{", "}"), False,
                                    recurse, None)


def _format_value(ctx: _Ctx, v: Any, recurse: int) -> str:
    if isinstance(v, (dict, list, tuple)):
        return _format_raw(ctx, v, recurse)
    import types as _types

    if callable(v) and not isinstance(v, type):
        # node util.inspect function rendering.  JS has no callable
        # non-function objects, so for a Python instance with __call__
        # parity is undefined — render it as an anonymous function, which
        # is DETERMINISTIC (the repr fallback would embed a memory
        # address, breaking byte-identical violation outputs).
        if isinstance(v, (_types.FunctionType, _types.BuiltinFunctionType,
                          _types.MethodType)):
            name = getattr(v, "__name__", "")
            if name and name != "<lambda>":
                return f"[Function: {name}]"
        return "[Function (anonymous)]"
    return _format_primitive(ctx, v)


_INSPECT_DEPTH = 5  # utils.js:53 errorMessageInspectionDepth


def set_error_message_inspection_depth(depth: int) -> None:
    """utils.js:55-57 / contract.impl.js:23 — global rendering depth for
    values in error messages."""
    global _INSPECT_DEPTH
    _INSPECT_DEPTH = depth


def inspect(v: Any, depth: Optional[int] = None) -> str:
    """Faithful re-implementation of Node `util.inspect(v, false, depth,
    false)` — the value renderer behind every error message (reference
    src/utils.js:59-65).  Verified against the real node binary by the
    inspect-parity tests."""
    if depth is None:
        depth = _INSPECT_DEPTH
    return _format_value(_Ctx(depth), v, 0)


_INT_KEY_RE = re.compile(r"^(0|[1-9][0-9]*)$")


def js_key_order(keys) -> list:
    """JS property enumeration order: canonical integer keys ascending
    first, then the rest in insertion order."""
    keys = list(keys)
    ints = [k for k in keys if isinstance(k, str) and _INT_KEY_RE.match(k)]
    rest = [k for k in keys if not (isinstance(k, str) and _INT_KEY_RE.match(k))]
    return sorted(ints, key=int) + rest


def ith(i: int) -> str:
    """utils.js:39-51 — 0-based index to '1st'/'2nd'/'3rd'/'Nth' ordinal.
    (Note the reference's quirk: purely `% 10`, so 11 -> '12nd'.)"""
    i += 1
    m = i % 10
    if m == 1:
        return f"{i}st"
    if m == 2:
        return f"{i}nd"
    if m == 3:
        return f"{i}rd"
    return f"{i}th"

"""Vectorized verdict compiler: contract AST × Arrow column → boolean mask.

This is the engine's hot path.  Where the reference interprets one JS value
at a time (reference src/contract.impl.js:30-63), we evaluate a whole Arrow
column per contract node with `pyarrow.compute` kernels — zero-copy from the
object store inside `Dataset.map_batches(batch_format="pyarrow")`.

Invariant (property-tested): for every row r,
    mask[r] == interp.check_verdict(contract, row_value(r))[0]

Message rendering for failing rows is NOT done here — failing rows are
sparse, so `validate.py` pulls only those rows out and runs the row
interpreter on them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import ast


# -- small helpers -----------------------------------------------------------


def _np_bool(arr) -> np.ndarray:
    """Arrow boolean array (possibly with nulls) -> numpy bool, null=False."""
    if isinstance(arr, np.ndarray):
        return arr.astype(bool, copy=False)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, False)
    return arr.to_numpy(zero_copy_only=False).astype(bool, copy=False)


def _valid(col: pa.Array) -> np.ndarray:
    return _np_bool(pc.is_valid(col))


def _is_null(col: pa.Array) -> np.ndarray:
    return _np_bool(pc.is_null(col))


def _zeros(n: int) -> np.ndarray:
    return np.zeros(n, dtype=bool)


def _ones(n: int) -> np.ndarray:
    return np.ones(n, dtype=bool)


def _is_num_type(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_decimal(t))


def _is_str_type(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _is_list_type(t: pa.DataType) -> bool:
    return (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t))


def _list_lens(col: pa.Array) -> np.ndarray:
    lens = pc.fill_null(pc.list_value_length(col), 0)
    return lens.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _segment_all(child_ok: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-row 'all items pass' over flattened child verdicts, via cumsum
    against the list offsets — no Python loop."""
    cs = np.concatenate(([0], np.cumsum(child_ok.astype(np.int64))))
    ends = np.cumsum(lens)
    starts = ends - lens
    return (cs[ends] - cs[starts]) == lens


# -- the compiler ------------------------------------------------------------


def eval_mask(node: ast.Contract, col: pa.Array) -> np.ndarray:
    """Verdict mask for `node` over `col`, honoring `.optional()`
    (missing==null accepted — contract.impl.js:31, utils.js:20-22)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(node, ast.CyclicC):
        node = node.resolved()  # schema depth is finite; recursion terminates
    if pa.types.is_dictionary(col.type):
        col = col.dictionary_decode()
    core = _core_mask(node, col)
    if node.is_optional:
        return _is_null(col) | core
    return core


def _core_mask(node: ast.Contract, col: pa.Array) -> np.ndarray:
    t = col.type
    n = len(col)
    nt = type(node)

    if nt is ast.AnyC:
        return _ones(n)
    if nt is ast.NothingC:
        return _zeros(n)

    if nt is ast.StringC:
        return _valid(col) if _is_str_type(t) else _zeros(n)
    if nt is ast.NumberC:
        # NaN is a number (contract.impl.js:331)
        return _valid(col) if _is_num_type(t) else _zeros(n)
    if nt is ast.IntegerC:
        if pa.types.is_integer(t):
            return _valid(col)
        if pa.types.is_floating(t):
            # Math.floor(v) === v; NaN fails (NaN != NaN), +-inf passes
            return _valid(col) & _np_bool(pc.equal(pc.floor(col), col))
        return _zeros(n)
    if nt is ast.BoolC:
        return _valid(col) if pa.types.is_boolean(t) else _zeros(n)
    if nt is ast.DateC:
        ok = (pa.types.is_timestamp(t) or pa.types.is_date(t))
        return _valid(col) if ok else _zeros(n)

    if nt is ast.FalsyC:
        return _falsy_mask(col)
    if nt is ast.TruthyC:
        return ~_falsy_mask(col)

    if nt in (ast.OneOfC, ast.ValueC):
        return _oneof_mask(node, col)

    if nt is ast.MatchesC:
        if not _is_str_type(t):
            return _zeros(n)
        try:
            m = pc.match_substring_regex(
                col, node.pattern, ignore_case=("i" in node.flags)
            )
            return _valid(col) & _np_bool(m)
        except pa.ArrowInvalid:
            # pattern outside RE2's dialect — python re fallback
            rx = node.compiled
            vals = col.to_pylist()
            return np.fromiter(
                (v is not None and rx.search(v) is not None for v in vals),
                dtype=bool, count=n,
            )

    if nt is ast.PredC:
        if node.vectorized_fn is not None:
            return _np_bool(node.vectorized_fn(col))
        from . import jsval
        vals = col.to_pylist()
        return np.fromiter(
            (jsval.is_truthy(node.fn(v)) for v in vals), dtype=bool, count=n
        )

    if nt is ast.AndC:
        m = _ones(n)
        for c in node.contracts:
            m &= eval_mask(c, col)
        return m
    if nt is ast.OrC:
        m = _zeros(n)
        for c in node.contracts:
            m |= eval_mask(c, col)
        return m

    if nt is ast.ArrayC:
        if not _is_list_type(t):
            return _zeros(n)
        lens = _list_lens(col)
        flat = pc.list_flatten(col)  # values under valid rows only
        child_ok = eval_mask(node.item, flat)
        return _valid(col) & _segment_all(child_ok, lens)

    if nt is ast.TupleC:
        if not _is_list_type(t):
            return _zeros(n)
        k = len(node.contracts)
        lens = _list_lens(col)
        ok = _valid(col) & ((lens == k) if node.is_strict else (lens >= k))
        if not ok.any() or k == 0:
            return ok
        flat = pc.list_flatten(col)
        ends = np.cumsum(lens)
        starts = ends - lens
        rows = np.nonzero(ok)[0]
        m = ok.copy()
        for i, ci in enumerate(node.contracts):
            idx = pa.array(starts[rows] + i, type=pa.int64())
            vals = pc.take(flat, idx)
            m[rows] &= eval_mask(ci, vals)
        return m

    if nt is ast.HashC:
        if pa.types.is_map(t):
            return _map_values_mask(node.value_contract, col)
        if pa.types.is_struct(t):
            # a JS object IS a hash: every (present) value must pass.  An
            # Arrow struct row always carries all fields, so a null field is
            # "present with value null" — the value contract sees the null.
            m = _valid(col)
            for f in t:
                m &= eval_mask(node.value_contract, col.field(f.name))
            return m
        if _is_list_type(t):
            # JS arrays are objects: hash iterates elements (_.each)
            lens = _list_lens(col)
            flat = pc.list_flatten(col)
            child_ok = eval_mask(node.value_contract, flat)
            return _valid(col) & _segment_all(child_ok, lens)
        return _zeros(n)

    if nt is ast.ObjectC:
        return _object_mask(node, col)

    if nt in (ast.RegexpC, ast.AnyFunctionC, ast.IsAC):
        return _zeros(n)  # no such values exist in Arrow tables

    if nt is ast.ContractLeafC:
        # contract instances never exist in Arrow tables, but the leaf
        # also accepts arrays and every non-object (impl.js:362-365):
        # only object-like values fail — structs/maps (JS objects) and
        # timestamps/dates (JS Date is _.isObject).  Nulls pass (JS
        # `_.isObject(null)` is false).
        t_ = col.type
        if (pa.types.is_struct(t_) or pa.types.is_map(t_)
                or pa.types.is_timestamp(t_) or pa.types.is_date(t_)):
            return _is_null(col)
        return _ones(n)

    raise NotImplementedError(f"no vectorized kernel for {nt.__name__}")


def _falsy_mask(col: pa.Array) -> np.ndarray:
    """JS `!v` per Arrow type (contract.impl.js:298-301)."""
    t = col.type
    n = len(col)
    if pa.types.is_null(t):
        return _ones(n)
    m = _is_null(col)
    if pa.types.is_boolean(t):
        m |= _np_bool(pc.equal(col, False))
    elif pa.types.is_floating(t):
        m |= _np_bool(pc.equal(col, 0.0)) | _np_bool(pc.is_nan(col))
    elif _is_num_type(t):
        m |= _np_bool(pc.equal(col, 0))
    elif _is_str_type(t):
        m |= _np_bool(pc.equal(col, ""))
    # objects/arrays/dates are always truthy in JS
    return m


def _oneof_mask(node, col: pa.Array) -> np.ndarray:
    """JS `===` membership (contract.impl.js:308-321): no cross-type
    coercion, NaN never matches, null only matches a null constant."""
    from . import jsval

    t = col.type
    n = len(col)
    m = _zeros(n)
    for v in node.values:
        if v is None:
            m |= _is_null(col)
        elif isinstance(v, bool):
            if pa.types.is_boolean(t):
                m |= _np_bool(pc.equal(col, v))
        elif jsval.is_number(v):
            if _is_num_type(t):
                import math
                if isinstance(v, float) and math.isnan(v):
                    continue  # NaN === NaN is false
                m |= _np_bool(pc.equal(col, v))
        elif isinstance(v, str):
            if _is_str_type(t):
                m |= _np_bool(pc.equal(col, v))
        # objects compare by identity — never equal to a deserialized value
    return m


def _field_mask(c: ast.Contract, child: pa.Array, required: bool) -> np.ndarray:
    """Field semantics of `object` (contract.impl.js:653-664): required
    fields must be non-missing (even if the contract itself would accept
    null, e.g. `falsy`); optional fields pass when missing."""
    if required:
        return _valid(child) & eval_mask(c, child)
    return _is_null(child) | eval_mask(c, child)


def _object_mask(node: ast.ObjectC, col: pa.Array) -> np.ndarray:
    t = col.type
    n = len(col)
    if pa.types.is_struct(t):
        m = _valid(col)
        child_names = [f.name for f in t]
        if node.is_strict:
            extra = [cn for cn in child_names if cn not in node.fields]
            if extra:
                return _zeros(n)  # every row has the extra field
        for fname, c in node.fields.items():
            if fname not in child_names:
                if not c.is_optional:
                    return _zeros(n)  # required field absent from schema
                continue
            child = col.field(fname)
            m &= _field_mask(c, child, required=not c.is_optional)
        return m
    if _is_list_type(t) or pa.types.is_map(t):
        # JS arrays/maps pass isObject; named fields read as undefined
        m = _valid(col)
        for fname, c in node.fields.items():
            if not c.is_optional:
                return _zeros(n)
        return m
    return _zeros(n)


def _map_values_mask(value_contract: ast.Contract, col: pa.Array) -> np.ndarray:
    """hash(valueC) over a map column: value kernel on the map's flattened
    item values, segment-reduced back to rows via the physical offsets
    (contract.impl.js:615-620).  pyarrow's list kernels don't accept maps,
    so we use the MapArray layout directly — still zero-copy."""
    m = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = m.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    items_ok = eval_mask(value_contract, m.items)
    cs = np.concatenate(([0], np.cumsum(items_ok.astype(np.int64))))
    starts = off[:-1]  # absolute offsets into the (full) items child
    ends = off[1:]
    all_ok = (cs[ends] - cs[starts]) == (ends - starts)
    return _valid(m) & all_ok


def table_to_struct(batch) -> pa.StructArray:
    """Zero-copy view of a Table/RecordBatch as a struct column so the
    top-level `object` contract evaluates uniformly."""
    if isinstance(batch, pa.Table):
        cols = [c.combine_chunks() for c in batch.columns]
        return pa.StructArray.from_arrays(cols, names=batch.column_names)
    return pa.StructArray.from_arrays(list(batch.columns), names=batch.schema.names)


def eval_table_mask(node: ast.Contract, batch) -> np.ndarray:
    """Verdict mask of a contract over a whole batch (each row = one object).
    Table rows always exist, so `isObject` trivially passes — matching
    check() on a plain JS object."""
    struct = table_to_struct(batch)
    return eval_mask(node, struct)

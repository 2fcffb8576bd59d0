"""Semi-structured (JSON string) column extraction.

The hot path has NO Python row loop: each batch's JSON column is turned
into one newline-delimited buffer with a single Arrow kernel
(`binary_join_element_wise` appends the '\\n'; the string array's
contiguous data buffer then IS the NDJSON stream) and handed to the
Arrow C++ JSON parser (`pyarrow.json.read_json`) with an explicit
schema, so output types are pinned even when a batch's values are all
null.  Rows that are null / blank parse as '{}' (all extracted fields
null — SQL `json_extract` semantics).  Malformed rows fall back to a
per-row `json.loads` pass for THAT batch only (documented slow path;
valid serializer output never takes it, since JSON strings escape
raw newlines).
"""

from __future__ import annotations

import io
import json
from typing import Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj


def _nested_schema(fields: Mapping[str, pa.DataType]) -> pa.Schema:
    """Build the explicit parse schema from dotted paths:
    {'a.b': int64} -> schema(a: struct<b: int64>)."""
    tree: dict = {}
    for path, typ in fields.items():
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = typ

    def build(node) -> pa.DataType:
        return pa.struct([
            pa.field(k, v if isinstance(v, pa.DataType) else build(v))
            for k, v in node.items()])

    return pa.schema([
        pa.field(k, v if isinstance(v, pa.DataType) else build(v))
        for k, v in tree.items()])


def _ndjson_buffer(col: pa.Array) -> io.BytesIO:
    filled = pc.fill_null(col, "{}")
    blank = pc.equal(pc.utf8_trim_whitespace(filled), "")
    filled = pc.if_else(blank, pa.scalar("{}"), filled)
    with_nl = pc.binary_join_element_wise(filled, "\n")
    if isinstance(with_nl, pa.ChunkedArray):
        with_nl = with_nl.combine_chunks()
    odt = np.int64 if pa.types.is_large_string(with_nl.type) else np.int32
    o = np.frombuffer(with_nl.buffers()[1], dtype=odt,
                      count=len(with_nl) + 1 + with_nl.offset)
    start = int(o[with_nl.offset])
    end = int(o[with_nl.offset + len(with_nl)])
    return io.BytesIO(with_nl.buffers()[2].slice(start, end - start))


def _extract_columns(parsed: pa.Table,
                     fields: Mapping[str, pa.DataType]) -> dict:
    out = {}
    for path, typ in fields.items():
        parts = path.split(".")
        col = parsed[parts[0]]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for p in parts[1:]:
            col = pc.struct_field(col, p)
        out[path.replace(".", "_")] = col.cast(typ)
    return out


def _try_cast(v, typ):
    """TRY_CAST semantics per value (DuckDB parity: numeric strings cast
    with round-half-away-from-zero, 'true' does NOT cast to int, any
    mismatch yields null instead of raising)."""
    import math

    if v is None:
        return None
    if pa.types.is_integer(typ):
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            return v
        if isinstance(v, float):
            if not math.isfinite(v):
                return None
            return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
        if isinstance(v, str):
            s = v.strip()
            try:
                return int(s)
            except ValueError:
                try:
                    f = float(s)
                except ValueError:
                    return None
                if not math.isfinite(f):
                    return None
                return math.floor(f + 0.5) if f >= 0 \
                    else math.ceil(f - 0.5)
        return None
    if pa.types.is_floating(typ):
        if isinstance(v, bool):
            return None
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, str):
            try:
                return float(v.strip())
            except ValueError:
                return None
        return None
    if pa.types.is_string(typ):
        if isinstance(v, str):
            return v
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return json.dumps(v)
        return json.dumps(v, separators=(",", ":"))
    try:
        return pa.scalar(v, typ).as_py()
    except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError):
        return None


def _slow_extract(col: pa.Array,
                  fields: Mapping[str, pa.DataType]) -> dict:
    """Row-at-a-time fallback with per-VALUE TRY_CAST: a single
    type-mismatched row nulls only its own cell — never the task."""
    vals = []
    for s in col.to_pylist():
        try:
            v = json.loads(s) if s and s.strip() else {}
        except (ValueError, TypeError):
            v = {}
        vals.append(v if isinstance(v, dict) else {})
    out = {}
    for path, typ in fields.items():
        parts = path.split(".")
        cells = []
        for v in vals:
            cur = v
            for p in parts:
                cur = cur.get(p) if isinstance(cur, dict) else None
            cells.append(_try_cast(cur, typ))
        out[path.replace(".", "_")] = pa.array(cells, typ)
    return out


def json_extract(ds_or_table, json_col: str,
                 fields: Mapping[str, pa.DataType],
                 keep_cols: tuple = ()):
    """Extract typed fields from a JSON string column.

    `fields` maps dotted paths to Arrow types ({'user.id': pa.int64()});
    output column names replace '.' with '_'.  Null / blank / malformed
    JSON yields null for every extracted field — matching SQL
    `json_extract` + TRY_CAST.  Pure streaming map_batches: no shuffle,
    no state."""
    schema = _nested_schema(fields)
    popts = pj.ParseOptions(explicit_schema=schema,
                            unexpected_field_behavior="ignore")

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[json_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols = {c: batch[c] for c in keep_cols}
        try:
            parsed = pj.read_json(_ndjson_buffer(col), parse_options=popts)
            if parsed.num_rows != batch.num_rows:
                raise ValueError("row drift (embedded newline?)")
            cols.update(_extract_columns(parsed, fields))
        except (pa.ArrowInvalid, ValueError):
            # a type-mismatched value anywhere in the batch lands here:
            # per-value TRY_CAST keeps the task alive and nulls only the
            # offending cells (SQL parity)
            cols.update(_slow_extract(col, fields))
        return pa.table(cols)

    if isinstance(ds_or_table, pa.Table):
        return fn(ds_or_table)
    return ds_or_table.map_batches(fn, batch_format="pyarrow")

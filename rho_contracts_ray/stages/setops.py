"""SQL set operations and UNNEST as distributed stages.

The reference has no multi-row operators; these are the relational
complements of the dedup/constraint family (SURVEY.md §2.6 "ours to
scale"): INTERSECT / EXCEPT with SQL DISTINCT-set semantics (bag -> set,
NULLs compare equal, as in ANSI set operations), and list-column UNNEST
with ordinality.

Scale shape, set ops: each input batch first reduces to its DISTINCT key
rows plus two int8 presence flags, so the exchange moves one short row
per distinct combination per batch — never the raw bag; one bucketed
exchange co-locates equal rows, and the bucket body is a single Arrow
group_by taking flag maxima.  UNNEST is a pure streaming flat-map
(list offsets -> parent-index take), no exchange at all.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _distinct_flagged(ds, cols: Sequence[str], in_a: bool):
    flags = (1, 0) if in_a else (0, 1)

    def fn(batch: pa.Table) -> pa.Table:
        d = batch.select(list(cols)).group_by(list(cols)).aggregate([])
        n = d.num_rows
        return d.append_column(
            "__a", pa.array(np.full(n, flags[0], np.int8))) \
            .append_column("__b", pa.array(np.full(n, flags[1], np.int8)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _set_op(a, b, cols: Sequence[str], keep):
    """Shared INTERSECT/EXCEPT body: `keep(has_a, has_b) -> bool mask`."""
    from .agg import bucketed_apply

    cols = list(cols)
    both = _distinct_flagged(a, cols, True) \
        .union(_distinct_flagged(b, cols, False))

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(cols).aggregate([("__a", "max"), ("__b", "max")])
        mask = keep(pc.equal(g["__a_max"], 1), pc.equal(g["__b_max"], 1))
        return g.filter(mask).select(cols)

    def make_empty() -> pa.Table:
        schema = a.schema()
        if schema is None:
            return pa.table({})
        return pa.table({c: pa.array([], schema.base_schema.field(c).type)
                         for c in cols})

    return bucketed_apply(both, cols, finish, make_empty)


def intersect_distinct(a, b, cols: Sequence[str]):
    """SQL `SELECT cols FROM a INTERSECT SELECT cols FROM b` — distinct
    rows present in BOTH inputs (NULLs compare equal, set semantics)."""
    return _set_op(a, b, cols, pc.and_)


def except_distinct(a, b, cols: Sequence[str]):
    """SQL `SELECT cols FROM a EXCEPT SELECT cols FROM b` — distinct rows
    of `a` absent from `b` (NULLs compare equal, set semantics)."""
    return _set_op(a, b, cols,
                   lambda ha, hb: pc.and_(ha, pc.invert(hb)))


def unnest_list(ds, list_col: str, out_col: Optional[str] = None,
                pos_col: Optional[str] = None):
    """UNNEST a list column: one output row per element, other columns
    repeated; rows with null or empty lists vanish (SQL UNNEST).  With
    `pos_col`, adds the 1-based element ordinal (SQL WITH ORDINALITY /
    DuckDB generate_subscripts).  Pure streaming flat-map — list offsets
    drive a vectorized parent-index take, no exchange, no Python loop."""
    out_col = out_col or list_col

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parents = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        out = batch.drop_columns([list_col]).take(parents)
        out = out.append_column(out_col, flat)
        if pos_col:
            p = parents.to_numpy(zero_copy_only=False)
            if p.size:
                starts = np.flatnonzero(
                    np.concatenate(([True], p[1:] != p[:-1])))
                lens = np.diff(np.append(starts, p.size))
                pos = np.arange(p.size, dtype=np.int64) \
                    - np.repeat(starts, lens) + 1
            else:
                pos = np.zeros(0, np.int64)
            out = out.append_column(pos_col, pa.array(pos))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def unpivot(ds, id_cols: Sequence[str], value_cols: Sequence[str],
            name_col: str = "name", value_col: str = "value",
            cast_to=None):
    """UNPIVOT / melt: one output row per (input row, value column) ->
    id_cols + (name_col, value_col).  SQL equivalent: a UNION ALL of one
    SELECT per value column (DuckDB's UNPIVOT sugar).  `cast_to` unifies
    heterogeneous value column types (pa.float64() typical); None keeps
    the native type (columns must then share one type).  Pure streaming
    map — output is |value_cols| x input rows with no exchange; nulls
    pass through as null measure rows (SQL UNPIVOT *excludes* NULLs only
    with EXCLUDE NULLS — this op keeps them, matching plain UNION ALL)."""
    id_cols, value_cols = list(id_cols), list(value_cols)
    if not value_cols:
        raise ValueError("unpivot: need at least one value column")

    def fn(batch: pa.Table) -> pa.Table:
        outs = []
        for c in value_cols:
            v = batch[c]
            if cast_to is not None:
                v = pc.cast(v, cast_to)
            outs.append(pa.table({
                **{k: batch[k] for k in id_cols},
                name_col: pa.array([c] * batch.num_rows, pa.string()),
                value_col: v}))
        return pa.concat_tables(outs)

    return ds.map_batches(fn, batch_format="pyarrow")

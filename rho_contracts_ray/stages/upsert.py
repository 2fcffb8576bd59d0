"""Changeset apply (CDC upsert / SQL MERGE): apply a table of keyed
insert/update/delete operations to a base snapshot, distributed.

Semantics (the SQL-oracle form): with unique keys on both sides,

* base rows whose key appears in the changeset are REPLACED (op 'U'/'I')
  or REMOVED (op 'D');
* changeset rows with op != 'D' appear in the output (an update whose
  key is absent from the base behaves as an insert — MERGE "when not
  matched then insert" with identical payload).

Scale shape: neither side broadcasts.  Both streams carry a key-hash
column and union into ONE stream (base rows get a null op) that the
bucketed exchange (stages/distagg.py) co-partitions, so each bucket task
holds every row of its key range from both sides and resolves locally
with one Arrow `is_in` — no sort shuffle, no driver materialization.
At 100 TB the output is written per-bucket; only block refs move.

Beyond-reference op (rho-contracts has no dataset mutation surface);
pairs with the row-grain snapshot diff in constraints/diff.py — diff
produces exactly the changeset shape this stage consumes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64

_KH = "__upsert_kh"
_OP = "__upsert_op"


def _with_kh(t: pa.Table, key_col: str) -> pa.Table:
    col = t[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    kh = stable_hash64(col).view(np.int64)
    return t.append_column(_KH, pa.array(kh, pa.int64()))


def apply_changeset(base, changes, key_col: str, op_col: str = "op",
                    n_buckets: Optional[int] = None):
    """Apply `changes` (base schema + `op_col` in {'I','U','D'}) to
    `base`; keys must be unique within each side.  Returns a Dataset
    with the base schema; block order is arbitrary (per-bucket)."""
    base_schema = base.schema()   # ray Schema: .names + .types (Arrow)
    cols = list(base_schema.names)
    col_types = dict(zip(base_schema.names, base_schema.types))
    if key_col not in cols:
        raise ValueError(f"apply_changeset: key {key_col!r} not in base "
                         f"columns {cols}")

    def prep_base(t: pa.Table) -> pa.Table:
        t = _with_kh(t, key_col)
        return t.append_column(
            _OP, pa.nulls(t.num_rows, pa.string()))

    def prep_changes(t: pa.Table) -> pa.Table:
        missing = [c for c in cols if c not in t.column_names]
        if missing:
            raise ValueError(f"apply_changeset: changeset lacks base "
                             f"columns {missing}")
        # a null or unknown op would silently re-classify the row (null
        # -> treated as a BASE row; 'd' -> silent upsert) — fail loudly
        ok = pc.is_in(t[op_col], value_set=pa.array(["I", "U", "D"]))
        n_ok = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
        if n_ok != t.num_rows:
            raise ValueError(
                f"apply_changeset: {t.num_rows - n_ok} change rows have "
                f"an op outside {{'I','U','D'}} (nulls included)")
        t = _with_kh(t.select(cols + [op_col]), key_col)
        return t.rename_columns(cols + [_OP, _KH]) \
            .select(cols + [_KH, _OP])

    both = base.map_batches(prep_base, batch_format="pyarrow").union(
        changes.map_batches(prep_changes, batch_format="pyarrow"))

    def resolve(t: pa.Table) -> Optional[pa.Table]:
        if t.num_rows == 0:
            return None
        is_change = pc.is_valid(t[_OP])
        ch = t.filter(is_change)
        ba = t.filter(pc.invert(is_change))
        ch_keys = ch[key_col].combine_chunks() \
            if isinstance(ch[key_col], pa.ChunkedArray) else ch[key_col]
        keep_base = ba.filter(
            pc.invert(pc.is_in(ba[key_col], value_set=ch_keys))) \
            if ch.num_rows else ba
        surviving = ch.filter(pc.not_equal(ch[_OP], "D")) \
            if ch.num_rows else ch
        out = pa.concat_tables([keep_base.select(cols),
                                surviving.select(cols)])
        return out if out.num_rows else None

    from .distagg import bucketed_reduce, dataset_from_refs

    refs = bucketed_reduce(both, _KH, resolve, n_buckets=n_buckets,
                           as_refs=True)
    empty = pa.table({c: pa.array([], col_types[c]) for c in cols})
    return dataset_from_refs(refs, empty)


def incremental_group_agg(base, deltas, group_col: str, value_col: str,
                          dn_col: str = "dn", dsum_col: str = "dsum",
                          ndigits: Optional[int] = None):
    """Maintain ``GROUP BY group_col: count(*), sum(value_col)`` under a
    CDC delta stream WITHOUT re-scanning the merged table ->
    Dataset[group_col, n_rows, total].

    `base` is the raw snapshot (group_col + value_col); `deltas` is a
    Dataset of SIGNED per-group adjustments [group_col, dn_col, dsum_col]
    the caller derives from before/after CDC images (insert -> (+1, +v),
    delete -> (-1, -v_old), update -> a -row at the old group/value and a
    +row at the new — group moves included).  Base batches pre-combine to
    per-group partials, the delta rows are already partial-shaped, and
    both streams union into ONE cardinality-sized exchange — the merged
    table is never built, which is the point: at 100 TB the snapshot agg
    is computed once and each day's changeset costs only its own size.

    Float caveat: sums accumulate in a different order than a merged
    rescan and updates subtract; results agree with the recompute oracle
    to double rounding — pass `ndigits` to round `total` for value-exact
    comparison (validated vs DuckDB at sf0.01)."""
    from .agg import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col]).aggregate(
            [([], "count_all"), (value_col, "sum")])
        return pa.table({group_col: g[group_col],
                         dn_col: g["count_all"].cast(pa.int64()),
                         dsum_col: g[f"{value_col}_sum"]
                         .cast(pa.float64())})

    def conform(t: pa.Table) -> pa.Table:
        return pa.table({group_col: t[group_col],
                         dn_col: t[dn_col].cast(pa.int64()),
                         dsum_col: t[dsum_col].cast(pa.float64())})

    u = base.map_batches(partial, batch_format="pyarrow").union(
        deltas.map_batches(conform, batch_format="pyarrow"))
    out = bucketed_sum(u, [group_col], [dn_col, dsum_col])

    def finish(t: pa.Table) -> pa.Table:
        tot = t[dsum_col]
        if ndigits is not None:
            tot = pc.round(tot, ndigits=ndigits)
        keep = pc.not_equal(t[dn_col], 0)      # fully-deleted groups drop
        return pa.table({group_col: t[group_col],
                         "n_rows": t[dn_col],
                         "total": tot}).filter(keep)

    return out.map_batches(finish, batch_format="pyarrow")

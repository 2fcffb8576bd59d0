"""Referential-integrity constraint — `foreign_key(child -> dim)`
(SURVEY.md §2.6).

Scale design: the dimension side (repos_dim / commits_dim / customer...) is
orders of magnitude smaller than the fact side, so this is a BROADCAST
semi/anti join: the dim key set is `ray.put` into the object store ONCE and
each validator actor reads it ONCE in `__init__` — never re-shipped per
batch, no shuffle of the child table at all.  When the dimension itself is
too big to broadcast (billions of keys), `strategy="shuffle"` anti-joins
distinct-key partials from both sides on ONE bucketed exchange instead —
identical output, nothing broadcast.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import combine_key


def _dim_key_array(dim, dim_cols: Sequence[str],
                   combined: bool = True) -> pa.Array:
    """Distinct dim-side keys for membership tests.  Rows with ANY null
    key column are dropped — a null key matches nothing under SQL equality,
    and keeping them would let the combine_key null token ('\\N') falsely
    match a real value.  combined=False returns the single key column
    TYPED (no string combine) — callers with one key column keep the
    typed is_in fast path."""
    if isinstance(dim, pa.Table):
        t = dim
    else:  # ray Dataset — dimension tables are small; collect once
        import pyarrow as _pa
        parts = []
        for b in dim.iter_batches(batch_size=None, batch_format="pyarrow"):
            parts.append(b if isinstance(b, _pa.Table) else _pa.Table.from_batches([b]))
        t = _pa.concat_tables(parts) if parts else None
    if t is None or t.num_rows == 0:
        if combined:
            return pa.array([], type=pa.string())
        return pa.array([], type=(t.schema.field(dim_cols[0]).type
                                  if t is not None else pa.null()))
    mask = pc.is_valid(t[dim_cols[0]])
    for c in list(dim_cols)[1:]:
        mask = pc.and_(mask, pc.is_valid(t[c]))
    t = t.filter(mask)
    if not combined:
        col = t[dim_cols[0]]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.unique(col)
    return pc.unique(combine_key(t, list(dim_cols)))


class FKCheckStage:
    """Actor-pool stage holding the broadcast dim-key set (fetched from the
    object store once per actor)."""

    def __init__(self, keys_ref, child_cols: Sequence[str]):
        import ray

        keys = ray.get(keys_ref[0]) if isinstance(keys_ref, list) else keys_ref
        self.value_set = keys  # pa.Array of dim keys (typed when 1 column)
        self.child_cols = list(child_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.child_cols) == 1:
            # typed membership test — no string combine of the fact side
            key = batch[self.child_cols[0]]
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
        else:
            key = combine_key(batch, self.child_cols)
        dangling = pc.invert(pc.is_in(key, value_set=self.value_set))
        # null child keys are not FK violations (nullability is the row
        # contract's job) — mask out rows with any null key column
        for c in self.child_cols:
            dangling = pc.and_(dangling, pc.is_valid(batch[c]))
        sub = batch.select(self.child_cols).filter(pc.fill_null(dangling, False))
        return sub.group_by(self.child_cols).aggregate([([], "count_all")]) \
                  .rename_columns(self.child_cols + ["cnt"])


def fk_violations(child_ds, child_cols: Sequence[str], dim,
                  dim_cols: Optional[Sequence[str]] = None,
                  concurrency=None, strategy: str = "broadcast"):
    """Child rows whose key is absent from the dimension ->
    Dataset[child_cols..., cnt] of distinct dangling keys with counts.

    strategy="broadcast" (default): the dim key set is ray.put once and
    membership-tested per batch — right whenever the dim fits a worker
    heap.  strategy="shuffle": both-sides-large anti-join — per-batch
    distinct-key partials from BOTH sides ride one bucketed exchange
    co-partitioned on the key, and a key is a violation iff its bucket
    saw no dim row.  Nothing is broadcast, so a dimension with billions
    of keys (10^12-file corpus: the repo/commit dims) needs no
    worker-heap-sized key set anywhere.  Outputs are identical."""
    import ray

    dim_cols = list(dim_cols or child_cols)
    if strategy == "shuffle":
        return _fk_violations_shuffle(child_ds, list(child_cols), dim,
                                      dim_cols)
    if strategy != "broadcast":
        raise ValueError(f"fk_violations: unsupported strategy="
                         f"{strategy!r} (broadcast, shuffle)")
    keys = _dim_key_array(dim, dim_cols, combined=len(dim_cols) > 1)
    keys_ref = ray.put(keys)  # broadcast once

    from ..validate import stateless_stage

    partial = child_ds.map_batches(
        stateless_stage(FKCheckStage, keys_ref=[keys_ref],
                        child_cols=child_cols),
        batch_format="pyarrow",
    )
    from ..stages.agg import bucketed_sum

    # violating keys only reach this exchange — usually tiny, but an
    # all-dangling child is corpus-sized, so the total rides the same
    # sort-free bucketed exchange as every other grouped op
    return bucketed_sum(partial, list(child_cols), ["cnt"])


def _fk_violations_shuffle(child_ds, child_cols: list, dim,
                           dim_cols: list):
    """Both-sides-large FK: one bucketed exchange of distinct-key
    partials, exact anti-join inside each bucket.  The exchange moves
    one row per (batch, distinct key) from the child and one per
    (batch, distinct key) from the dim — raw rows and key SETS never
    concentrate anywhere."""
    import ray.data as rd

    from ..stages.agg import bucketed_apply

    def child_partial(batch: pa.Table) -> pa.Table:
        mask = pc.is_valid(batch[child_cols[0]])
        for c in child_cols[1:]:
            mask = pc.and_(mask, pc.is_valid(batch[c]))
        sub = batch.select(child_cols).filter(mask)
        g = sub.group_by(child_cols).aggregate([([], "count_all")]) \
            .rename_columns(child_cols + ["cnt"])
        return g.append_column(
            "is_dim", pa.array(np.zeros(g.num_rows, np.int8)))

    def dim_partial(batch: pa.Table) -> pa.Table:
        mask = pc.is_valid(batch[dim_cols[0]])
        for c in dim_cols[1:]:
            mask = pc.and_(mask, pc.is_valid(batch[c]))
        sub = batch.select(dim_cols).filter(mask)
        g = sub.group_by(dim_cols).aggregate([]) \
            .rename_columns(child_cols)
        return pa.table({
            **{c: g[c] for c in child_cols},
            "cnt": pa.array(np.zeros(g.num_rows, np.int64)),
            "is_dim": pa.array(np.ones(g.num_rows, np.int8))})

    if isinstance(dim, pa.Table):
        dim = rd.from_arrow(dim)
    keyed = child_ds.map_batches(child_partial, batch_format="pyarrow") \
        .union(dim.map_batches(dim_partial, batch_format="pyarrow"))

    def anti(t: pa.Table) -> pa.Table:
        g = t.group_by(child_cols).aggregate(
            [("cnt", "sum"), ("is_dim", "max")])
        viol = g.filter(pc.equal(g["is_dim_max"], pa.scalar(0, pa.int8())))
        return pa.table({**{c: viol[c] for c in child_cols},
                         "cnt": pc.cast(viol["cnt_sum"], pa.int64())})

    def make_empty() -> pa.Table:
        schema = child_ds.schema().base_schema
        return pa.table({
            **{c: pa.array([], schema.field(c).type) for c in child_cols},
            "cnt": pa.array([], pa.int64())})

    return bucketed_apply(keyed, child_cols, anti, make_empty)


def fk_violations_table(child: pa.Table, child_cols: Sequence[str],
                        dim: pa.Table, dim_cols: Optional[Sequence[str]] = None
                        ) -> pa.Table:
    """Local pyarrow path."""
    dim_cols = list(dim_cols or child_cols)
    keys = pc.unique(combine_key(dim, dim_cols))
    key = combine_key(child, list(child_cols))
    dangling = pc.invert(pc.is_in(key, value_set=keys))
    for c in child_cols:
        dangling = pc.and_(dangling, pc.is_valid(child[c]))
    sub = child.select(list(child_cols)).filter(pc.fill_null(dangling, False))
    return sub.group_by(list(child_cols)).aggregate([([], "count_all")]) \
              .rename_columns(list(child_cols) + ["cnt"])

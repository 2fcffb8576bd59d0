"""Snapshot diff: key-level comparison of two table snapshots — which
keys were ADDED, REMOVED, or CHANGED (any compared column differs,
null-aware) between an old and a new snapshot.

Scale shape: both snapshots are projected to (key + compared columns),
tagged with a side marker, unioned into ONE stream, and co-partitioned by
key hash through `stages.distagg.bucketed_reduce` — block references route
each hash range into its own reduce task, so no sort-based shuffle and
nothing lands on the driver (results stream out as a Dataset via
`from_arrow_refs`).  Inside a bucket the comparison is one Arrow full-outer
join + vectorized null-aware column compares.

This is the validation engine's drift check at ROW grain (the
distribution-level cousin is `constraints/drift.py`): run it between two
corpus snapshots to get the exact change set instead of a KS statistic.
Keys must be unique within each snapshot (primary-key diff); duplicates
raise rather than silently exploding the join.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _is_distinct(a, b):
    """SQL IS DISTINCT FROM, vectorized: differ when exactly one side is
    null, or both valid and unequal."""
    av, bv = pc.is_valid(a), pc.is_valid(b)
    both = pc.and_(av, bv)
    neq = pc.fill_null(pc.not_equal(a, b), False)
    return pc.or_(pc.xor(av, bv), pc.and_(both, neq))


def _diff_bucket(key_cols: Sequence[str], compare_cols: Sequence[str]):
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)

    def diff(t: pa.Table) -> pa.Table:
        old = t.filter(pc.equal(t["__side"], 0)) \
            .drop_columns(["__side", "__kh"])
        new = t.filter(pc.equal(t["__side"], 1)) \
            .drop_columns(["__side", "__kh"])
        for side, name in ((old, "old"), (new, "new")):
            nk = side.select(key_cols).group_by(key_cols) \
                .aggregate([([], "count_all")]).num_rows
            if nk != side.num_rows:
                raise ValueError(
                    f"snapshot_diff: {name} snapshot has duplicate keys "
                    f"({side.num_rows - nk} extra rows) — keys must be "
                    f"unique within each snapshot")
        old = old.append_column("__po", pa.array([1] * old.num_rows,
                                                 pa.int8()))
        new = new.append_column("__pn", pa.array([1] * new.num_rows,
                                                 pa.int8()))
        j = old.join(new, keys=key_cols, join_type="full outer",
                     right_suffix="__r")
        po, pn = pc.is_valid(j["__po"]), pc.is_valid(j["__pn"])
        import numpy as np
        changed = pa.array(np.zeros(j.num_rows, dtype=bool))
        for c in compare_cols:
            changed = pc.or_(changed, _is_distinct(j[c], j[f"{c}__r"]))
        status = pc.if_else(
            pc.invert(po), pa.scalar("added"),
            pc.if_else(pc.invert(pn), pa.scalar("removed"),
                       pc.if_else(changed, pa.scalar("changed"),
                                  pa.scalar("same"))))
        out = pa.table({**{c: j[c] for c in key_cols},
                        "status": status})
        return out.filter(pc.not_equal(out["status"], "same"))

    return diff


def _tag_and_hash(side: int, key_cols: Sequence[str]):
    from ..functions.hashing import combine_key, stable_hash64

    key_cols = list(key_cols)

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        kh = stable_hash64(combine_key(batch, key_cols))
        return batch.append_column(
            "__side", pa.array([side] * batch.num_rows, pa.int8())) \
            .append_column("__kh", pa.array(kh.view(np.int64)))

    return fn


def snapshot_diff(old_ds, new_ds, key_cols: Sequence[str],
                  compare_cols: Sequence[str],
                  n_buckets: Optional[int] = None):
    """Dataset of (key_cols..., status) for every key that was added,
    removed, or changed between ``old_ds`` and ``new_ds``; unchanged keys
    are omitted.  Both inputs are Datasets (or paths already read) with at
    least ``key_cols + compare_cols``; extra columns are ignored."""
    import ray.data as rd

    from ..stages.distagg import bucketed_reduce, dataset_from_refs

    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    cols = key_cols + compare_cols
    old_t = old_ds.select_columns(cols).map_batches(
        _tag_and_hash(0, key_cols), batch_format="pyarrow")
    new_t = new_ds.select_columns(cols).map_batches(
        _tag_and_hash(1, key_cols), batch_format="pyarrow")
    both = old_t.union(new_t)

    def make_empty() -> pa.Table:
        # schema-correct empty output, built only in the all-empty case
        # (old_ds.schema() on a mapped dataset executes a block)
        key_schema = old_ds.schema().base_schema
        types = {f.name: f.type for f in key_schema}
        return pa.table({**{c: pa.array([], types[c]) for c in key_cols},
                         "status": pa.array([], pa.string())})

    refs = bucketed_reduce(both, "__kh",
                           _diff_bucket(key_cols, compare_cols),
                           n_buckets=n_buckets, as_refs=True)
    return dataset_from_refs(refs, make_empty)

"""Global (no-PARTITION) ranking windows.

`rank() OVER (ORDER BY v)` across the WHOLE dataset is the one window
shape the per-key bucketed exchange can't serve (there is no partition
key to co-locate by), and sorting the corpus to number it is an
all-to-all range shuffle of every row.  This module instead rides the
column's DISTINCT values:

1. one streaming pass emits per-batch (value, cnt) distinct partials and
   a bucketed sum builds the global distinct-value count table — the
   only thing that ever shuffles, sized by the column's cardinality,
   not the corpus;
2. that table sorts by value (distinct-sized range shuffle);
3. per-block (rows, sum cnt) statistics are fetched in block order by
   tiny Ray tasks, prefix offsets are computed on the driver
   (n_blocks scalars — the one deliberate driver step), and
4. one task per block assigns dense_rank / rank / cume_cnt from its
   offsets — blocks never talk to each other.

Attaching the ranks back to rows is then an ordinary bucketed hash join
on the value (exact: equal doubles are bitwise equal).

Reference semantics (SQL): RANK = 1 + count of rows strictly below;
DENSE_RANK = 1 + count of distinct values strictly below; CUME_CNT =
count of rows <= value (cume_dist's numerator); nulls are EXCLUDED
(callers add them back as SQL's nulls-last block if needed).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote
def _block_stats(col: str, block) -> tuple:
    t = block if isinstance(block, pa.Table) \
        else pa.Table.from_batches([block])
    if t.num_rows == 0 or col not in t.column_names:
        return 0, 0
    s = pc.sum(t["cnt"]).as_py() or 0
    return t.num_rows, int(s)


@ray.remote
def _assign_ranks(dense_off: int, cnt_off: int, block) -> pa.Table:
    t = block if isinstance(block, pa.Table) \
        else pa.Table.from_batches([block])
    n = t.num_rows
    cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cume = cnt_off + np.cumsum(cnt)
    t = t.append_column(
        "dense_rank", pa.array(dense_off + np.arange(1, n + 1)))
    t = t.append_column("rank", pa.array(cume - cnt + 1))
    t = t.append_column("cume_cnt", pa.array(cume))
    return t


def _rank_table_local(vals: np.ndarray, cnts: np.ndarray,
                      value_col: str) -> pa.Table:
    """Ranks over an already-collected distinct (value, cnt) table —
    one vectorized pass, no Ray stages."""
    order = np.argsort(vals, kind="stable")
    v, c = vals[order], cnts[order].astype(np.int64)
    cume = np.cumsum(c)
    return pa.table({value_col: pa.array(v),
                     "cnt": pa.array(c),
                     "dense_rank": pa.array(
                         np.arange(1, v.size + 1, dtype=np.int64)),
                     "rank": pa.array(cume - c + 1),
                     "cume_cnt": pa.array(cume)})


def global_value_rank(ds, value_col: str,
                      n_buckets: Optional[int] = None,
                      local_limit: int = 20_000_000):
    """Distinct-value rank table for `value_col` ->
    (value, cnt, dense_rank, rank, cume_cnt) as a Dataset, plus the
    total non-null row count.  Returns (rank_ds, total_rows).

    While the distinct-value table is below `local_limit` rows it is
    collected and ranked in one vectorized driver pass (the same
    smallness condition the broadcast attach path already relies on —
    a Ray range-sort plus per-block offset tasks cost whole seconds of
    barriers for a table this size).  Past the limit the distributed
    path sorts only the distinct table and assigns ranks per block from
    prefix offsets."""
    from .agg import bucketed_sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[value_col]
        t = pa.table({value_col: col}).filter(pc.is_valid(col))
        g = t.group_by([value_col]).aggregate([(value_col, "count")])
        return pa.table({value_col: g[value_col],
                         "cnt": g[f"{value_col}_count"].cast(pa.int64())})

    d = bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                     [value_col], ["cnt"], n_buckets=n_buckets) \
        .materialize()
    import ray.data as rd

    if d.count() <= local_limit:
        parts = [b for b in d.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
                 if b.num_rows]
        if not parts:
            return rd.from_arrow(_rank_table_local(
                np.array([]), np.array([], np.int64), value_col)), 0
        t = pa.concat_tables(parts)
        vals = t[value_col].to_numpy(zero_copy_only=False)
        cnts = t["cnt"].to_numpy(zero_copy_only=False)
        rk = _rank_table_local(vals, cnts, value_col)
        return rd.from_arrow(rk), int(cnts.sum())

    d_sorted = d.sort(value_col).materialize()

    blockrefs = []
    for bundle in d_sorted.iter_internal_ref_bundles():
        blockrefs.extend(bundle.block_refs)
    if not blockrefs:
        empty = pa.table({value_col: pa.array([], pa.float64()),
                          "cnt": pa.array([], pa.int64()),
                          "dense_rank": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "cume_cnt": pa.array([], pa.int64())})
        import ray.data as rd

        return rd.from_arrow(empty), 0

    stats = ray.get([_block_stats.remote(value_col, r) for r in blockrefs])
    rows = np.array([s[0] for s in stats], np.int64)
    sums = np.array([s[1] for s in stats], np.int64)
    dense_offs = np.concatenate(([0], np.cumsum(rows)))[:-1]
    cnt_offs = np.concatenate(([0], np.cumsum(sums)))[:-1]
    total = int(sums.sum())

    out_refs = [_assign_ranks.remote(int(dense_offs[i]), int(cnt_offs[i]),
                                     blockrefs[i])
                for i in range(len(blockrefs)) if rows[i] > 0]
    import ray.data as rd

    return rd.from_arrow_refs(out_refs), total


_BCAST_DISTINCT_LIMIT = 20_000_000   # distinct values; 4×8 B each


def attach_global_ranks(ds, value_col: str,
                        n_buckets: Optional[int] = None):
    """Join each row of `ds` to its global rank/dense_rank/cume_cnt on
    `value_col` (null values drop, as in the inner-join form).  Returns
    (joined_ds, total_rows).

    While the distinct-value table is broadcastable (< ~640 MB) the
    ranks ship to workers ONCE as four sorted arrays and each batch
    looks its rows up with one searchsorted — no second exchange.  Past
    the limit it falls back to the bucketed hash join (exact float
    equality: identical doubles are bitwise equal)."""
    import ray

    from .joins import bucketed_join

    rk, total = global_value_rank(ds, value_col, n_buckets=n_buckets)
    if rk.count() > _BCAST_DISTINCT_LIMIT:
        j = bucketed_join(ds, rk, [value_col],
                          [c for c in ds.schema().names],
                          [value_col, "rank", "dense_rank", "cume_cnt"],
                          n_buckets=n_buckets)
        return j, total

    parts = [b for b in rk.iter_batches(batch_size=None,
                                        batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        # empty input: return the documented JOINED schema (ds's columns
        # + the three rank columns), not the internal rank table whose
        # shape (value/cnt/... columns) nothing downstream expects.
        # Built directly (map_batches over an empty dataset may never
        # run, leaving the schema unknown).
        import ray.data as _rd

        sch = ds.schema()
        base = sch.base_schema if sch is not None else pa.schema([])
        cols = {f.name: pa.array([], f.type) for f in base}
        for c in ("rank", "dense_rank", "cume_cnt"):
            cols[c] = pa.array([], pa.int64())
        return _rd.from_arrow(pa.table(cols)), 0
    t = pa.concat_tables(parts)
    vals = t[value_col].to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="stable")
    ref = ray.put((vals[order],
                   t["rank"].to_numpy(zero_copy_only=False)[order],
                   t["dense_rank"].to_numpy(zero_copy_only=False)[order],
                   t["cume_cnt"].to_numpy(zero_copy_only=False)[order]))

    def lookup(batch: pa.Table) -> pa.Table:
        sv, rrank, rdense, rcume = ray.get(ref)
        col = batch[value_col]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(valid))
        v = batch[value_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sv, v)
        batch = batch.append_column("rank", pa.array(rrank[pos]))
        batch = batch.append_column("dense_rank", pa.array(rdense[pos]))
        return batch.append_column("cume_cnt", pa.array(rcume[pos]))

    return ds.map_batches(lookup, batch_format="pyarrow"), total


@ray.remote
def _block_col_sum(col: str, block) -> int:
    t = block if isinstance(block, pa.Table) \
        else pa.Table.from_batches([block])
    if t.num_rows == 0 or col not in t.column_names:
        return 0
    return int(pc.sum(t[col]).as_py() or 0)


@ray.remote
def _block_running(off: int, col: str, out_col: str, block) -> pa.Table:
    t = block if isinstance(block, pa.Table) \
        else pa.Table.from_batches([block])
    v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
    return t.append_column(out_col, pa.array(off + np.cumsum(v)))


def sorted_prefix_sum(ds, key_col: str, val_col: str, out_col: str,
                      local_limit: int = 20_000_000):
    """Running total of `val_col` in ascending `key_col` order over an
    ALREADY per-key-aggregated Dataset (one row per key) — SQL's
    ``sum(val) OVER (ORDER BY key)`` -> input columns + `out_col`.

    Same two-tier shape as `global_value_rank`: the input is
    cardinality-sized (one row per distinct key), so under `local_limit`
    rows it collects for one vectorized driver sort+cumsum; past the
    limit a range sort on the key plus per-block sums -> driver prefix
    offsets (n_blocks scalars, the one deliberate driver step) -> one
    independent cumsum task per block, blocks never talk to each other."""
    import ray.data as rd

    d = ds.materialize()
    if d.count() <= local_limit:
        parts = [b for b in d.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
                 if b.num_rows]
        if not parts:
            sch = ds.schema()
            cols = {f.name: pa.array([], f.type)
                    for f in sch.base_schema} if sch is not None else {
                        key_col: pa.array([], pa.int64()),
                        val_col: pa.array([], pa.int64())}
            cols[out_col] = pa.array([], pa.int64())
            return rd.from_arrow(pa.table(cols))
        t = pa.concat_tables([p if isinstance(p, pa.Table)
                              else pa.Table.from_batches([p])
                              for p in parts])
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return rd.from_arrow(t.append_column(
            out_col, pa.array(np.cumsum(v))))

    d_sorted = d.sort(key_col).materialize()
    blockrefs = []
    for bundle in d_sorted.iter_internal_ref_bundles():
        blockrefs.extend(bundle.block_refs)
    sums = ray.get([_block_col_sum.remote(val_col, r) for r in blockrefs])
    offs = np.concatenate(([0], np.cumsum(np.array(sums, np.int64))))[:-1]
    out_refs = [_block_running.remote(int(offs[i]), val_col, out_col,
                                      blockrefs[i])
                for i in range(len(blockrefs))]
    return rd.from_arrow_refs(out_refs)

"""Uniqueness constraint — `unique(cols)` (SURVEY.md §2.6).

The reference has no cross-row operators; uniqueness of e.g.
(repo, path, commit) is the first dataset-level constraint the north rule
adds.  Scale design:

  * project to the key columns FIRST — the wide `content` column never
    enters the shuffle;
  * pre-aggregate per batch (pyarrow group_by count) — this is the
    combiner/salting story: a hot key collapses to ONE row per batch
    before the all-to-all exchange, so skew in the input becomes at most
    `num_batches` rows per key in the shuffle;
  * a single small `groupby(key).sum(cnt)` finishes the count.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

# Ray's sort-based shuffle cannot order null keys (None < str raises), so
# null key values are swapped for a sentinel before the groupby and swapped
# back after.  SQL semantics: NULL keys group together.
_NULL_SENTINEL = "\x00__rho_null__\x00"


def _partial_counts(cols: Sequence[str]):
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.select(list(cols))
        filled = []
        for c in cols:
            col = t[c]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.fill_null(col, _NULL_SENTINEL)
            filled.append(col)
        t = pa.table(dict(zip(cols, filled)))
        return t.group_by(list(cols)).aggregate([([], "count_all")]).rename_columns(
            list(cols) + ["cnt"]
        )

    return fn


def unique_violations(ds, cols: Sequence[str], min_count: int = 2,
                      strategy: str = "hash"):
    """Keys appearing more than once -> Dataset/Table[cols..., cnt].

    strategy="hash" (default): two cheap passes instead of a row shuffle —
      (1) per-batch (uint64 key-hash, count) partials, merged with one
          vectorized numpy reduction (8 bytes/distinct key: ~1 GB per 10^8
          distinct keys of driver memory — far past this bench's needs);
      (2) an extraction scan keeps only rows whose hash collided, and the
          (tiny) candidate set is grouped by its REAL key values, so hash
          collisions cannot produce false positives.
    strategy="shuffle": classic all-to-all — per-batch partial counts then
      `groupby(cols).sum` — for when the distinct-key count exceeds what a
      driver merge should hold.  Same output either way.
    """
    if strategy == "hash":
        return _unique_violations_hashed(ds, list(cols), min_count)
    cols = list(cols)
    partial = ds.map_batches(_partial_counts(cols), batch_format="pyarrow")
    total = partial.groupby(cols).sum("cnt")
    # ray's Sum names the column 'sum(cnt)'
    def finish(batch: pa.Table) -> pa.Table:
        cnt = batch["sum(cnt)"]
        keep = pc.greater_equal(cnt, min_count)
        out = batch.filter(keep)
        out = out.rename_columns(cols + ["cnt"])
        restored = []
        for c in cols:
            col = out[c]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.if_else(pc.equal(col, _NULL_SENTINEL),
                                 pa.scalar(None, col.type
                                           if not isinstance(col, pa.ChunkedArray)
                                           else col.type), col)
            restored.append(col)
        return pa.table(dict(zip(cols, restored))).append_column("cnt", out["cnt"])

    return total.map_batches(finish, batch_format="pyarrow")


def _collect(ds) -> pa.Table:
    parts = []
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        parts.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
    return pa.concat_tables(parts) if parts else None


def _unique_violations_hashed(ds, cols: list, min_count: int) -> pa.Table:
    import numpy as np
    import ray

    from ..functions.hashing import combine_key, stable_hash64

    def partial(batch: pa.Table) -> pa.Table:
        kh = stable_hash64(combine_key(batch, cols))
        h, c = np.unique(kh, return_counts=True)
        return pa.table({"h": pa.array(h.view(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = _collect(ds.map_batches(partial, batch_format="pyarrow"))
    empty = pa.table({**{c: pa.array([], pa.string()) for c in cols},
                      "cnt": pa.array([], pa.int64())})
    if parts is None or parts.num_rows == 0:
        return empty
    h = parts["h"].to_numpy(zero_copy_only=False)
    c = parts["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    h, c = h[order], c[order]
    uniq, idx = np.unique(h, return_index=True)
    sums = np.add.reduceat(c, idx)
    dup_hashes = uniq[sums >= min_count]
    if dup_hashes.size == 0:
        return empty
    ref = ray.put(pa.array(dup_hashes))

    def extract(batch: pa.Table) -> pa.Table:
        kh = stable_hash64(combine_key(batch, cols)).view(np.int64)
        mask = pc.is_in(pa.array(kh), value_set=ray.get(ref))
        return batch.select(cols).filter(mask)

    cands = _collect(ds.map_batches(extract, batch_format="pyarrow"))
    if cands is None or cands.num_rows == 0:
        return empty
    g = cands.group_by(cols).aggregate([([], "count_all")])
    g = g.rename_columns(cols + ["cnt"])
    return g.filter(pc.greater_equal(g["cnt"], min_count))


def unique_violations_table(table: pa.Table, cols: Sequence[str],
                            min_count: int = 2) -> pa.Table:
    """Local pyarrow path (for tests / small driver-side checks)."""
    cols = list(cols)
    g = table.select(cols).group_by(cols).aggregate([([], "count_all")])
    g = g.rename_columns(cols + ["cnt"])
    return g.filter(pc.greater_equal(g["cnt"], min_count))

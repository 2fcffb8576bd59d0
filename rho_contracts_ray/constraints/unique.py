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
    strategy="shuffle": full-key exchange — per-batch partial counts then
      a hash-range bucketed sum (stages.agg.bucketed_sum: block-ref
      routing, no sort) — for when the distinct-key count exceeds what a
      driver merge should hold.  Same output either way.
    """
    if strategy == "hash":
        return _unique_violations_hashed(ds, list(cols), min_count)
    from ..stages.agg import bucketed_sum

    cols = list(cols)
    partial = ds.map_batches(_partial_counts(cols), batch_format="pyarrow")
    total = bucketed_sum(partial, cols, ["cnt"])

    def finish(batch: pa.Table) -> pa.Table:
        cnt = batch["cnt"]
        keep = pc.greater_equal(cnt, min_count)
        out = batch.filter(keep)
        restored = []
        for c in cols:
            col = out[c]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.if_else(pc.equal(col, _NULL_SENTINEL),
                                 pa.scalar(None, col.type), col)
            restored.append(col)
        return pa.table(dict(zip(cols, restored))).append_column("cnt", out["cnt"])

    return total.map_batches(finish, batch_format="pyarrow")


def _unique_violations_hashed(ds, cols: list, min_count: int) -> pa.Table:
    """One streaming pass, no rescan, no driver-side key stream (the round-1
    form merged hash partials on the driver — ~1 GB per 10^8 distinct keys,
    flagged in VERDICT.md): per-batch distinct (key..., cnt, key-hash) rows
    are range-partitioned by the hash and routed BY BLOCK REFERENCE into
    parallel bucket reduces (stages/distagg.bucketed_reduce — the same
    machinery as the flagship suite).  In each bucket, candidate hashes are
    found with int64 numpy ops, then only suspected duplicates are
    re-grouped by their REAL key values — a hash collision can only add a
    candidate that the real-key cnt filter then discards."""
    import numpy as np

    from ..functions.hashing import combine_key, stable_hash64
    from ..stages.distagg import bucketed_reduce

    schema = ds.schema().base_schema
    empty = pa.table({**{c: pa.array([], schema.field(c).type) for c in cols},
                      "cnt": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        kh = stable_hash64(combine_key(g, cols)).view(np.int64)
        return pa.table({**{c: g[c] for c in cols},
                         "cnt": pc.cast(g["count_all"], pa.int64()),
                         "kh": pa.array(kh)})

    def reduce_fn(t: pa.Table):
        kh = t["kh"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(kh, return_inverse=True)
        sums = np.bincount(inv, weights=cnt)
        cand = (sums >= min_count)[inv]
        if not cand.any():
            return None
        sub = t.filter(pa.array(cand))
        g = sub.group_by(cols).aggregate([("cnt", "sum")])
        g = g.filter(pc.greater_equal(g["cnt_sum"], min_count))
        if g.num_rows == 0:
            return None
        out = pa.table({**{c: g[c] for c in cols},
                        "cnt": pc.cast(g["cnt_sum"], pa.int64())})
        return out.sort_by([(c, "ascending") for c in cols])

    outs = bucketed_reduce(ds.map_batches(partial, batch_format="pyarrow"),
                           "kh", reduce_fn)
    return pa.concat_tables(outs) if outs else empty


def unique_violations_table(table: pa.Table, cols: Sequence[str],
                            min_count: int = 2) -> pa.Table:
    """Local pyarrow path (for tests / small driver-side checks)."""
    cols = list(cols)
    g = table.select(cols).group_by(cols).aggregate([([], "count_all")])
    g = g.rename_columns(cols + ["cnt"])
    return g.filter(pc.greater_equal(g["cnt"], min_count))

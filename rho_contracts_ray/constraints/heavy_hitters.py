"""Exact heavy hitters: every value of a column whose frequency is at
least ``phi * N``, with its EXACT count — the classic two-pass algorithm
(Misra-Gries candidates, then one confirming count pass).

Why this shape at 100 TB: a plain ``groupby(col).count()`` shuffles every
distinct value of the column across the cluster; heavy hitters only needs
the few values above the threshold.  Pass 1 streams once over the column
keeping at most ``k = ceil(slack/phi)`` counters per partial (Misra-Gries
summaries are mergeable: concat, sum, then subtract the (k+1)-th largest
count from everything and drop the non-positives — the subtracted total is
the summary's error bound).  Any value with true count >= phi*N survives
with estimate >= true - err, so ``estimate + err >= phi*N`` is a COMPLETE
candidate filter.  Pass 2 broadcasts the <=k candidates and exact-counts
only them — per-batch partials are <=k rows, no shuffle anywhere, driver
memory is O(k).

The reference library has no dataset ops; this extends its validation
story the way `constraints/unique.py` does (SURVEY.md §2.6 "ours to
scale").
"""

from __future__ import annotations

import math
from typing import Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _value_counts(col) -> pa.Table:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vc = pc.value_counts(col.drop_null())
    return pa.table({"value": vc.field("values"), "cnt": pc.cast(
        vc.field("counts"), pa.int64())})


def _mg_compress(t: pa.Table, k: int) -> tuple[pa.Table, int]:
    """Cap a (value, cnt) summary at k entries Misra-Gries style: subtract
    the (k+1)-th largest count from every entry, drop the non-positive
    ones.  Returns (summary, decrement) — the decrement is the error this
    compression adds to every surviving estimate."""
    if t.num_rows <= k:
        return t, 0
    cnt = t["cnt"].to_numpy(zero_copy_only=False)
    # k+1-th largest via partition (O(n), no full sort)
    d = int(np.partition(cnt, len(cnt) - k - 1)[len(cnt) - k - 1])
    keep = cnt > d
    out = pa.table({"value": t["value"].filter(pa.array(keep)),
                    "cnt": pa.array(cnt[keep] - d, pa.int64())})
    return out, d


def _merge_summaries(t: pa.Table, k: int) -> tuple[pa.Table, int]:
    """Merge concatenated MG summaries: sum counts per value, then
    compress back to k entries.  Returns (summary, added_error)."""
    g = t.group_by(["value"]).aggregate([("cnt", "sum")])
    g = pa.table({"value": g["value"], "cnt": pc.cast(g["cnt_sum"],
                                                      pa.int64())})
    return _mg_compress(g, k)


def _partial_fn(col: str, k: int):
    def partial(batch: pa.Table) -> pa.Table:
        vc = _value_counts(batch[col])
        n = int(pc.sum(vc["cnt"]).as_py() or 0)   # non-null rows
        summ, err = _mg_compress(vc, k)
        # sentinel row (value=null) carries (err, n); value rows carry
        # (cnt).  One table type end-to-end keeps the combine a plain
        # concat+groupby.
        sent = pa.table({"value": pa.array([None], summ["value"].type),
                         "cnt": pa.array([0], pa.int64()),
                         "err": pa.array([err], pa.int64()),
                         "n": pa.array([n], pa.int64())})
        vals = pa.table({"value": summ["value"], "cnt": summ["cnt"],
                         "err": pa.nulls(summ.num_rows, pa.int64()),
                         "n": pa.nulls(summ.num_rows, pa.int64())})
        return pa.concat_tables([sent, vals])

    return partial


def _combine_fn(k: int):
    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "err" not in batch.column_names:
            return batch
        is_sent = pc.is_valid(batch["n"])
        err = int(pc.sum(batch.filter(is_sent)["err"]).as_py() or 0)
        n = int(pc.sum(batch.filter(is_sent)["n"]).as_py() or 0)
        vals = batch.filter(pc.invert(is_sent)).select(["value", "cnt"])
        summ, d = _merge_summaries(vals, k)
        sent = pa.table({"value": pa.array([None], summ["value"].type),
                         "cnt": pa.array([0], pa.int64()),
                         "err": pa.array([err + d], pa.int64()),
                         "n": pa.array([n], pa.int64())})
        out_vals = pa.table({"value": summ["value"], "cnt": summ["cnt"],
                             "err": pa.nulls(summ.num_rows, pa.int64()),
                             "n": pa.nulls(summ.num_rows, pa.int64())})
        return pa.concat_tables([sent, out_vals])

    return combine


def _exact_count_fn(col: str, cand_ref):
    import ray

    def count(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref) if hasattr(cand_ref, "hex") else cand_ref
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        mask = pc.is_in(c, value_set=cand)
        return _value_counts(c.filter(mask))

    return count


def heavy_hitters(ds, col: str, phi: float,
                  slack: float = 4.0,
                  k: Optional[int] = None,
                  combine_size: int = 64) -> pa.Table:
    """All values of ``col`` with frequency >= ``phi * N`` (N = non-null
    rows) and their EXACT counts, sorted by value — complete (no heavy
    value is ever missed) and exact (pass 2 recounts candidates), with
    O(k) memory everywhere.  ``phi`` must be in (0, 1]; ``k`` defaults to
    ceil(slack/phi) counters (slack > 1 keeps the candidate filter's
    error bound well under the threshold; 1/phi is the theoretical
    minimum).  Nulls are ignored, matching SQL GROUP BY + HAVING.
    """
    import ray

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    if k is None:
        k = max(1, math.ceil(slack / phi))

    # pass 1: streaming Misra-Gries candidates
    part = ds.map_batches(_partial_fn(col, k), batch_format="pyarrow")
    comb = part.map_batches(_combine_fn(k), batch_format="pyarrow",
                            batch_size=combine_size)
    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in comb.iter_batches(batch_size=None,
                                        batch_format="pyarrow")]
    # empty input blocks pass through map_batches with the INPUT schema
    # (the UDF never ran on them) — drop those before the concat
    parts = [t for t in parts if "err" in t.column_names and t.num_rows]
    final = (pa.concat_tables(parts) if parts
             else pa.table({"value": pa.array([], pa.null()),
                            "cnt": pa.array([], pa.int64()),
                            "err": pa.array([], pa.int64()),
                            "n": pa.array([], pa.int64())}))
    if final.num_rows == 0:
        return pa.table({"value": pa.array([], pa.null()),
                         "cnt": pa.array([], pa.int64())})
    is_sent = pc.is_valid(final["n"])
    err = int(pc.sum(final.filter(is_sent)["err"]).as_py() or 0)
    n = int(pc.sum(final.filter(is_sent)["n"]).as_py() or 0)
    vals = final.filter(pc.invert(is_sent)).select(["value", "cnt"])
    summ, d = _merge_summaries(vals, k)
    err += d
    if n == 0:
        return pa.table({"value": pa.array([], summ["value"].type),
                         "cnt": pa.array([], pa.int64())})
    thresh = phi * n
    cand_mask = pc.greater_equal(
        pc.add(pc.cast(summ["cnt"], pa.float64()), float(err)),
        float(thresh))
    cand = summ["value"].filter(cand_mask)
    if isinstance(cand, pa.ChunkedArray):
        cand = cand.combine_chunks()
    if len(cand) == 0:
        return pa.table({"value": pa.array([], summ["value"].type),
                         "cnt": pa.array([], pa.int64())})

    # pass 2: exact counts of the <=k candidates (broadcast once per job)
    cand_ref = ray.put(cand)
    cnt_part = ds.map_batches(_exact_count_fn(col, cand_ref),
                              batch_format="pyarrow")
    exact_parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                   for b in cnt_part.iter_batches(batch_size=None,
                                                  batch_format="pyarrow")]
    # same guard as pass 1: empty input blocks pass through map_batches
    # with the INPUT schema and would poison the concat / pollute logs
    exact_parts = [t for t in exact_parts
                   if {"value", "cnt"} <= set(t.column_names) and t.num_rows]
    if not exact_parts:
        return pa.table({"value": pa.array([], summ["value"].type),
                         "cnt": pa.array([], pa.int64())})
    exact = pa.concat_tables(exact_parts)
    g = exact.group_by(["value"]).aggregate([("cnt", "sum")])
    cnt = pc.cast(g["cnt_sum"], pa.int64())
    # threshold is the FLOAT64 product phi*N — deliberately, because the
    # SQL oracle's HAVING count >= phi * total computes the identical
    # double (a frequency EXACTLY on the boundary can fall either side
    # of the rational phi*N, but both engines fall the same way)
    keep = pc.greater_equal(pc.cast(cnt, pa.float64()), float(thresh))
    out = pa.table({"value": g["value"], "cnt": cnt}).filter(keep)
    return out.sort_by([("value", "ascending")])

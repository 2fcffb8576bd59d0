"""Pareto frontier (skyline) over a Dataset.

The skyline — rows not dominated by any other row under a mix of
maximize/minimize objectives — is the textbook local-prune operator:
the skyline of a union is the skyline of the per-part skylines, so one
`map_batches` pass shrinks each batch to its own frontier (typically
O(log^{d-1} n) points for random data) and a single final task merges
the tiny survivor set.  Nothing global moves; the one assumption,
stated loudly, is that the global skyline itself fits in one task —
true for every practical objective mix, and the same assumption SQL
engines make when they answer the NOT EXISTS form.

Dominance is SQL-faithful: row j dominates row i iff j is >= i on
every maximize column, <= on every minimize column, and STRICTLY
better on at least one — so exact duplicates never dominate each other
and all survive.  Null objectives are excluded (SQL comparison with
NULL is never true, which would make null rows unbeatable; dropping
them matches the NOT EXISTS oracle over non-null rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _objective_arrays(t: pa.Table, maximize: Sequence[str],
                      minimize: Sequence[str]) -> list:
    """Per-objective 1-D arrays oriented so LARGER is always better.
    Dtypes are preserved (int64 stays int64 — casting everything to
    float64 would alias distinct keys past 2^53)."""
    def numeric(c: str) -> np.ndarray:
        a = np.asarray(t[c].to_numpy(zero_copy_only=False))
        if a.dtype.kind in "Mm":          # datetime/timedelta -> epoch int
            a = a.astype(np.int64)
        return a

    def negated(c: str) -> np.ndarray:
        a = numeric(c)
        # unsigned negation WRAPS (−uint32(1) == 4294967295, silently
        # inverting dominance) and bool negation raises — go through a
        # signed/float dtype first
        if a.dtype.kind in "ub":
            a = a.astype(np.int64) if a.dtype.itemsize < 8 \
                else a.astype(np.float64)
        return -a

    cols = [numeric(c) for c in maximize] + [negated(c) for c in minimize]
    if not cols:
        raise ValueError("pareto_front: at least one objective column")
    return cols


def _pairwise_mask(cols: list) -> np.ndarray:
    """Quadratic keep-mask (larger-is-better every dim) — used only on
    chunk-sized subsets, never a whole batch."""
    n = cols[0].shape[0]
    if n == 0:
        return np.zeros(0, bool)
    ge = gt = None
    for a in cols:
        c_ge = a[:, None] >= a[None, :]
        c_gt = a[:, None] > a[None, :]
        ge = c_ge if ge is None else (ge & c_ge)
        gt = c_gt if gt is None else (gt | c_gt)
    return ~(ge & gt).any(axis=0)


def _skyline_mask(cols: list, chunk: int = 512) -> np.ndarray:
    """Boolean keep-mask of the non-dominated rows (larger-is-better on
    every objective array).  O(n·(k + chunk)) with k the running skyline
    size, not O(n²): a full descending lexsort over ALL objectives means
    a later row can never strictly dominate an earlier one (lex-≤ plus
    ≥-everywhere forces equality), so rows stream best-first through
    chunks, each chunk is pruned against the accumulated skyline
    (vectorized over the tiny k) and quadratically within itself, and
    chunk survivors are final."""
    n = cols[0].shape[0]
    if n == 0:
        return np.zeros(0, bool)
    # lexsort: last key is primary; reversed(cols) puts cols[0] primary.
    # [::-1] flips ascending -> descending (order within ties is
    # irrelevant: equal tuples never dominate each other).
    order = np.lexsort(tuple(reversed(cols)))[::-1]
    sorted_cols = [a[order] for a in cols]
    keep_sorted = np.zeros(n, bool)
    sky = [[] for _ in cols]                 # accumulated per-dim values
    for lo in range(0, n, chunk):
        sub = [a[lo:lo + chunk] for a in sorted_cols]
        alive = np.ones(sub[0].shape[0], bool)
        if sky[0]:
            ge = gt = None
            for s, a in zip(sky, sub):
                sk = np.concatenate(s)
                c_ge = sk[:, None] >= a[None, :]     # (k, c)
                c_gt = sk[:, None] > a[None, :]
                ge = c_ge if ge is None else (ge & c_ge)
                gt = c_gt if gt is None else (gt | c_gt)
            alive &= ~(ge & gt).any(axis=0)
        if alive.any():
            sub_alive = [a[alive] for a in sub]
            inner = _pairwise_mask(sub_alive)
            final = alive.copy()
            final[np.flatnonzero(alive)[~inner]] = False
            keep_sorted[lo:lo + chunk] = final
            for s, a in zip(sky, sub_alive):
                s.append(a[inner])
    keep = np.zeros(n, bool)
    keep[order] = keep_sorted
    return keep


def pareto_front(ds, maximize: Sequence[str], minimize: Sequence[str],
                 keep_cols: Optional[Sequence[str]] = None):
    """Skyline of `ds` under the given objectives -> Dataset of the
    non-dominated rows (columns `keep_cols`, default: objectives;
    objective columns ride along internally even when keep_cols omits
    them, and drop from the output at the end)."""
    maximize, minimize = list(maximize), list(minimize)
    obj = maximize + minimize
    keep_cols = list(keep_cols) if keep_cols is not None else obj
    work_cols = keep_cols + [c for c in obj if c not in keep_cols]

    def local(t: pa.Table) -> pa.Table:
        t = t.select(work_cols)
        valid = np.ones(t.num_rows, bool)
        for c in obj:
            valid &= pc.is_valid(t[c]).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(valid))
        cols = _objective_arrays(t, maximize, minimize)
        return t.filter(pa.array(_skyline_mask(cols)))

    survivors = ds.map_batches(local, batch_format="pyarrow",
                               batch_size=None)   # whole blocks: the
    # streaming lexsort prune is O(rows·(k+chunk)), not quadratic
    # final merge: the survivor set is skyline-sized; one task suffices
    merged = survivors.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None)
    if work_cols == keep_cols:
        return merged
    return merged.map_batches(lambda t: t.select(keep_cols),
                              batch_format="pyarrow")

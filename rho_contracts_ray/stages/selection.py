"""Exact GLOBAL order statistics over a Dataset column without any sort
or single-task materialization: multi-pass histogram refinement
(distributed selection).

Why not reuse the per-group quantile exchange: a global quantile has ONE
group, so the bucketed exchange would route every row to a single task —
the exact thing that OOMs at 100 TB.  Selection instead keeps each pass
fully streaming: a 2048-bin histogram of the current candidate range is
folded on the driver (one short binary row per batch), the bin span
holding the wanted order statistics becomes the next range, and after
~log_2048(n) passes (3 passes covers 8.6e9 rows) the survivors are few
enough to collect exactly.  Each pass is one column-pruned scan; the
driver only ever holds 2048 integers per batch partial and the final
<=`collect_limit` survivors.

Equal-value mass (a single value holding more than collect_limit rows)
is detected via the survivors' min==max probe and answered directly —
the wanted statistics ARE that value, no partition needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NBINS = 2048


def _fold(ds, partial, cols):
    """Stream a map_batches over ds, yielding schema-matching tables."""
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        # empty input blocks pass through with the INPUT schema — skip
        if t.num_rows == 0 or not set(cols) <= set(t.column_names):
            continue
        yield t


def _finite(batch: pa.Table, col: str) -> np.ndarray:
    v = batch[col]
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    x = v.to_numpy(zero_copy_only=False).astype(np.float64)
    return x[np.isfinite(x)]


def _scan_stats(ds, col: str):
    """One streaming pass: count / min / max of finite values."""

    def partial(batch: pa.Table) -> pa.Table:
        x = _finite(batch, col)
        if x.size == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([x.size], pa.int64()),
                         "lo": pa.array([float(x.min())]),
                         "hi": pa.array([float(x.max())])})

    n, lo, hi = 0, np.inf, -np.inf
    for t in _fold(ds, partial, ["n", "lo", "hi"]):
        n += int(pc.sum(t["n"]).as_py() or 0)
        lo = min(lo, float(pc.min(t["lo"]).as_py()))
        hi = max(hi, float(pc.max(t["hi"]).as_py()))
    return n, lo, hi


def _rank_pair(ds, col: str, k1: int, k2: int, lo: float, hi: float,
               total: int, collect_limit: int = 200_000):
    """Exact values at 0-based global ranks k1 <= k2 (k2 - k1 <= 1 in
    practice — the quantile_cont bracket).  Narrows [lo, hi] keeping BOTH
    ranks inside the range, so one refinement serves both."""
    below = 0          # finite values strictly below lo
    in_range = total   # finite values within [lo, hi]
    for _ in range(12):   # 2048^3 > 8e9 rows; 12 is a paranoid ceiling
        if in_range <= collect_limit or not (hi > lo):
            break
        edges = np.linspace(lo, hi, _NBINS + 1)

        def hist_partial(batch: pa.Table, edges=edges, lo=lo, hi=hi
                         ) -> pa.Table:
            x = _finite(batch, col)
            x = x[(x >= lo) & (x <= hi)]
            cnt, _ = np.histogram(x, bins=edges)
            return pa.table({"h": pa.array([cnt.tobytes()], pa.binary())})

        cnt = np.zeros(_NBINS, np.int64)
        for t in _fold(ds, hist_partial, ["h"]):
            for blob in t["h"].to_pylist():
                cnt += np.frombuffer(blob, np.int64)
        cum = np.cumsum(cnt)
        # bins holding the two wanted in-range ranks
        b1 = min(int(np.searchsorted(cum, (k1 - below) + 1)), _NBINS - 1)
        b2 = min(int(np.searchsorted(cum, (k2 - below) + 1)), _NBINS - 1)
        new_lo, new_hi = float(edges[b1]), float(edges[b2 + 1])
        new_below = below + (int(cum[b1 - 1]) if b1 else 0)
        new_in = int(cum[b2] - (cum[b1 - 1] if b1 else 0))
        if new_in == in_range and new_lo == lo and new_hi == hi:
            break                              # ulp-wide: can't shrink
        below, in_range, lo, hi = new_below, new_in, new_lo, new_hi

    if in_range > collect_limit:
        # unshrinkable (ulp-wide) range still holding > collect_limit
        # rows: it can only contain a handful of distinct doubles, so
        # select from STREAMING value counts instead of collecting rows
        # — the driver never materializes the duplicate mass
        def count_partial(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            x = _finite(batch, col)
            x = x[(x >= lo) & (x <= hi)]
            u, c = np.unique(x, return_counts=True)
            return pa.table({"u": pa.array(u), "c": pa.array(c)})

        agg: dict = {}
        for t in _fold(ds, count_partial, ["u", "c"]):
            for u, c in zip(t["u"].to_numpy(zero_copy_only=False),
                            t["c"].to_numpy(zero_copy_only=False)):
                agg[float(u)] = agg.get(float(u), 0) + int(c)
            if len(agg) > 1_000_000:
                raise RuntimeError(
                    "exact_global_quantile: candidate range holds too "
                    "many distinct values to count on the driver — "
                    "raise collect_limit")
        us = np.array(sorted(agg))
        cum = np.cumsum([agg[u] for u in us])
        v1 = float(us[np.searchsorted(cum, (k1 - below) + 1)])
        v2 = v1 if k2 == k1 else \
            float(us[np.searchsorted(cum, (k2 - below) + 1)])
        return v1, v2

    def collect_partial(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
        x = _finite(batch, col)
        return pa.table({"v": pa.array(x[(x >= lo) & (x <= hi)])})

    parts = [t["v"].to_numpy(zero_copy_only=False)
             for t in _fold(ds, collect_partial, ["v"])]
    x = np.concatenate(parts) if parts else np.array([], np.float64)
    if x.size and x.min() == x.max():
        return float(x[0]), float(x[0])        # equal-value mass
    # partition, not sort: O(survivors) per rank
    r1, r2 = k1 - below, k2 - below
    v1 = float(np.partition(x, r1)[r1])
    v2 = v1 if k2 == k1 else float(np.partition(x, r2)[r2])
    return v1, v2


def exact_global_quantile(ds, col: str, q: float,
                          collect_limit: int = 200_000):
    """Exact interpolated global quantile (DuckDB quantile_cont / median
    semantics: rank q*(n-1), TWO-SIDED weighted interpolation between the
    bracketing order statistics — `(1-frac)*lower + frac*upper`, the same
    expression DuckDB's Interpolator evaluates; the algebraically-equal
    `lower + (upper-lower)*frac` differs in the last bits and was caught
    by the hypothesis suite).  NaN,
    null and infinite values are excluded, matching the SQL pre-filter
    `value IS NOT NULL AND value = value` on finite data.

    Returns (value, n) — (None, 0) when no finite input exists.
    """
    if not (0.0 <= q <= 1.0):
        # q<0 would silently return a wrong value through numpy's
        # negative-index partition; q>1 crashes deep in the refinement
        raise ValueError(f"exact_global_quantile: q must be in [0, 1], "
                         f"got {q}")
    n, lo, hi = _scan_stats(ds, col)
    if n == 0:
        return None, 0
    rn = q * (n - 1)
    k1 = int(np.floor(rn))
    frac = rn - k1
    k2 = k1 if frac == 0.0 else k1 + 1
    v1, v2 = _rank_pair(ds, col, k1, k2, lo, hi, n, collect_limit)
    return (1.0 - frac) * v1 + frac * v2, n

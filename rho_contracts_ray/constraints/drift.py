"""Distribution-drift checks between two snapshots (SURVEY.md §2.6).

Numeric columns: a KS-style statistic — sup |CDF_a(x) - CDF_b(x)| evaluated
on a quantile grid of the two snapshots' merged t-digests (so each side of
a 100 TB comparison is a kilobyte sketch, not data).
Categorical columns: total-variation distance between the two frequency
tables (value counts shuffled as small partials, like unique()).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .stats import ColumnStats, column_stats, column_stats_table


@dataclass
class DriftReport:
    column: str
    kind: str              # 'numeric-ks' | 'categorical-tv'
    statistic: float
    threshold: float
    drifted: bool
    detail: dict

    def as_dict(self) -> dict:
        return {
            "column": self.column, "kind": self.kind,
            "statistic": self.statistic, "threshold": self.threshold,
            "drifted": self.drifted, **self.detail,
        }


def ks_statistic(a: ColumnStats, b: ColumnStats, grid: int = 201) -> float:
    """sup-norm distance of the two sketched CDFs on a shared grid."""
    if a.tdigest is None or b.tdigest is None:
        return float("nan")
    lo = min(a.vmin, b.vmin)
    hi = max(a.vmax, b.vmax)
    if not math.isfinite(lo) or not math.isfinite(hi) or hi <= lo:
        return 0.0
    xs = np.linspace(lo, hi, grid)
    d = 0.0
    for x in xs:
        d = max(d, abs(a.tdigest.cdf(float(x)) - b.tdigest.cdf(float(x))))
    return float(d)


def numeric_drift(ds_a, ds_b, col: str, threshold: float = 0.1) -> DriftReport:
    sa = column_stats(ds_a, [col])[col]
    sb = column_stats(ds_b, [col])[col]
    return numeric_drift_from_stats(sa, sb, col, threshold)


def numeric_drift_from_stats(sa: ColumnStats, sb: ColumnStats, col: str,
                             threshold: float = 0.1) -> DriftReport:
    ks = ks_statistic(sa, sb)
    return DriftReport(
        column=col, kind="numeric-ks", statistic=ks, threshold=threshold,
        drifted=bool(ks > threshold),
        detail={"mean_a": sa.mean, "mean_b": sb.mean,
                "p50_a": sa.quantile(0.5), "p50_b": sb.quantile(0.5)},
    )


def _value_freqs(ds_or_table, col: str) -> dict[str, float]:
    if isinstance(ds_or_table, pa.Table):
        t = ds_or_table.select([col]).group_by([col]).aggregate([([], "count_all")])
        t = t.rename_columns([col, "cnt"])
    else:
        from ..stages.agg import bucketed_sum

        def partial(batch: pa.Table) -> pa.Table:
            g = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
            return g.rename_columns([col, "cnt"])

        agg = bucketed_sum(
            ds_or_table.map_batches(partial, batch_format="pyarrow"),
            [col], ["cnt"])
        parts = []
        for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
            parts.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
        t = pa.concat_tables(parts) if parts else None
        if t is None:
            return {}
    total = pc.sum(t["cnt"]).as_py() or 1
    # the null category keys as None itself — a string sentinel like
    # '\\N' would MERGE with a real '\\N' value and understate drift
    # (e.g. 50% null -> 50% literal '\\N' would read as zero drift)
    return {
        k: c / total
        for k, c in zip(t[col].to_pylist(), t["cnt"].to_pylist())
    }


def categorical_drift(ds_a, ds_b, col: str, threshold: float = 0.05
                      ) -> DriftReport:
    """Total-variation distance: 0.5 * sum |p_a - p_b| over all categories."""
    fa = _value_freqs(ds_a, col)
    fb = _value_freqs(ds_b, col)
    cats = set(fa) | set(fb)
    tv = 0.5 * sum(abs(fa.get(c, 0.0) - fb.get(c, 0.0)) for c in cats)
    return DriftReport(
        column=col, kind="categorical-tv", statistic=float(tv),
        threshold=threshold, drifted=bool(tv > threshold),
        detail={"categories": len(cats)},
    )


def exact_ks(ds_a, ds_b, col: str) -> dict:
    """EXACT two-sample Kolmogorov–Smirnov statistic:
    sup_x |ECDF_a(x) - ECDF_b(x)| over the union of observed values.

    Scale shape: each side reduces per batch to (value, count) partials
    tagged with its side, both streams union and ride ONE bucketed
    exchange keyed on the value; the driver receives only the per-value
    count table (rows = #DISTINCT values — exact KS is the right tool for
    discrete / bounded-cardinality columns; for continuous data at 100 TB
    use `numeric_drift`'s t-digest sketch, which is what this module's
    default path does).  Nulls and NaNs are excluded on both sides (SQL
    aggregate semantics).  Returns {"ks", "n_a", "n_b", "n_values"} with
    ks computed from exact integer cumulative counts — a SQL oracle with
    window-function ECDFs reproduces it bit-for-bit."""
    from ..stages.agg import bucketed_sum

    def tagged_partial(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            v = batch[col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            v = v.drop_null()
            if pa.types.is_floating(v.type):
                v = v.filter(pc.invert(pc.is_nan(v)))
            g = pa.table({col: v}).group_by(col).aggregate([([], "count_all")])
            n = pc.cast(g["count_all"], pa.int64())
            zero = pa.array(np.zeros(g.num_rows, np.int64))
            return pa.table({col: g[col],
                             "ca": n if side == 0 else zero,
                             "cb": zero if side == 0 else n})
        return fn

    both = ds_a.map_batches(tagged_partial(0), batch_format="pyarrow") \
        .union(ds_b.map_batches(tagged_partial(1), batch_format="pyarrow"))
    counts = bucketed_sum(both, [col], ["ca", "cb"])

    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in counts.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
    if not parts:
        return {"ks": 0.0, "n_a": 0, "n_b": 0, "n_values": 0}
    t = pa.concat_tables(parts)
    t = t.take(pc.sort_indices(t, sort_keys=[(col, "ascending")]))
    ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
    cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
    na, nb = int(ca.sum()), int(cb.sum())
    if na == 0 or nb == 0:
        return {"ks": 0.0, "n_a": na, "n_b": nb, "n_values": t.num_rows}
    diff = np.abs(np.cumsum(ca) / na - np.cumsum(cb) / nb)
    return {"ks": float(diff.max()), "n_a": na, "n_b": nb,
            "n_values": t.num_rows}

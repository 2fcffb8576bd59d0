"""Column statistics — exact moments + t-digest quantiles + HLL distinct
(SURVEY.md §2.6).

Scale design: one partial per (batch, column) — a handful of floats plus a
few KB of serialized sketch — produced inside `map_batches` with NO shuffle;
partials merge associatively on the driver (they are tiny: #batches rows),
which is exactly the partial+final aggregate shape, so at 100 TB the
reduction input is still kilobytes per column.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64
from ..functions.sketches import HyperLogLog, TDigest

PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("nulls", pa.int64()),
    ("vmin", pa.float64()),
    ("vmax", pa.float64()),
    ("vsum", pa.float64()),
    ("vsum2", pa.float64()),
    ("vn", pa.int64()),        # FINITE numeric count (NaN excluded) —
                               # the mean/std denominator; `count` stays
                               # the SQL count(col) (non-null incl. NaN)
    ("smin", pa.string()),
    ("smax", pa.string()),
    ("tdigest", pa.binary()),
    ("hll", pa.binary()),
])


class StatsPartialStage:
    """Per-batch partial sketches for a set of columns."""

    def __init__(self, cols: Sequence[str], compression: float = 200.0,
                 hll_p: int = 14):
        self.cols = list(cols)
        self.compression = compression
        self.hll_p = hll_p

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name.name: [] for name in PARTIAL_SCHEMA}
        for col_name in self.cols:
            if col_name not in batch.column_names:
                continue
            col = batch[col_name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = len(col)
            nulls = col.null_count
            is_num = (pa.types.is_integer(col.type)
                      or pa.types.is_floating(col.type))
            vmin = vmax = vsum = vsum2 = None
            smin = smax = None
            td = b""
            vn = 0
            if is_num:
                v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                v = v[~np.isnan(v)]
                vn = int(v.size)
                if v.size:
                    vmin, vmax = float(v.min()), float(v.max())
                    vsum, vsum2 = float(v.sum()), float((v * v).sum())
                    d = TDigest(self.compression)
                    d.add(v)
                    td = d.to_bytes()
            elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                mm = pc.min_max(col)
                smin = mm["min"].as_py()
                smax = mm["max"].as_py()
            hll = HyperLogLog(self.hll_p)
            # HLL registers are set-semantic: hashing the batch-DISTINCT
            # values gives identical registers and skips ~50x of the
            # (expensive) string hashing on low-cardinality columns
            hll.add_hashes(stable_hash64(pc.unique(col.drop_null())))
            rows["column"].append(col_name)
            rows["count"].append(n - nulls)
            rows["vn"].append(vn)
            rows["nulls"].append(nulls)
            rows["vmin"].append(vmin)
            rows["vmax"].append(vmax)
            rows["vsum"].append(vsum)
            rows["vsum2"].append(vsum2)
            rows["smin"].append(smin)
            rows["smax"].append(smax)
            rows["tdigest"].append(td)
            rows["hll"].append(hll.to_bytes())
        return pa.Table.from_pydict(rows, schema=PARTIAL_SCHEMA)


@dataclass
class ColumnStats:
    column: str
    count: int = 0
    nulls: int = 0
    vmin: Optional[float] = None
    vmax: Optional[float] = None
    vsum: float = 0.0
    vsum2: float = 0.0
    vn: int = 0
    smin: Optional[str] = None
    smax: Optional[str] = None
    tdigest: Optional[TDigest] = None
    hll: Optional[HyperLogLog] = None

    @property
    def mean(self) -> Optional[float]:
        # denominator = finite count: vsum excludes NaN, so dividing by
        # the NaN-inclusive count would systematically understate the
        # mean of any NaN-bearing column
        return self.vsum / self.vn if self.vn and self.vmin is not None \
            else None

    @property
    def std(self) -> Optional[float]:
        if not self.vn or self.vmin is None:
            return None
        var = self.vsum2 / self.vn - (self.vsum / self.vn) ** 2
        return math.sqrt(max(var, 0.0))

    def quantile(self, q: float) -> Optional[float]:
        return self.tdigest.quantile(q) if self.tdigest else None

    def approx_distinct(self) -> Optional[float]:
        return self.hll.estimate() if self.hll else None

    def summary(self, quantiles=(0.5, 0.95, 0.99)) -> dict:
        out = {
            "column": self.column, "count": self.count, "nulls": self.nulls,
            "min": self.vmin if self.vmin is not None else self.smin,
            "max": self.vmax if self.vmax is not None else self.smax,
            "mean": self.mean, "std": self.std,
            "approx_distinct": self.approx_distinct(),
        }
        from ..stages.agg import quantile_col_name
        for q in quantiles:
            # sub-percent-safe labels (0.999 -> p99_9, not a p99 collision)
            out[quantile_col_name(q)] = self.quantile(q)
        return out


def _merge_partials(table: pa.Table) -> dict[str, ColumnStats]:
    out: dict[str, ColumnStats] = {}
    for row in table.to_pylist():
        c = row["column"]
        s = out.setdefault(c, ColumnStats(c))
        s.count += row["count"]
        s.nulls += row["nulls"]
        s.vn += row.get("vn") or 0
        if row["vmin"] is not None:
            s.vmin = row["vmin"] if s.vmin is None else min(s.vmin, row["vmin"])
            s.vmax = row["vmax"] if s.vmax is None else max(s.vmax, row["vmax"])
            s.vsum += row["vsum"]
            s.vsum2 += row["vsum2"]
        if row["smin"] is not None:
            s.smin = row["smin"] if s.smin is None else min(s.smin, row["smin"])
            s.smax = row["smax"] if s.smax is None else max(s.smax, row["smax"])
        if row["tdigest"]:
            d = TDigest.from_bytes(row["tdigest"])
            s.tdigest = d if s.tdigest is None else s.tdigest.merge(d)
        if row["hll"]:
            h = HyperLogLog.from_bytes(row["hll"])
            s.hll = h if s.hll is None else s.hll.merge(h)
    return out


def merge_partials_table(table: pa.Table) -> pa.Table:
    """Associatively merge a partials table back INTO partial form (one row
    per column) — used by the suite's distributed tree-combine stage so
    t-digest / HLL merges run in workers, not on the driver."""
    merged = _merge_partials(table)
    rows = {f.name: [] for f in PARTIAL_SCHEMA}
    for name in sorted(merged):
        s = merged[name]
        rows["column"].append(s.column)
        rows["count"].append(s.count)
        rows["nulls"].append(s.nulls)
        rows["vmin"].append(s.vmin)
        rows["vmax"].append(s.vmax)
        rows["vsum"].append(s.vsum if s.vmin is not None else None)
        rows["vsum2"].append(s.vsum2 if s.vmin is not None else None)
        rows["vn"].append(s.vn)
        rows["smin"].append(s.smin)
        rows["smax"].append(s.smax)
        rows["tdigest"].append(s.tdigest.to_bytes() if s.tdigest else b"")
        rows["hll"].append(s.hll.to_bytes() if s.hll else b"")
    return pa.Table.from_pydict(rows, schema=PARTIAL_SCHEMA)


def column_stats(ds, cols: Sequence[str], concurrency=None
                 ) -> dict[str, ColumnStats]:
    """Streaming per-column stats over a Dataset.  The only driver-side
    materialization is the partials table (#batches x #cols tiny rows)."""
    from ..validate import stateless_stage

    partials = ds.map_batches(
        stateless_stage(StatsPartialStage, cols=list(cols)),
        batch_format="pyarrow",
    )
    parts = []
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        parts.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
    t = pa.concat_tables(parts) if parts else PARTIAL_SCHEMA.empty_table()
    return _merge_partials(t)


def column_stats_table(table: pa.Table, cols: Sequence[str]
                       ) -> dict[str, ColumnStats]:
    """Local pyarrow path."""
    stage = StatsPartialStage(cols)
    return _merge_partials(stage(table))

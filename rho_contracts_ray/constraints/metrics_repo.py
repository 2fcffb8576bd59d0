"""Metrics repository + cross-run anomaly detection — the second half of
the Deequ loop (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018): every validation run RECORDS its column
profile; the next run's profile is checked against the recorded history
and metrics that moved more than `z_thresh` standard deviations flag as
anomalies BEFORE the regression ships.

Storage shape mirrors state/checkpoint.py: one parquet file per run
(atomic tmp+rename commit, so a killed job never leaves a torn record and
re-recording a run id is idempotent-by-overwrite), history loads as one
Arrow table.  Profiles are the tiny O(columns) tables of
constraints/suggest.py (or any table with a `column` column + numeric
metric columns), so the repository stays kilobytes per run at any input
scale — the 100-TB input never touches this path.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_RUN_ID_RE = re.compile(r"^[A-Za-z0-9._=-]+$")

ANOMALY_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("metric", pa.string()),
    ("value", pa.float64()),
    ("hist_mean", pa.float64()),
    ("hist_std", pa.float64()),
    ("n_history", pa.int64()),
    ("z", pa.float64()),           # null when hist_std == 0
    ("anomaly", pa.bool_()),
])


def validate_run_id(run_id: str) -> None:
    """Callable up front (run_suite validates BEFORE its long pass)."""
    if not _RUN_ID_RE.match(run_id):
        raise ValueError(
            f"run_id {run_id!r} must match {_RUN_ID_RE.pattern} "
            f"(it becomes a filename)")


class MetricsRepository:
    """Append-only per-run profile store under one directory."""

    def __init__(self, repo_dir: str):
        self.dir = repo_dir
        os.makedirs(repo_dir, exist_ok=True)

    def _path(self, run_id: str) -> str:
        validate_run_id(run_id)
        return os.path.join(self.dir, f"{run_id}.parquet")

    def record(self, run_id: str, profile: pa.Table) -> str:
        """Commit one run's profile atomically (tmp + rename); recording
        the same run_id again overwrites — idempotent retries."""
        if "column" not in profile.column_names:
            raise ValueError("profile must carry a 'column' column")
        path = self._path(run_id)
        tmp = path + ".tmp"
        pq.write_table(
            profile.append_column("run_id", pa.array(
                [run_id] * profile.num_rows, pa.string())), tmp)
        # fsync BEFORE the rename (same discipline as state.checkpoint):
        # os.replace alone can commit a name pointing at data blocks that
        # never hit disk, leaving a torn record under the final path
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, path)
        return path

    def run_ids(self) -> list[str]:
        return sorted(f[:-8] for f in os.listdir(self.dir)
                      if f.endswith(".parquet"))

    def history(self, exclude: Optional[str] = None) -> pa.Table:
        """All recorded profiles as one table (empty-but-typed when no
        runs exist)."""
        parts = []
        for r in self.run_ids():
            if r == exclude:
                continue
            try:
                parts.append(pq.read_table(self._path(r)))
            except Exception:
                # a torn record (pre-fsync crash of an older writer)
                # must not brick every later run — skip it loudly
                import warnings
                warnings.warn(f"metrics repo: skipping unreadable record "
                              f"{r!r}", stacklevel=2)
        if not parts:
            return pa.table({"column": pa.array([], pa.string()),
                             "run_id": pa.array([], pa.string())})
        return pa.concat_tables(parts, promote_options="default")


def anomaly_check(history: pa.Table, current: pa.Table,
                  metrics: Sequence[str], z_thresh: float = 3.0,
                  min_history: int = 2,
                  min_dev: float = 0.0) -> pa.Table:
    """Per (column, metric) z-score of the current profile against the
    history -> ANOMALY_SCHEMA rows, sorted by (column, metric).

    Null metric values (a column that is all-null has no min) are
    skipped on both sides.  A zero-variance history flags on ANY exact
    change (the strictest consistent rule); fewer than `min_history`
    usable runs yields anomaly=false with z null — never a spurious
    alarm from an unlearnable baseline.  `min_dev`: absolute deviation
    floor — |value - mean| must also exceed it to flag (0 = off); use it
    where the baseline has NATURAL variation (partition screening) so a
    tiny-variance history cannot flag noise-level differences."""
    metrics = list(metrics)
    missing = [m for m in metrics if m not in current.column_names]
    if missing:
        raise ValueError(f"anomaly_check: metrics {missing} not in the "
                         f"current profile {current.column_names}")
    if min_history < 1:
        # with an empty baseline the zero-variance branch would compare
        # against mean=None and flag EVERYTHING
        raise ValueError(f"anomaly_check: min_history must be >= 1, "
                         f"got {min_history}")
    # per-metric availability: a history recorded by an OLDER profile
    # shape may lack a newly added metric column — that metric gets
    # n_history=0, the others keep their full baseline (an all-or-
    # nothing gate here silently disabled every check)
    out = {f.name: [] for f in ANOMALY_SCHEMA}
    cur_rows = sorted(current.to_pylist(), key=lambda r: r["column"])
    hist_rows = history.to_pylist() \
        if "column" in history.column_names else []
    for r in cur_rows:
        col = r["column"]
        for m in metrics:
            v = r.get(m)
            if v is None:
                continue
            v = float(v)
            hv = np.array([float(h[m]) for h in hist_rows
                           if h["column"] == col and h.get(m) is not None],
                          np.float64)
            n = int(hv.size)
            mean = float(hv.mean()) if n else None
            std = float(hv.std(ddof=0)) if n else None
            z = None
            flag = False
            if n >= min_history:
                if std and std > 0:
                    z = (v - mean) / std
                    flag = abs(z) > z_thresh
                else:
                    flag = v != mean
                if flag and min_dev > 0 and abs(v - mean) <= min_dev:
                    flag = False
            out["column"].append(col)
            out["metric"].append(m)
            out["value"].append(v)
            out["hist_mean"].append(mean)
            out["hist_std"].append(std)
            out["n_history"].append(n)
            out["z"].append(z)
            out["anomaly"].append(flag)
    return pa.Table.from_pydict(out, schema=ANOMALY_SCHEMA)


def record_and_check(repo: MetricsRepository, run_id: str,
                     profile: pa.Table, metrics: Sequence[str],
                     z_thresh: float = 3.0,
                     min_history: int = 2) -> pa.Table:
    """The per-run loop: check `profile` against every EARLIER run, then
    record it (so a flagged run is still on file for forensics)."""
    report = anomaly_check(repo.history(exclude=run_id), profile,
                           metrics, z_thresh, min_history)
    repo.record(run_id, profile)
    return report


def weekly_profile_anomalies(ds, ts_col: str = "ts",
                             type_col: str = "event_type",
                             match_type: str = "purchase") -> pa.Table:
    """Treat each ISO week of an event stream as one 'run', profile it
    (row count + matching-type count — integer metrics only, so the SQL
    oracle is bit-exact), and score every week with a LEAVE-ONE-OUT
    z-score against the other weeks — the anomaly_check() math expressed
    as an oracled batch query.

    Scale shape: per-batch (week, n, n_match) partials pre-combine
    inside map_batches, one week-keyed exchange reduces them, and the
    z-scores fold on the week-cardinality table (weeks are always tiny).
    z is emitted as floor(1e6 * z) so float rounding-mode differences
    cannot break the value-hash compare; zero-variance weeks emit null.
    -> Table[week(date32), n_events, n_match, z_n_e6, z_match_e6],
    sorted by week."""
    from ..stages.agg import bucketed_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        wk = pc.cast(pc.floor_temporal(batch[ts_col], unit="week"),
                     pa.date32())
        m = pc.cast(pc.equal(batch[type_col], match_type), pa.int64())
        t = pa.table({"week": wk,
                      "n": pa.array(np.ones(batch.num_rows, np.int64)),
                      "n_match": pc.fill_null(m, 0)})
        g = t.group_by(["week"]).aggregate([("n", "sum"),
                                            ("n_match", "sum")])
        return g.rename_columns(["week", "n", "n_match"])

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["week"], [("n", "sum"), ("n_match", "sum")])
    parts = []
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if {"week", "n_sum"} <= set(t.column_names) and t.num_rows:
            parts.append(t)
    empty = pa.table({"week": pa.array([], pa.date32()),
                      "n_events": pa.array([], pa.int64()),
                      "n_match": pa.array([], pa.int64()),
                      "z_n_e6": pa.array([], pa.int64()),
                      "z_match_e6": pa.array([], pa.int64())})
    if not parts:
        return empty
    t = pa.concat_tables(parts).group_by(["week"]).aggregate(
        [("n_sum", "sum"), ("n_match_sum", "sum")])
    t = t.sort_by([("week", "ascending")])
    weeks = t["week"]
    n = t["n_sum_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = t["n_match_sum_sum"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)

    def loo_z_e6(x: np.ndarray):
        """floor(1e6 * leave-one-out z) per element; null when the
        other-weeks variance is zero or fewer than 2 others exist.
        Same op order as the SQL oracle — and S/Q accumulate as PYTHON
        ints (the oracle's BIGINT sums are exact; a float64 sum of
        squares rounds once weekly counts pass ~9.5e7 and the floored
        z could then differ by 1): mean=(S-x)/(k-1),
        var=(Q-x^2)/(k-1)-mean^2."""
        k = x.size
        if k < 3:
            return [None] * k
        xs = [int(v) for v in x]
        S = sum(xs)
        Q = sum(v * v for v in xs)
        out = []
        for xi in xs:
            # float() the EXACT integer difference first, then divide —
            # the oracle casts its BIGINT to float64 before the division,
            # and Python's int/int single-rounding could differ past 2^53
            mean = float(S - xi) / (k - 1.0)
            var = float(Q - xi * xi) / (k - 1.0) - mean * mean
            if var <= 0:
                out.append(None)
            else:
                out.append(int(np.floor(
                    1e6 * (float(xi) - mean) / np.sqrt(var))))
        return out

    return pa.table({"week": weeks,
                     "n_events": pa.array(n, pa.int64()),
                     "n_match": pa.array(m, pa.int64()),
                     "z_n_e6": pa.array(loo_z_e6(n), pa.int64()),
                     "z_match_e6": pa.array(loo_z_e6(m), pa.int64())})


def screen_runs(repo: MetricsRepository, metrics: Sequence[str],
                z_thresh: float = 3.0, min_history: int = 2,
                min_dev: float = 0.0,
                include: Optional[Sequence[str]] = None) -> dict:
    """Leave-one-out anomaly screen across recorded runs: each run's
    profile is checked against all the others -> {run_id: flagged-rows
    table} for runs with >= 1 anomaly.  The post-hoc complement of
    record_and_check (which only sees earlier runs): use it when all
    runs exist up front — e.g. partitions of one job, where a corrupt
    input shard is the partition whose rates deviate.

    `include`: restrict to these run ids (both as screened runs AND as
    each other's baseline) — a shared repo dir may hold records from
    OTHER jobs with different profile shapes, which must neither be
    screened nor pollute the baseline.  Every profile loads exactly
    once (one parquet read per run, not one per PAIR)."""
    rids = repo.run_ids()
    if include is not None:
        want = set(include)
        missing = sorted(want - set(rids))
        if missing:
            # an expected-but-unrecorded run must not read as "clean"
            raise ValueError(f"screen_runs: include ids {missing} have "
                             f"no recorded profile")
        rids = [r for r in rids if r in want]
    profiles = {rid: pq.read_table(repo._path(rid)) for rid in rids}
    out = {}
    for rid in rids:
        others = [profiles[r] for r in rids if r != rid]
        history = pa.concat_tables(others, promote_options="default") \
            if others else pa.table({"column": pa.array([], pa.string())})
        cur = profiles[rid].drop_columns(["run_id"])
        rep = anomaly_check(history, cur, metrics,
                            z_thresh, min_history, min_dev)
        flagged = rep.filter(pc.equal(rep["anomaly"], True))
        if flagged.num_rows:
            out[rid] = flagged
    return out

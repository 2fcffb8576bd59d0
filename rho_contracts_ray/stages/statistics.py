"""Distributed statistical analytics: grouped bivariate statistics
(corr / covariance / OLS line), grouped z-score normalization, weekly
cohort retention, and an ordered multi-step funnel.

All four follow the engine's wide-op rule: reduce inside `map_batches`
FIRST so the exchange moves short per-(batch, group) partial rows, never
raw rows — except the funnel, whose ordered-step semantics genuinely
need each user's (type, ts) events co-located; those rows are filtered
to the funnel's own event types before they ride the exchange.

Reference parity: these are dataset-level analytics in the spirit of the
reference's table-summary constraints (rho-contracts src/validate.js
rollups); the corr/covar/regr and window semantics follow ANSI SQL as
implemented by DuckDB (covar_samp / regr_slope / stddev_samp).

Numerics: the moment-sum formulas (n, Σx, Σy, Σx², Σy², Σxy) match
DuckDB's streaming implementations to ~1e-10 relative on double inputs;
query layers round outputs (corr 6dp, covar 2dp, slope 4dp) so the
distributed partial-sum order never shows in oracle hashes — validated
against DuckDB at sf0.01 and sf0.1.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _f64(col) -> "pc.Expression":
    return pc.cast(col, pa.float64())


def group_bivariate_stats(ds, keys: Sequence[str], x: str, y: str):
    """Per-group bivariate moments -> (keys..., n, corr_xy, covar, slope,
    icept, sdx, sdy).  SQL: corr(y, x), covar_samp(y, x), regr_slope(y, x)
    (y on x), regr_intercept, stddev_samp.  Rows where either column is
    null are dropped first — SQL parity is `WHERE x IS NOT NULL AND y IS
    NOT NULL`, so `n` counts COMPLETE pairs and a group with no complete
    pair is omitted entirely.  Groups with n < 2 report nulls for every
    statistic (DuckDB parity).

    Exchange cost: 7 doubles per (batch, group) — raw rows never move.
    Outputs are UNROUNDED; callers round to taste."""
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(batch[x]), pc.is_valid(batch[y]))
        t = batch.filter(ok)
        xs, ys = _f64(t[x]), _f64(t[y])
        t2 = pa.table({**{k: t[k] for k in keys},
                       "sx": xs, "sy": ys,
                       "sxx": pc.multiply(xs, xs),
                       "syy": pc.multiply(ys, ys),
                       "sxy": pc.multiply(xs, ys)})
        g = t2.group_by(keys).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxx", "sum"),
             ("syy", "sum"), ("sxy", "sum"), ([], "count_all")])
        return g.rename_columns(keys + ["sx", "sy", "sxx", "syy",
                                        "sxy", "n"])

    from .agg import bucketed_group_agg

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"), keys,
        [("sx", "sum"), ("sy", "sum"), ("sxx", "sum"),
         ("syy", "sum"), ("sxy", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx_sum"].to_numpy(zero_copy_only=False)
        sy = t["sy_sum"].to_numpy(zero_copy_only=False)
        sxx = t["sxx_sum"].to_numpy(zero_copy_only=False)
        syy = t["syy_sum"].to_numpy(zero_copy_only=False)
        sxy = t["sxy_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            nm1 = np.where(n > 1, n - 1.0, np.nan)
            vx = (sxx - sx * sx / n) / nm1
            vy = (syy - sy * sy / n) / nm1
            cov = (sxy - sx * sy / n) / nm1
            corr = cov / np.sqrt(vx * vy)
            slope = cov / vx
            icept = sy / n - slope * (sx / n)
        cols = {k: t[k] for k in keys}
        cols["n"] = pc.cast(t["n_sum"], pa.int64())
        for name, arr in [("corr_xy", corr), ("covar", cov),
                          ("slope", slope), ("icept", icept),
                          ("sdx", np.sqrt(vx)), ("sdy", np.sqrt(vy))]:
            cols[name] = pa.array(arr, pa.float64(), from_pandas=True)
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def group_zscore(ds, key: str, value: str, id_cols: Sequence[str],
                 ndigits: int = 6):
    """Z-score normalization within each `key` group -> (id_cols...,
    key, value, z) with z rounded to `ndigits`.  SQL: (value - avg(value)
    OVER (PARTITION BY key)) / stddev_samp(value) OVER (PARTITION BY key).

    Two streaming passes: a grouped moment reduce (the group-stats table
    is one short row per key — broadcast once with ray.put), then a
    stateless map over the input.  Groups with stddev 0 or n < 2 emit
    null z (SQL division-by-null parity).  Null values keep null z."""
    import ray

    id_cols = list(id_cols)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[value]))
        v = _f64(t[value])
        t2 = pa.table({key: t[key], "s": v, "ss": pc.multiply(v, v)})
        g = t2.group_by([key]).aggregate(
            [("s", "sum"), ("ss", "sum"), ([], "count_all")])
        return g.rename_columns([key, "s", "ss", "n"])

    from .agg import bucketed_group_agg

    stats = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"), [key],
        [("s", "sum"), ("ss", "sum"), ("n", "sum")])
    _parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
              for b in stats.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
    if _parts:
        st = pa.concat_tables(_parts)
    else:
        # all-null value column / empty input: zero stats batches —
        # concat of [] would raise; every z then falls to null
        from .agg import col_type
        st = pa.table({key: pa.array([], col_type(ds, key)),
                       "s_sum": pa.array([], pa.float64()),
                       "ss_sum": pa.array([], pa.float64()),
                       "n_sum": pa.array([], pa.int64())})
    n = st["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = st["s_sum"].to_numpy(zero_copy_only=False)
    ss = st["ss_sum"].to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s / n
        sd = np.sqrt((ss - s * s / n) / np.where(n > 1, n - 1.0, np.nan))
    sd = np.where(sd > 0, sd, np.nan)
    key_vals = st[key].combine_chunks() if st.num_rows else st[key]
    # broadcast (keys, mean, sd) once; per batch it's one index_in + take
    ref = ray.put((key_vals,
                   np.append(mean, np.nan), np.append(sd, np.nan)))

    def apply(batch: pa.Table) -> pa.Table:
        kv, means, sds = ray.get(ref)
        idx = pc.fill_null(
            pc.index_in(batch[key], value_set=kv), len(means) - 1)
        idx = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        ms, ds_ = means[idx], sds[idx]
        v = _f64(batch[value]).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            z = np.round((v - ms) / ds_, ndigits)
        return pa.table({**{c: batch[c] for c in id_cols},
                         key: batch[key], value: batch[value],
                         "z": pa.array(z, pa.float64(), from_pandas=True)})

    return ds.map_batches(apply, batch_format="pyarrow")


def retention_counts(ds, user: str, ts: str):
    """Weekly cohort retention -> (cohort_week, week_offset, users):
    for each user's first active ISO week (the cohort), how many of the
    cohort's users were active `week_offset` weeks later.

    Pass 1 reduces each batch to DISTINCT (user, week) rows (weeks per
    user are bounded — a year is 52 rows); the exchange co-locates each
    user's weeks, emits (cohort_week, week_offset) per active week, and
    a second short exchange counts users per cell.  Raw events never
    move."""
    def partial(batch: pa.Table) -> pa.Table:
        # null timestamps drop (documented; a null wk would NaN-poison
        # the int64 week arithmetic in the bucket body)
        batch = batch.filter(pc.is_valid(batch[ts]))
        t = pa.table({user: batch[user],
                      "wk": pc.floor_temporal(batch[ts], unit="week")})
        g = t.group_by([user, "wk"]).aggregate([([], "count_all")])
        return g.select([user, "wk"])

    from .agg import bucketed_apply, bucketed_sum

    def per_user(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        # bucket holds many users; dedup (user, wk) across batches, then
        # per-user min via a sorted run scan — no per-group Python
        t = t.group_by([user, "wk"]).aggregate([([], "count_all")])
        t = t.take(pc.sort_indices(
            t, sort_keys=[(user, "ascending"), ("wk", "ascending")]))
        u = t[user].to_numpy(zero_copy_only=False)
        wk = t["wk"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cohort = np.repeat(wk[starts], np.diff(np.r_[starts, u.size]))
        off = (wk - cohort) // (7 * 86_400_000_000)
        out = pa.table({
            "cohort_week": pa.array(cohort).cast(pa.timestamp("us")),
            "week_offset": pa.array(off, pa.int64()),
            "users": pa.array(np.ones(u.size, np.int64))})
        # pre-combine per bucket so exchange #2 moves one row per cell
        g = out.group_by(["cohort_week", "week_offset"]).aggregate(
            [("users", "sum")])
        return g.rename_columns(["cohort_week", "week_offset", "users"])

    def empty() -> pa.Table:
        return pa.table({"cohort_week": pa.array([], pa.timestamp("us")),
                         "week_offset": pa.array([], pa.int64()),
                         "users": pa.array([], pa.int64())})

    cells = bucketed_apply(ds.map_batches(partial, batch_format="pyarrow"),
                           [user], per_user, empty)
    return bucketed_sum(cells, ["cohort_week", "week_offset"], ["users"])


def funnel_steps(ds, user: str, ts: str, type_col: str,
                 steps: Sequence[str]):
    """Ordered funnel -> one row (step_1..step_k counts, conversion):
    step i counts users whose first step-i event at-or-after their
    first step-(i-1) completion exists.  SQL parity: chained
    min(ts) >= previous-step min(ts) CTEs.

    Events are FILTERED to the funnel's own types before the exchange —
    the only raw-row movement is the funnel-relevant slice, co-located
    per user (per-user event counts are bounded in practice; the bucket
    body is one sort + reduceat, no per-user Python)."""
    steps = list(steps)
    k = len(steps)

    def filt(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[type_col], value_set=pa.array(steps))
        t = batch.filter(m)
        return pa.table({user: t[user], "ts": t[ts],
                         "step": t[type_col]})

    from .agg import bucketed_apply

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        t = t.take(pc.sort_indices(
            t, sort_keys=[(user, "ascending"), ("ts", "ascending")]))
        u = t[user].to_numpy(zero_copy_only=False)
        tsv = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        step_col = t["step"]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg = np.repeat(np.arange(starts.size), np.diff(np.r_[starts,
                                                              u.size]))
        counts = np.zeros(k, np.int64)
        INF = np.int64(2**62)
        gate = np.full(starts.size, -INF)       # first-step gate per user
        alive = np.ones(starts.size, bool)
        for i, s in enumerate(steps):
            is_s = pc.equal(step_col, s).to_numpy(zero_copy_only=False)
            ok = is_s & (tsv >= gate[seg]) & alive[seg]
            tv = np.where(ok, tsv, INF)
            first = np.minimum.reduceat(tv, starts)
            alive = alive & (first < INF)
            gate = np.where(alive, first, gate)
            counts[i] = int(alive.sum())
        return pa.table({f"step_{i+1}_{s}": pa.array([counts[i]])
                         for i, s in enumerate(steps)})

    def empty() -> pa.Table:
        return pa.table({f"step_{i+1}_{s}": pa.array([], pa.int64())
                         for i, s in enumerate(steps)})

    parts = bucketed_apply(ds.map_batches(filt, batch_format="pyarrow"),
                           [user], per_bucket, empty)
    # per-bucket single rows -> one global row (tiny: <= n_buckets rows)
    _parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
              for b in parts.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
    # zero matching events -> zero batches; report zero counts, not a
    # concat ValueError
    tbl = pa.concat_tables(_parts) if _parts else pa.table({})
    cols = {}
    for i, s in enumerate(steps):
        c = f"step_{i+1}_{s}"
        v = int(pc.sum(tbl[c]).as_py() or 0) if tbl.num_rows else 0
        cols[c] = pa.array([v], pa.int64())
    first = cols[f"step_1_{steps[0]}"][0].as_py()
    last = cols[f"step_{k}_{steps[-1]}"][0].as_py()
    conv = round(last / first, 6) if first else None
    cols["conversion"] = pa.array([conv], pa.float64())
    return pa.table(cols)


def ohlc_bars(ds, key: str, ts: str, value: str, unit: str = "day",
              sum_digits: int = 6):
    """Time-bucketed OHLC bars per key -> (key, bar, open, high, low,
    close, n, total): the first/last (by `ts`) and min/max values of
    each (key, time-bucket) group — SQL arg_min(value, ts) /
    arg_max(value, ts) / min / max / count / round(sum).  `total` is
    rounded so distributed partial-sum order never shows; the other
    five are exact data values.  Ties on equal `ts` within a bar are
    broken arbitrarily — callers needing determinism must have unique
    ts per (key, bar) (the oracle dataset does).

    Scale shape: each batch reduces to one 9-field row per (batch, key,
    bar); the exchange combines partials with two sorted run-scans (for
    open/close provenance via the partials' min/max ts) and one Arrow
    group_by — raw rows never move."""
    from .agg import _first_per_key_run, bucketed_apply, col_type

    keys = [key, "bar"]

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key],
                      "bar": pc.floor_temporal(batch[ts], unit=unit),
                      "ts": batch[ts],
                      "v": _f64(batch[value])})
        # null value OR null timestamp rows drop (null bar/ts would
        # NaN-poison the int64 casts in the bucket body)
        t = t.filter(pc.and_(pc.is_valid(t["v"]), pc.is_valid(t["ts"])))
        if t.num_rows == 0:
            return _ohlc_partial_empty(t)
        t = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), ("bar", "ascending"), ("ts", "ascending")]))
        u = t[key].to_numpy(zero_copy_only=False)
        b = t["bar"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, (u[1:] != u[:-1])
                                      | (b[1:] != b[:-1])])
        ends = np.r_[starts[1:], u.size] - 1
        v = t["v"].to_numpy(zero_copy_only=False)
        tsv = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lows = np.minimum.reduceat(v, starts)
        highs = np.maximum.reduceat(v, starts)
        sums = np.add.reduceat(v, starts)
        ns = np.diff(np.r_[starts, u.size])
        sel = pa.array(starts)
        return pa.table({
            key: t[key].take(sel), "bar": t["bar"].take(sel),
            "open_ts": pa.array(tsv[starts]).cast(pa.timestamp("us")),
            "open": pa.array(v[starts]),
            "close_ts": pa.array(tsv[ends]).cast(pa.timestamp("us")),
            "close": pa.array(v[ends]),
            "low": pa.array(lows), "high": pa.array(highs),
            "n": pa.array(ns.astype(np.int64)),
            "s": pa.array(sums)})

    def _ohlc_partial_empty(t: pa.Table) -> pa.Table:
        tt = pa.timestamp("us")
        return pa.table({key: t[key], "bar": pa.array([], tt),
                         "open_ts": pa.array([], tt),
                         "open": pa.array([], pa.float64()),
                         "close_ts": pa.array([], tt),
                         "close": pa.array([], pa.float64()),
                         "low": pa.array([], pa.float64()),
                         "high": pa.array([], pa.float64()),
                         "n": pa.array([], pa.int64()),
                         "s": pa.array([], pa.float64())})

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        g = t.group_by(keys).aggregate(
            [("low", "min"), ("high", "max"), ("n", "sum"), ("s", "sum")])
        opens = _first_per_key_run(
            t.select(keys + ["open_ts", "open"]), keys,
            [(key, "ascending"), ("bar", "ascending"),
             ("open_ts", "ascending")])
        closes = _first_per_key_run(
            t.select(keys + ["close_ts", "close"]), keys,
            [(key, "ascending"), ("bar", "ascending"),
             ("close_ts", "descending")])
        out = g.join(opens.drop_columns(["open_ts"]), keys=keys,
                     join_type="inner")
        out = out.join(closes.drop_columns(["close_ts"]), keys=keys,
                       join_type="inner")
        return pa.table({
            key: out[key], "bar": out["bar"],
            "open": out["open"], "high": out["high_max"],
            "low": out["low_min"], "close": out["close"],
            "n": pc.cast(out["n_sum"], pa.int64()),
            "total": pc.round(out["s_sum"], sum_digits)})

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        tt = pa.timestamp("us")
        f = pa.float64()
        return pa.table({key: pa.array([], ktype),
                         "bar": pa.array([], tt), "open": pa.array([], f),
                         "high": pa.array([], f), "low": pa.array([], f),
                         "close": pa.array([], f),
                         "n": pa.array([], pa.int64()),
                         "total": pa.array([], f)})

    return bucketed_apply(ds.map_batches(partial, batch_format="pyarrow"),
                          keys, combine, empty)


def group_mad(ds, key: str, value: str):
    """Robust per-group spread -> (key, med, mad, n): discrete median and
    median-absolute-deviation with the quantile_disc picking rule (the
    sorted element at ceil(q·n)−1 — picked values ARE data values /
    single IEEE |x−med| results, so a DuckDB oracle compares
    value-exact).  Nulls and NaNs are skipped within a group (SQL
    parity); an all-null group yields null med/mad with n = 0.

    Scale shape: exact medians need the group co-located — one exchange
    by key, then TWO segment-vectorized sorted passes per bucket (values,
    then absolute deviations); no per-group Python."""
    from .agg import bucketed_apply
    from .joins import _empty_out, _key_run_starts

    def _valid_mask(v: pa.Array):
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.invert(pc.fill_null(pc.is_nan(v), True)))
        return ok

    def _disc_pick(s: pa.Table, col: str, starts: np.ndarray):
        v = s[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        valid = _valid_mask(v).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_valid = (np.add.reduceat(valid, starts)
                   if starts.size else np.empty(0, np.int64))
        idx = starts + np.maximum(
            np.ceil(0.5 * n_valid).astype(np.int64) - 1, 0)
        picked = v.take(pa.array(idx))
        picked = pc.if_else(pa.array(n_valid == 0),
                            pa.nulls(len(idx), v.type), picked)
        return picked, n_valid

    def body(t: pa.Table) -> pa.Table:
        s = t.select([key, value]).take(pc.sort_indices(
            t.select([key, value]),
            sort_keys=[(key, "ascending"), (value, "ascending")],
            null_placement="at_end"))
        starts = _key_run_starts(s, key)
        med, n_valid = _disc_pick(s, value, starts)
        # per-row |x - med(group)| via run-repeated medians, then the
        # same sorted pick on the deviations
        lens = np.diff(np.r_[starts, s.num_rows])
        med_rep = med.take(pa.array(
            np.repeat(np.arange(starts.size), lens)))
        dev = pc.abs(pc.subtract(pc.cast(s[value], pa.float64()),
                                 pc.cast(med_rep, pa.float64())))
        d = pa.table({key: s[key], "d": dev})
        d = d.take(pc.sort_indices(
            d, sort_keys=[(key, "ascending"), ("d", "ascending")],
            null_placement="at_end"))
        starts_d = _key_run_starts(d, key)
        mad, _ = _disc_pick(d, "d", starts_d)
        # both passes sort by the same key set -> identical run order
        return pa.table({key: s[key].take(pa.array(starts)),
                         "med": pc.cast(med, pa.float64()),
                         "mad": mad,
                         "n": pa.array(n_valid, pa.int64())})

    sub = ds.select_columns([key, value])
    return bucketed_apply(sub, [key], body, lambda: _empty_out(sub, body))


def resample_ffill(ds, key: str, ts: str, value: str, out_col: str):
    """Per-key daily resampling with forward fill -> (key, day, out_col):
    a DENSE day grid from each key's first to last active day, carrying
    the key's last-observed `value` forward across gap days.  SQL parity:
    generate_series over the per-key bounds ASOF-joined to the per-day
    last value (ties on equal ts within a day are broken arbitrarily —
    deterministic when ts is unique per (key, day), as in the oracle
    dataset).

    Scale shape: each batch pre-reduces to one (key, day, last_ts, value)
    row per (batch, key, day); one exchange by key; the fill itself is a
    pure np.repeat of observed values over their gap lengths — no grid
    materialization beyond the output rows, no per-key Python."""
    from .agg import bucketed_apply, col_type

    DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key],
                      "day": pc.floor_temporal(batch[ts], unit="day"),
                      "o": batch[ts], "v": _f64(batch[value])})
        # null value OR null timestamp rows drop (null day/o would
        # NaN-poison the int64 casts in the bucket body)
        t = t.filter(pc.and_(pc.is_valid(t["v"]), pc.is_valid(t["o"])))
        if t.num_rows == 0:
            return pa.table({key: t[key],
                             "day": pa.array([], pa.timestamp("us")),
                             "o": pa.array([], pa.timestamp("us")),
                             "v": pa.array([], pa.float64())})
        # last (by ts) value per (key, day) within the batch
        s = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), ("day", "ascending"), ("o", "descending")]))
        u = s[key].to_numpy(zero_copy_only=False)
        d = s["day"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        firsts = np.flatnonzero(np.r_[True, (u[1:] != u[:-1])
                                      | (d[1:] != d[:-1])])
        return s.take(pa.array(firsts))

    def body(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        # combine batch partials: newest ts wins per (key, day)
        s = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), ("day", "ascending"), ("o", "descending")]))
        u = s[key].to_numpy(zero_copy_only=False)
        d = s["day"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(np.r_[True, (u[1:] != u[:-1])
                                    | (d[1:] != d[:-1])])
        u, d = u[keep], d[keep]
        v = s["v"].to_numpy(zero_copy_only=False)[keep]
        kcol = s[key].take(pa.array(keep))
        # per-key dense spans: each observation covers the gap up to the
        # next observation (the last covers through the key's max day)
        kstart = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        klen = np.diff(np.r_[kstart, u.size])
        last_day = np.repeat(d[kstart + klen - 1], klen)
        nxt = np.r_[d[1:], 0]
        is_last = np.zeros(u.size, bool)
        is_last[kstart + klen - 1] = True
        cover = np.where(is_last, (last_day - d) // DAY + 1,
                         (nxt - d) // DAY)
        cover = cover.astype(np.int64)
        total = int(cover.sum())
        src = np.repeat(np.arange(u.size), cover)
        # day offsets inside each covered span: global arange minus the
        # span's own cumulative start
        offs = (np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(cover) - cover, cover))
        days = d[src] + offs * DAY
        return pa.table({
            key: kcol.take(pa.array(src)),
            "day": pa.array(days).cast(pa.timestamp("us")),
            out_col: pa.array(v[src]),
        })

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "day": pa.array([], pa.timestamp("us")),
                         out_col: pa.array([], pa.float64())})

    return bucketed_apply(ds.map_batches(partial, batch_format="pyarrow"),
                          [key], body, empty)


def group_entropy(ds, key: str, value: str, out_col: str = "entropy"):
    """Per-group Shannon entropy of the categorical `value` distribution
    -> (key, out_col, n): H = -Σ (c/n)·ln(c/n) over the value counts of
    each key.  A concentration/diversity score for training-data mixes
    (how varied are a user's event types / a source's languages).  Null
    values count as their own category (SQL GROUP BY groups NULLs
    together); null keys form their own group.

    Scale shape: batches pre-aggregate to (key, value, cnt) partials, so
    the single hash exchange moves one short row per distinct (key,
    value) per batch — never raw rows; the per-key fold is one Arrow
    group_by + segment reduceat per bucket."""
    from .agg import bucketed_apply
    from .joins import _empty_out, _key_run_starts

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key, value]).group_by([key, value]) \
            .aggregate([([], "count_all")])
        return pa.table({key: g[key], value: g[value],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    def body(t: pa.Table) -> pa.Table:
        # re-merge the per-batch partials of this bucket, then one sorted
        # segment pass per key
        g = t.group_by([key, value]).aggregate([("cnt", "sum")])
        s = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending")],
                                   null_placement="at_end"))
        starts = _key_run_starts(s, key)
        c = s["cnt_sum"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cnp = c.to_numpy(zero_copy_only=False).astype(np.float64)
        n = (np.add.reduceat(cnp, starts)
             if starts.size else np.empty(0, np.float64))
        lens = np.diff(np.r_[starts, s.num_rows])
        p = cnp / np.repeat(n, lens)
        terms = -p * np.log(p)
        h = (np.add.reduceat(terms, starts)
             if starts.size else np.empty(0, np.float64))
        return pa.table({key: s[key].take(pa.array(starts)),
                         out_col: pa.array(h, pa.float64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    sub = ds.select_columns([key, value])
    mapped = sub.map_batches(partial, batch_format="pyarrow")
    return bucketed_apply(mapped, [key], body,
                          lambda: _empty_out(mapped, body))


def group_winsorize(ds, key: str, value: str,
                    lo_q: float = 0.05, hi_q: float = 0.95):
    """Per-group winsorized aggregate -> (key, n, lo_fence, hi_fence,
    win_sum, win_mean): values clipped to the group's exact quantile_disc
    fences (the sorted element at ceil(q·n)−1, so fences ARE data values)
    before summing.  Nulls and NaNs are skipped like the SQL pre-filter;
    a group with no valid value is omitted.

    Scale shape: exact fences need the group co-located — one exchange by
    key, one Arrow sort per bucket, then clip + segment sums over the
    already-sorted runs; no per-group Python.  Outputs are UNROUNDED;
    callers round to taste (sum-order float noise sits ~1e-10 below any
    sane rounding)."""
    from .agg import bucketed_apply
    from .joins import _empty_out, _key_run_starts

    if not (0.0 <= lo_q <= hi_q <= 1.0):
        # np.clip with lo > hi silently collapses every value to hi —
        # refuse a swapped/out-of-range fence pair loudly
        raise ValueError(
            f"group_winsorize: need 0 <= lo_q <= hi_q <= 1, got "
            f"lo_q={lo_q}, hi_q={hi_q}")

    def body(t: pa.Table) -> pa.Table:
        s = t.select([key, value]).take(pc.sort_indices(
            t.select([key, value]),
            sort_keys=[(key, "ascending"), (value, "ascending")],
            null_placement="at_end"))
        starts = _key_run_starts(s, key)
        v = s[value]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.invert(pc.fill_null(pc.is_nan(v), True)))
        ok_np = ok.to_numpy(zero_copy_only=False).astype(np.int64)
        n_valid = (np.add.reduceat(ok_np, starts)
                   if starts.size else np.empty(0, np.int64))
        vnp = pc.cast(v, pa.float64()).to_numpy(zero_copy_only=False)

        def pick(q: float) -> np.ndarray:
            idx = starts + np.maximum(
                np.ceil(q * n_valid).astype(np.int64) - 1, 0)
            return vnp[idx]

        lo_f, hi_f = pick(lo_q), pick(hi_q)
        lens = np.diff(np.r_[starts, s.num_rows])
        rep = np.arange(starts.size).repeat(lens)
        clipped = np.clip(vnp, lo_f[rep], hi_f[rep])
        clipped = np.where(ok_np.astype(bool), clipped, 0.0)
        sums = (np.add.reduceat(clipped, starts)
                if starts.size else np.empty(0, np.float64))
        keep = n_valid > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            means = sums / n_valid
        return pa.table({
            key: s[key].take(pa.array(starts)).filter(pa.array(keep)),
            "n": pa.array(n_valid[keep], pa.int64()),
            "lo_fence": pa.array(lo_f[keep], pa.float64()),
            "hi_fence": pa.array(hi_f[keep], pa.float64()),
            "win_sum": pa.array(sums[keep], pa.float64()),
            "win_mean": pa.array(means[keep], pa.float64())})

    sub = ds.select_columns([key, value])
    return bucketed_apply(sub, [key], body, lambda: _empty_out(sub, body))


def group_higher_moments(ds, key: str, value: str):
    """Per-group skewness / excess kurtosis from raw power sums ->
    (key, n, mean, skew, kurt): per-batch partials carry 4 power sums +
    count (5 doubles per (batch, group) — raw rows never move), the
    closed-form population-moment expressions evaluate once per group.
    The SQL oracle evaluates the SAME power-sum expressions (NOT DuckDB's
    one-pass skewness()/kurtosis() built-ins, whose bias corrections and
    update order differ); with integer-valued inputs the power sums are
    exact in any order, so agreement holds to rounding depth.  Null
    values are dropped (SQL parity); groups with m2 == 0 yield null
    skew/kurt."""
    from .agg import bucketed_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[value]))
        x = _f64(t[value])
        x2 = pc.multiply(x, x)
        t2 = pa.table({key: t[key], "s1": x, "s2": x2,
                       "s3": pc.multiply(x2, x),
                       "s4": pc.multiply(x2, x2)})
        g = t2.group_by([key]).aggregate(
            [("s1", "sum"), ("s2", "sum"), ("s3", "sum"),
             ("s4", "sum"), ([], "count_all")])
        return g.rename_columns([key, "s1", "s2", "s3", "s4", "n"])

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"), [key],
        [("s1", "sum"), ("s2", "sum"), ("s3", "sum"), ("s4", "sum"),
         ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["s1_sum"].to_numpy(zero_copy_only=False)
        s2 = t["s2_sum"].to_numpy(zero_copy_only=False)
        s3 = t["s3_sum"].to_numpy(zero_copy_only=False)
        s4 = t["s4_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            m = s1 / n
            m2 = s2 / n - m * m
            m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m ** 3
            m4 = (s4 / n - 4.0 * m * (s3 / n)
                  + 6.0 * m * m * (s2 / n) - 3.0 * m ** 4)
            skew = np.where(m2 > 0, m3 / np.power(m2, 1.5), np.nan)
            kurt = np.where(m2 > 0, m4 / (m2 * m2) - 3.0, np.nan)
        return pa.table({
            key: t[key],
            "n": pc.cast(t["n_sum"], pa.int64()),
            "mean": pa.array(m, pa.float64()),
            "skew": pa.array(skew, pa.float64(), from_pandas=True),
            "kurt": pa.array(kurt, pa.float64(), from_pandas=True)})

    return agg.map_batches(finish, batch_format="pyarrow")


def first_digit_counts(ds, col: str):
    """Benford's-law first-significant-digit distribution ->
    Dataset[digit, n] for the positive finite values of `col` — the
    classic fraud/synthetic-data screen.  digit = floor(v / 10^floor(
    log10 v)), identical C log10/floor on both sides, so the SQL oracle
    compares value-exact on integer counts.  Per-batch bincount partials
    (9 short rows per batch) through one tiny exchange."""
    from .agg import bucketed_sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        if v.size == 0:
            return pa.table({"digit": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = np.floor(v / np.power(10.0, np.floor(np.log10(v)))) \
            .astype(np.int64)
        cnt = np.bincount(d, minlength=10)[1:10]
        keep = cnt > 0
        return pa.table({
            "digit": pa.array(np.arange(1, 10)[keep]),
            "n": pa.array(cnt[keep].astype(np.int64))})

    return bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                        ["digit"], ["n"])


def group_weighted_median(ds, key: str, value: str, weight: str,
                          out_col: str = "wmedian"):
    """Lower weighted median per group -> Dataset[key, wmedian]: the
    smallest value whose running weight (ordered by value) reaches half
    the group's total weight.  The pick is a DATA value, so the SQL
    oracle (window cumsum + threshold + min) compares value-exact; ties
    in `value` are safe because the threshold can only be crossed inside
    a tie run, whose value is the answer regardless of intra-run order.
    Null values or null/non-positive weights drop first (SQL parity via
    the WHERE clause).

    One bucketed exchange; the bucket body is one Arrow sort + a
    segment cumsum + one searchsorted across all key runs — no per-group
    Python.

    Numerics: the per-group running weight is derived from one
    bucket-global float cumsum (rel = cw - run_base), so FLOAT weights
    accumulate ~n*eps cancellation error across earlier groups in the
    bucket and a value landing EXACTLY on half the total can flip the
    pick vs the SQL per-group cumsum; integer weights (the oracled
    queries use counts/cents) are exact."""
    from .agg import bucketed_apply

    def body(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t[value]), pc.is_valid(t[weight])),
                     pc.greater(t[weight], 0))
        t = t.filter(ok)
        if t.num_rows == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             out_col: pa.array([], pa.float64())})
        s = t.take(pc.sort_indices(
            t, sort_keys=[(key, "ascending"), (value, "ascending")]))
        from .agg import _run_starts_multi
        starts = _run_starts_multi(s, [key])
        w = s[weight].to_numpy(zero_copy_only=False).astype(np.float64)
        v = s[value].to_numpy(zero_copy_only=False).astype(np.float64)
        n = s.num_rows
        cw = np.cumsum(w)
        ends = np.append(starts[1:], n)
        base = np.concatenate(([0.0], cw))[starts]      # cumw before run
        totals = cw[ends - 1] - base
        # first index in each group where (cw - base) >= totals / 2 —
        # one vectorized mask + minimum.at, no per-group loop (the last
        # row of every group always qualifies, so every pick resolves)
        k = starts.size
        lens = ends - starts
        grp_of_row = np.repeat(np.arange(k, dtype=np.int64), lens)
        rel = cw - base[grp_of_row]
        idx = np.flatnonzero(rel >= totals[grp_of_row] / 2.0)
        pick = np.full(k, n, np.int64)
        np.minimum.at(pick, grp_of_row[idx], idx)
        return pa.table({key: s[key].take(pa.array(starts)),
                         out_col: pa.array(v[pick], pa.float64())})

    def empty() -> pa.Table:
        from .agg import col_type
        return pa.table({key: pa.array([], col_type(ds, key)),
                         out_col: pa.array([], pa.float64())})

    return bucketed_apply(ds, [key], body, empty)


def mann_kendall_s(ds, key: str, order_by: Sequence[str], value: str,
                   max_group: int = 100_000):
    """Mann-Kendall trend statistic per group -> Dataset[key, s_stat,
    n_obs]: S = sum over ordered pairs i<j of sign(v_j - v_i) — the
    standard nonparametric monotone-trend test, integer-valued so the
    SQL self-join oracle compares bit-exact (double compares, integer
    sums; NaN-free columns only — numpy and SQL disagree on NaN sign
    conventions).

    Scale/complexity shape: one bucketed exchange; the body walks each
    key run with an O(n^2) vectorized pairwise pass (searchsorted over
    the run's sorted prefix would be O(n log n) but the constant loses
    below ~10^4 rows/group).  Groups beyond `max_group` rows raise
    loudly rather than silently burning quadratic time — the same
    explicit ceiling convention as the fuzzy-dedup stage; long series
    need a windowed/sampled variant, not a silent stall."""
    from .agg import bucketed_apply, col_type

    order_by = list(order_by)
    sort_keys = [(key, "ascending")] + [(c, "ascending")
                 for c in order_by]

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "s_stat": pa.array([], pa.int64()),
                         "n_obs": pa.array([], pa.int64())})

    def body(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value]))   # SQL null-skipping parity
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        kcol = s[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(
            ([True], kv[1:] != kv[:-1])))
        ends = np.append(starts[1:], s.num_rows)
        v = s[value].to_numpy(zero_copy_only=False).astype(np.float64)
        lens = ends - starts
        if int(lens.max()) > max_group:
            raise ValueError(
                f"mann_kendall_s: a group has {int(lens.max())} rows "
                f"(> max_group={max_group}); the O(n^2) pairwise pass "
                f"would be quadratic — window or sample the series")
        out_s = np.empty(starts.size, np.int64)
        STRIP = 256   # bounds the pairwise temp at STRIP x n, not n x n
        for i in range(starts.size):   # per-RUN loop; inner is n^2 numpy
            seg = v[starts[i]:ends[i]]
            n = seg.size
            acc = 0
            cols = np.arange(n)
            for j0 in range(1, n, STRIP):
                jend = min(j0 + STRIP, n)
                d = seg[j0:jend, None] - seg[None, :]
                mask = cols[None, :] < np.arange(j0, jend)[:, None]
                acc += int((np.sign(d) * mask).sum())
            out_s[i] = acc
        return pa.table({key: kcol.take(pa.array(starts)),
                         "s_stat": pa.array(out_s),
                         "n_obs": pa.array(lens.astype(np.int64))})

    return bucketed_apply(ds, [key], body, empty)


def cusum_changepoint(ds, key: str, order_by: Sequence[str],
                      cents: str):
    """Integer-exact CUSUM change-point per group ->
    Dataset[key, cp_index, d_max, n_obs]: with c_1..c_n the group's
    integer series in `order_by` order, D_k = n * cumsum_k(c) - k * C
    (C = total) is n times the mean-centered cumulative sum — all
    integers, so the peak |D_k| and its FIRST index compare bit-exact
    against the SQL window form (no float mean, no argmax near-ties).
    Callers pre-scale doubles to integer cents.

    One exchange; the body is one sort + segment cumsum + one
    vectorized argmax per key run."""
    from .agg import bucketed_apply, col_type

    order_by = list(order_by)
    sort_keys = [(key, "ascending")] + [(c, "ascending")
                 for c in order_by]

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "cp_index": pa.array([], pa.int64()),
                         "d_max": pa.array([], pa.int64()),
                         "n_obs": pa.array([], pa.int64())})

    def body(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        kcol = s[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        n_rows = s.num_rows
        starts = np.flatnonzero(np.concatenate(
            ([True], kv[1:] != kv[:-1])))
        ends = np.append(starts[1:], n_rows)
        lens = (ends - starts).astype(np.int64)
        c = s[cents].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.repeat(np.arange(starts.size, dtype=np.int64), lens)
        cw = np.cumsum(c)
        base = np.concatenate(([0], cw))[starts]
        cum = cw - base[grp]                       # per-run cumsum
        tot = cw[ends - 1] - base                  # per-run totals
        k = np.arange(n_rows, dtype=np.int64) - np.repeat(starts, lens) + 1
        # |d| <= 2 * max|cents| * group_len^2: guard LOUDLY before the
        # int64 product wraps silently (docstring promises exactness)
        amax = float(np.abs(c).max()) if c.size else 0.0
        if 2.0 * amax * float(lens.max()) ** 2 >= float(1 << 62):
            raise ValueError(
                "cusum_changepoint: |cents| x group size risks int64 "
                "overflow in the cumulative statistic — rescale the "
                "series or split oversized groups")
        d = np.repeat(lens, lens) * cum - k * tot[grp]
        ad = np.abs(d)
        mx = np.zeros(starts.size, np.int64)
        np.maximum.at(mx, grp, ad)
        first = np.full(starts.size, n_rows, np.int64)
        hit = np.flatnonzero(ad == mx[grp])
        np.minimum.at(first, grp[hit], hit)
        return pa.table({key: kcol.take(pa.array(starts)),
                         "cp_index": pa.array(k[first]),
                         "d_max": pa.array(d[first]),
                         "n_obs": pa.array(lens)})

    return bucketed_apply(ds, [key], body, empty)


def theil_sen_slope(ds, key: str, x: str, value: str,
                    max_group: int = 10_000, ndigits: int = 6):
    """Theil-Sen robust slope per group -> Dataset[key, ts_slope,
    n_pairs]: the median of all pairwise slopes (v_j - v_i)/(x_j - x_i)
    over pairs with x_j > x_i — the estimator that shrugs off the
    outliers OLS chases.  The median interpolates exactly the way
    DuckDB's quantile_cont does (lo + frac*(hi - lo) at rn = 0.5*(n-1)),
    so the SQL self-join oracle agrees at `ndigits` rounding.

    Same loud O(n^2) ceiling convention as mann_kendall_s — the cap is
    MEMORY-motivated too: the dense pairwise pass allocates ~3 float64
    n x n temporaries (2.4 GB at the 10k default), so raising it needs
    a matching worker heap;
    one bucketed exchange, per-run vectorized pairwise slopes."""
    from .agg import bucketed_apply, col_type

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "ts_slope": pa.array([], pa.float64()),
                         "n_pairs": pa.array([], pa.int64())})

    def body(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value]),   # SQL null parity
                             pc.is_valid(t[x])))
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), (x, "ascending")]))
        kcol = s[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(
            ([True], kv[1:] != kv[:-1])))
        ends = np.append(starts[1:], s.num_rows)
        if int((ends - starts).max()) > max_group:
            raise ValueError(
                f"theil_sen_slope: a group has {int((ends-starts).max())}"
                f" rows (> max_group={max_group}); the O(n^2) pairwise "
                f"pass would be quadratic — window or sample the series")
        xs = s[x].to_numpy(zero_copy_only=False).astype(np.float64)
        vs = s[value].to_numpy(zero_copy_only=False).astype(np.float64)
        out_sl = np.full(starts.size, np.nan)
        out_np = np.zeros(starts.size, np.int64)
        for i in range(starts.size):   # per-RUN loop; inner is n^2 numpy
            sx, sv = xs[starts[i]:ends[i]], vs[starts[i]:ends[i]]
            dx = sx[None, :] - sx[:, None]
            dv = sv[None, :] - sv[:, None]
            m = np.triu(dx, 1) > 0      # strictly increasing x only
            slopes = np.sort(dv[m] / dx[m])
            out_np[i] = slopes.size
            if slopes.size:
                # DuckDB quantile_cont form: rn = q*(n-1), two-sided
                # weights (ceil(rn)-rn)*v[floor] + (rn-floor(rn))*v[ceil]
                rn = 0.5 * (slopes.size - 1)
                lo = int(np.floor(rn))
                hi = int(np.ceil(rn))
                med = slopes[lo] if hi == lo else \
                    (hi - rn) * slopes[lo] + (rn - lo) * slopes[hi]
                out_sl[i] = np.round(med, ndigits)
        keep = out_np > 0               # groups with no valid pair drop
        return pa.table({
            key: kcol.take(pa.array(starts[keep])),
            "ts_slope": pa.array(out_sl[keep], pa.float64()),
            "n_pairs": pa.array(out_np[keep])})

    return bucketed_apply(ds, [key], body, empty)


def spearman_rho(ds, key: str, x: str, y: str, ndigits: int = 6):
    """Spearman rank correlation per group -> Dataset[key, n_obs, rho]:
    Pearson correlation of the FRACTIONAL (average-for-ties) ranks of x
    and y inside each group — the standard tie-aware Spearman, matching
    the SQL window form `RANK() + (COUNT(*) OVER (PARTITION BY key, x)
    - 1)/2.0` fed into corr().  Rows where either column is null drop
    first (SQL `WHERE x IS NOT NULL AND y IS NOT NULL`).

    Ranks are exact halves (k or k+0.5), so the moment sums stay exact
    far beyond `ndigits` rounding for any realistic group size; groups
    with n < 2 or zero rank variance emit a null rho (DuckDB corr()
    parity).  One bucketed exchange; the body is one sort + per-run
    O(n log n) ranking — no quadratic pass."""
    from .agg import bucketed_apply, col_type

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "n_obs": pa.array([], pa.int64()),
                         "rho": pa.array([], pa.float64())})

    def _avg_ranks(seg: np.ndarray) -> np.ndarray:
        # average rank: cnt_less + (cnt_eq + 1)/2, 1-based
        order = np.argsort(seg, kind="stable")
        _, inv, cnt = np.unique(seg[order], return_inverse=True,
                                return_counts=True)
        ends = np.cumsum(cnt).astype(np.float64)
        avg = ends - (cnt - 1) / 2.0          # avg rank of each distinct
        r = np.empty(seg.size, np.float64)
        r[order] = avg[inv]
        return r

    def body(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        ok = pc.and_(pc.is_valid(t[x]), pc.is_valid(t[y]))
        t = t.filter(ok)
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending")]))
        kcol = s[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(
            ([True], kv[1:] != kv[:-1])))
        ends = np.append(starts[1:], s.num_rows)
        xs = s[x].to_numpy(zero_copy_only=False).astype(np.float64)
        ys = s[y].to_numpy(zero_copy_only=False).astype(np.float64)
        ns = (ends - starts).astype(np.int64)
        rho = np.full(starts.size, np.nan)
        for i in range(starts.size):       # per-RUN; inner is n log n
            a, b = starts[i], ends[i]
            n = b - a
            if n < 2:
                continue
            rx, ry = _avg_ranks(xs[a:b]), _avg_ranks(ys[a:b])
            sx, sy = rx.sum(), ry.sum()
            cov = n * (rx * ry).sum() - sx * sy
            vx = n * (rx * rx).sum() - sx * sx
            vy = n * (ry * ry).sum() - sy * sy
            if vx > 0 and vy > 0:
                rho[i] = np.round(cov / np.sqrt(vx * vy), ndigits)
        return pa.table({
            key: kcol.take(pa.array(starts)),
            "n_obs": pa.array(ns),
            "rho": pa.array([None if np.isnan(v) else float(v)
                             for v in rho], pa.float64())})

    return bucketed_apply(ds, [key], body, empty)


def autocorr_lag1(ds, key: str, order_by: Sequence[str], value: str,
                  ndigits: int = 6):
    """Lag-1 autocorrelation per group -> Dataset[key, n_pairs, acf1]:
    sample Pearson correlation between each value and its predecessor in
    `order_by` order — exactly `corr(value, lag(value) OVER (PARTITION
    BY key ORDER BY order_by))` with the first row of each group dropped
    (its lag is NULL).  Groups with fewer than 2 lag pairs are omitted
    (matching the SQL HAVING); zero-variance pairs emit null acf1.

    One bucketed exchange; the body is one sort + segment-vectorized
    reduceat sums — no per-group python loop."""
    from .agg import bucketed_apply, col_type

    order_by = list(order_by)
    sort_keys = [(key, "ascending")] + [(c, "ascending")
                 for c in order_by]

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "n_pairs": pa.array([], pa.int64()),
                         "acf1": pa.array([], pa.float64())})

    def body(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        kcol = s[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        n_rows = s.num_rows
        starts = np.flatnonzero(np.concatenate(
            ([True], kv[1:] != kv[:-1])))
        lens = np.diff(np.append(starts, n_rows))
        v = s[value].to_numpy(zero_copy_only=False).astype(np.float64)
        # lag pairs: every position that is not a run start
        is_start = np.zeros(n_rows, bool)
        is_start[starts] = True
        idx = np.flatnonzero(~is_start)
        xs, ys = v[idx - 1], v[idx]            # (prev, cur) pairs
        grp = np.repeat(np.arange(starts.size), lens)[idx]
        # pairs are already grouped-contiguous -> reduceat per run
        pair_starts = np.flatnonzero(np.concatenate(
            ([True], grp[1:] != grp[:-1]))) if idx.size else \
            np.array([], np.int64)
        gids = grp[pair_starts] if idx.size else np.array([], np.int64)
        def rsum(a):
            return np.add.reduceat(a, pair_starts) if idx.size else \
                np.array([], np.float64)
        n = np.diff(np.append(pair_starts, idx.size)).astype(np.float64)
        sx, sy = rsum(xs), rsum(ys)
        sxx, syy, sxy = rsum(xs * xs), rsum(ys * ys), rsum(xs * ys)
        keep = n >= 2
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            acf = cov / np.sqrt(vx * vy)
        acf = np.where((vx > 0) & (vy > 0), np.round(acf, ndigits),
                       np.nan)
        gk, nn, aa = gids[keep], n[keep].astype(np.int64), acf[keep]
        return pa.table({
            key: kcol.take(pa.array(starts[gk])),
            "n_pairs": pa.array(nn),
            "acf1": pa.array([None if np.isnan(a) else float(a)
                              for a in aa], pa.float64())})

    return bucketed_apply(ds, [key], body, empty)


def gini_coefficient(ds, key: str, cents: str, ndigits: int = 6):
    """Gini concentration coefficient per group -> Dataset[key, n_obs,
    gini]: with the group's non-negative integer series x_1<=...<=x_n
    sorted ascending, G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)).
    Every term is integer (callers pre-scale money to cents), so the
    numerator/denominator match the SQL ROW_NUMBER window form exactly
    and only the final division sees floats — bit-stable at `ndigits`
    rounding regardless of summation order (ties are interchangeable in
    sum(i*x_i)).  Groups with sum(x) == 0 emit null.

    One bucketed exchange; the body is one sort + reduceat — fully
    vectorized across runs."""
    from .agg import bucketed_apply, col_type

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "n_obs": pa.array([], pa.int64()),
                         "gini": pa.array([], pa.float64())})

    def body(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), (cents, "ascending")]))
        kcol = s[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        n_rows = s.num_rows
        starts = np.flatnonzero(np.concatenate(
            ([True], kv[1:] != kv[:-1])))
        lens = np.diff(np.append(starts, n_rows)).astype(np.int64)
        c = s[cents].to_numpy(zero_copy_only=False).astype(np.int64)
        i_in_run = (np.arange(n_rows, dtype=np.int64)
                    - np.repeat(starts, lens) + 1)
        # |num| <= 3 * max|cents| * group_len^2: guard LOUDLY before
        # the int64 product wraps silently (docstring promises exactness)
        amax = float(np.abs(c).max()) if c.size else 0.0
        if 3.0 * amax * float(lens.max()) ** 2 >= float(1 << 62):
            raise ValueError(
                "gini_coefficient: |cents| x group size risks int64 "
                "overflow in sum(i*x_i) — rescale the series or split "
                "oversized groups")
        six = np.add.reduceat(i_in_run * c, starts)
        sx = np.add.reduceat(c, starts)
        num = 2 * six - (lens + 1) * sx
        den = lens * sx
        with np.errstate(invalid="ignore", divide="ignore"):
            g = np.round(num.astype(np.float64) / den.astype(np.float64),
                         ndigits)
        return pa.table({
            key: kcol.take(pa.array(starts)),
            "n_obs": pa.array(lens),
            "gini": pa.array([None if d == 0 else float(v)
                              for v, d in zip(g, den)], pa.float64())})

    return bucketed_apply(ds, [key], body, empty)


def conversion_lag(ds, key: str, ts: str, type_col: str,
                   from_type: str, to_type: str):
    """Time-to-convert per key -> Dataset[key, from_us, to_us, lag_us]:
    the FIRST `from_type` event's timestamp, the first `to_type` event
    STRICTLY after it, and their gap in micros; keys that never convert
    are omitted (SQL inner-join parity).  Rows of other types are
    filtered before the exchange, so the shuffle moves only the two
    event types.

    One bucketed exchange; the body is one sort + masked reduceat-min
    per run — no per-group python."""
    from .agg import bucketed_apply, col_type

    ktype = col_type(ds, key)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         "from_us": pa.array([], pa.int64()),
                         "to_us": pa.array([], pa.int64()),
                         "lag_us": pa.array([], pa.int64())})

    def pre(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(batch[type_col],
                             value_set=pa.array([from_type, to_type])),
                    pc.is_valid(batch[ts]))   # null ts never converts
        t = batch.filter(m)
        return pa.table({key: t[key],
                         "us": pc.cast(t[ts], pa.int64()),
                         type_col: t[type_col]})

    slim = ds.map_batches(pre, batch_format="pyarrow")

    def body(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), ("us", "ascending")]))
        kcol = s[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(
            ([True], kv[1:] != kv[:-1])))
        us = s["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_from = pc.equal(s[type_col], from_type) \
            .to_numpy(zero_copy_only=False)
        BIG = np.iinfo(np.int64).max
        f = np.where(is_from, us, BIG)
        first_from = np.minimum.reduceat(f, starts)
        grp = np.repeat(np.arange(starts.size), np.diff(
            np.append(starts, s.num_rows)))
        # first to_type strictly after the key's first from_type
        is_to_after = (~is_from) & (us > first_from[grp])
        g2 = np.where(is_to_after, us, BIG)
        first_to = np.minimum.reduceat(g2, starts)
        keep = (first_from < BIG) & (first_to < BIG)
        return pa.table({
            key: kcol.take(pa.array(starts[keep])),
            "from_us": pa.array(first_from[keep]),
            "to_us": pa.array(first_to[keep]),
            "lag_us": pa.array(first_to[keep] - first_from[keep])})

    return bucketed_apply(slim, [key], body, empty)


def k_anonymity(ds, quasi_cols: Sequence[str], k: int = 5):
    """k-anonymity audit over quasi-identifier columns -> ONE row:
    (k, n_rows, n_groups, min_group_size, n_small_groups, rows_at_risk,
    risk_share round 6).  A group is an equivalence class on the quasi
    identifiers; rows in classes smaller than k are re-identifiable.

    Per-batch group-count partials reduce on one cardinality-sized
    exchange; the final fold over per-class sizes is another integer
    partial sum per block, so the driver only ever folds scalars.
    Null quasi values form their own class (SQL GROUP BY parity)."""
    from .agg import bucketed_sum

    quasi = list(quasi_cols)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(quasi).append_column(
            "n", pa.array(np.ones(batch.num_rows, np.int64))) \
            .group_by(quasi).aggregate([("n", "sum")])
        return g.rename_columns(quasi + ["n"])

    sizes = bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                         quasi, ["n"])

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = 0 if n.size == 0 else 1   # empty blocks emit NO partial row
        small = n < k
        return pa.table({
            "n_rows": pa.array([int(n.sum())] * rep, pa.int64()),
            "n_groups": pa.array([int(n.size)] * rep, pa.int64()),
            "min_group_size": pa.array(
                [int(n.min())] if rep else [], pa.int64()),
            "n_small_groups": pa.array(
                [int(small.sum())] * rep, pa.int64()),
            "rows_at_risk": pa.array(
                [int(n[small].sum())] * rep, pa.int64())})

    parts = [p for p in sizes.map_batches(
        fold, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow")]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
             for p in parts]
    parts = [p for p in parts if p.num_rows]
    if parts:
        m = pa.concat_tables(parts)
        n_rows = int(pc.sum(m["n_rows"]).as_py() or 0)
        n_groups = int(pc.sum(m["n_groups"]).as_py() or 0)
        mins = m["min_group_size"].to_numpy(zero_copy_only=False)
        min_sz = int(mins.min()) if n_groups else 0
        n_small = int(pc.sum(m["n_small_groups"]).as_py() or 0)
        at_risk = int(pc.sum(m["rows_at_risk"]).as_py() or 0)
    else:
        n_rows = n_groups = min_sz = n_small = at_risk = 0
    share = round(at_risk / n_rows, 6) if n_rows else 0.0
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n_rows": pa.array([n_rows], pa.int64()),
        "n_groups": pa.array([n_groups], pa.int64()),
        "min_group_size": pa.array([min_sz], pa.int64()),
        "n_small_groups": pa.array([n_small], pa.int64()),
        "rows_at_risk": pa.array([at_risk], pa.int64()),
        "risk_share": pa.array([share], pa.float64())})


def roc_auc(scored_ds, score_col: str, label_col: str):
    """Exact ROC-AUC of `score_col` against boolean `label_col` -> ONE
    row (n_pos, n_neg, auc round 6) — the Mann-Whitney rank form with
    exact tie handling: AUC = Σ_s np(s)·(N_below(s) + nn(s)/2) / (n1·n0),
    where s ranges over DISTINCT scores.

    Scale shape: per-batch (score -> n_pos, n_neg) integer partials, one
    cardinality-sized exchange (`bucketed_sum` on the distinct score),
    then the cumulative-negatives term rides `sorted_prefix_sum` (range
    sort + per-block offsets past its local tier) — the corpus itself
    never sorts and the driver folds one integer pair per block.  The
    numerator is kept ×2 so it stays exact in int64 up to ~3e18."""
    from .agg import bucketed_sum
    from .rank import sorted_prefix_sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_(pc.is_valid(batch[score_col]),
                                 pc.is_valid(batch[label_col])))
        lab = pc.cast(t[label_col], pa.int64())
        tt = pa.table({
            "score": t[score_col],
            "np_": pc.cast(lab, pa.int64()),
            "nn_": pc.subtract(pa.scalar(1, pa.int64()), lab)})
        g = tt.group_by(["score"]).aggregate(
            [("np_", "sum"), ("nn_", "sum")])
        return g.rename_columns(["score", "np_", "nn_"])

    per_score = bucketed_sum(
        scored_ds.map_batches(partial, batch_format="pyarrow"),
        ["score"], ["np_", "nn_"])
    with_cum = sorted_prefix_sum(per_score, "score", "nn_", "cum_nn")

    def fold(t: pa.Table) -> pa.Table:
        np_ = t["np_"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn_ = t["nn_"].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = t["cum_nn"].to_numpy(zero_copy_only=False).astype(np.int64)
        below = cum - nn_
        return pa.table({
            "num2": pa.array([int((np_ * (2 * below + nn_)).sum())],
                             pa.int64()),
            "n_pos": pa.array([int(np_.sum())], pa.int64()),
            "n_neg": pa.array([int(nn_.sum())], pa.int64())})

    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
             for p in with_cum.map_batches(
                 fold, batch_format="pyarrow").iter_batches(
                     batch_size=None, batch_format="pyarrow")]
    parts = [p for p in parts if p.num_rows]
    if parts:
        m = pa.concat_tables(parts)
        num2 = int(pc.sum(m["num2"]).as_py() or 0)
        n_pos = int(pc.sum(m["n_pos"]).as_py() or 0)
        n_neg = int(pc.sum(m["n_neg"]).as_py() or 0)
    else:
        num2 = n_pos = n_neg = 0
    auc = round(num2 / (2.0 * n_pos * n_neg), 6) if n_pos and n_neg \
        else None
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc": pa.array([auc], pa.float64())})


def daily_xcorr(ds, ts_col: str, type_col: str, type_a: str, type_b: str,
                lags: Sequence[int] = (-1, 0, 1)):
    """Cross-correlation of two event types' DAILY count series at the
    given day lags -> ONE row per lag (lag, n_days, xcorr round 6):
    does series A lead or trail series B?  xcorr(L) = corr(x_d, y_{d+L})
    over every day d where both d and d+L are in the observed-day
    universe (days with at least one A or B event).

    Scale shape: per-batch (day -> n_a, n_b) integer partials, one
    calendar-bounded exchange (`bucketed_sum` on the day ordinal), then
    the lag alignment runs on the driver over the day-cardinality series
    — bounded by calendar days, not data volume (the max_concurrent
    per-day-fold convention).  Pearson r from integer moment sums,
    6dp-rounded against SQL corr()."""
    from .agg import bucketed_sum

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch[ts_col]),
                    pc.is_in(batch[type_col],
                             value_set=pa.array([type_a, type_b])))
        t = batch.filter(m)
        us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        d = us // 86_400_000_000
        is_a = pc.equal(t[type_col], type_a).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tt = pa.table({"d": pa.array(d), "n_a": pa.array(is_a),
                       "n_b": pa.array(1 - is_a)})
        g = tt.group_by(["d"]).aggregate([("n_a", "sum"), ("n_b", "sum")])
        return g.rename_columns(["d", "n_a", "n_b"])

    daily = bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                         ["d"], ["n_a", "n_b"])
    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in daily.iter_batches(batch_size=None,
                                         batch_format="pyarrow")]
    parts = [t for t in parts if t.num_rows]
    out_lag, out_n, out_r = [], [], []
    if parts:
        t = pa.concat_tables(parts)
        t = t.take(pc.sort_indices(t, sort_keys=[("d", "ascending")]))
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        xa = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        xb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        for lag in lags:
            j = np.searchsorted(d, d + lag)
            ok = (j < d.size) & (d[np.minimum(j, d.size - 1)] == d + lag)
            x, y = xa[ok], xb[j[ok]]
            n = x.size
            out_lag.append(int(lag))
            out_n.append(int(n))
            if n < 2:
                out_r.append(None)
                continue
            sx, sy = x.sum(), y.sum()
            sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
            den = (n * sxx - sx * sx) * (n * syy - sy * sy)
            out_r.append(round(float((n * sxy - sx * sy)
                                     / np.sqrt(den)), 6)
                         if den > 0 else None)
    return pa.table({"lag": pa.array(out_lag, pa.int64()),
                     "n_days": pa.array(out_n, pa.int64()),
                     "xcorr": pa.array(out_r, pa.float64())})

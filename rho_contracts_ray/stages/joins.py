"""Join and window operators.

  * broadcast_join — the small side (dimension table) is `ray.put` once and
    Arrow-hash-joined into every batch: no shuffle, the pattern for
    fact×dim enrichment at any scale.
  * bucketed_join — both sides large: one unioned stream hash-range-routed
    by the join key (stages.agg.bucketed_apply — block refs into one
    reduce task per bucket, NO sort shuffle), one Arrow hash join per
    bucket.  B derives from input size; salt hot keys upstream when skewed.
  * asof_join — per-key ordered backward match (merge_asof), broadcast and
    both-large partitioned flavors — the streaming-window workhorse
    (e.g. "latest purchase before each event").
  * window_seq / window_cumsum / top_k_per_group / group_quantiles /
    group_count_distinct — per-key window computations on the same
    bucketed exchange; bucket bodies are one Arrow sort plus
    segment-vectorized numpy over key runs (no per-group calls).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(ds, small: pa.Table, on: Sequence[str],
                   how: str = "inner", suffix: str = "_r"):
    """Join every batch against a broadcast small table (dim side).  The
    small table is `ray.put` ONCE and read zero-copy per worker; the join
    itself is Arrow's hash join per batch — no arrow->pandas->arrow round
    trip of the payload columns, and null keys follow SQL semantics
    (never match) instead of pandas' NaN==NaN.

    Only inner/left are offered: a right/full-outer join applied
    independently PER BATCH would emit every never-matched small-side
    row once per batch and a phantom null-padded row for small rows that
    match in some OTHER batch — use `bucketed_join` (or
    full_outer-style pre-aggregation) for outer semantics."""
    import ray

    on = list(on)
    _HOWS = {"inner": "inner", "left": "left outer"}
    if how not in _HOWS:
        raise ValueError(
            f"broadcast_join: unsupported how={how!r} (supported: "
            f"{sorted(_HOWS)}; right/outer need both sides in one "
            f"exchange — use bucketed_join)")
    arrow_how = _HOWS[how]
    ref = ray.put(small)

    def merge(batch: pa.Table) -> pa.Table:
        return batch.join(ray.get(ref), keys=on, join_type=arrow_how,
                          right_suffix=suffix)

    return ds.map_batches(merge, batch_format="pyarrow")


def auto_buckets(left_ds, right_ds, target_rows: int = 250_000) -> int:
    """Derive the bucket count from the input size so each bucket's pandas
    merge stays ~target_rows: B grows with the data instead of being a
    fixed constant that would make buckets balloon at 1000x scale.

    Row counts are taken ONLY when available without executing the
    dataset (.count() is metadata-only for untouched reads, but runs the
    whole pipeline for a transformed Dataset — a silent 2x cost the
    auto-default must never impose).  Transformed inputs fall back to a
    CPU-count-scaled default; pass n_buckets to override."""
    from ..validate import _cluster_cpus

    def _meta_count(ds):
        # counts pinned at read time (sources.clean_read_parquet reads
        # them from the parquet footers) beat plan inspection
        pinned = getattr(ds, "_rho_meta_count", None)
        if pinned is not None:
            return pinned
        try:
            if ds._plan.has_computed_output():   # already materialized
                return ds.count()
            # private-API feature test (written against Ray 2.49.2):
            # match the logical plan's root operator by NAME instead of
            # importing ray.data._internal...read_operator.Read, so a
            # module move in a future Ray only disables the fast path
            # (fall through to the warned CPU-scaled default) instead of
            # raising at import time
            dag = ds._logical_plan.dag
            if type(dag).__name__ == "Read" and not dag.input_dependencies:
                return ds.count()                # metadata-only
        except Exception:
            pass
        return None

    lc, rc = _meta_count(left_ds), _meta_count(right_ds)
    if lc is None or rc is None:
        import warnings

        b = int(max(_cluster_cpus(), 32))
        warnings.warn(
            f"auto_buckets: input row counts unknown without executing a "
            f"transformed Dataset; defaulting to n_buckets={b}.  Pass "
            f"n_buckets explicitly for large piped inputs so per-bucket "
            f"memory stays bounded.", stacklevel=3)
        return b
    total = (lc or 0) + (rc or 0)
    if not total:
        return 32
    b = int(np.ceil(total / target_rows))
    # at least one bucket per core so small inputs still use the cluster
    return int(min(max(b, _cluster_cpus(), 8), 4096))


def bucketed_join(left_ds, right_ds, on: Sequence[str],
                  left_cols: Sequence[str], right_cols: Sequence[str],
                  n_buckets: Optional[int] = None, how: str = "inner"):
    """Both-sides-large hash join: explicit co-partitioning by key hash.
    Both sides union into ONE stream that `bucketed_apply` hash-range
    routes by the join key (block references into one reduce task per
    bucket — no sort-based shuffle, each row moves once); inside a bucket
    an Arrow hash join runs over the co-located sides.  `left_cols`/
    `right_cols` name each side's columns (keys included in both); the
    union schema is their outer union, zero-padded.

    n_buckets=None derives B from the input row counts (see auto_buckets)
    so per-bucket memory stays bounded as data grows.  Hot-key skew hook:
    salt the key upstream (append `salt = hash(row) % S` to `on` on the
    fact side and replicate the dim side S times) — see stages/skew.py for
    the salting pattern."""
    from .agg import bucketed_apply

    _BHOWS = {"inner": "inner", "left": "left outer",
              "outer": "full outer", "right": "right outer"}
    if how not in _BHOWS:
        raise ValueError(f"bucketed_join: unsupported how={how!r} "
                         f"(supported: {sorted(_BHOWS)})")
    on = list(on)
    if n_buckets is None:
        n_buckets = auto_buckets(left_ds, right_ds)
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]
    # typed null padding needs both schemas (metadata-only fetch)
    types = {}
    for f in left_ds.schema().base_schema:
        types[f.name] = f.type
    for f in right_ds.schema().base_schema:
        types.setdefault(f.name, f.type)

    def _pad(n: int, t: pa.DataType) -> pa.Array:
        # typed ZERO padding, not nulls: padded cells are dropped after the
        # __side filter, and nulls would change the key hash of rows whose
        # own key columns are all present
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            return pa.array(np.zeros(n), type=t)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""] * n, type=t)
        return pa.nulls(n, type=t)

    def add_side(side: str, cols: list):
        def fn(batch: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in cols:
                    col = batch[c]
                    arrays.append(col.combine_chunks()
                                  if isinstance(col, pa.ChunkedArray) else col)
                else:
                    arrays.append(_pad(batch.num_rows, types[c]))
            t = pa.table(dict(zip(names, arrays)))
            return t.append_column("__side",
                                   pa.array([side] * batch.num_rows))

        return fn

    left = left_ds.map_batches(add_side("l", left_cols),
                               batch_format="pyarrow")
    right = right_ds.map_batches(add_side("r", right_cols),
                                 batch_format="pyarrow")
    both = left.union(right)

    arrow_how = _BHOWS[how]

    def join_bucket(t: pa.Table) -> pa.Table:
        # Arrow-native hash join per bucket: no arrow->pandas->arrow round
        # trip of the (string-heavy) payload columns.  A bucket holds MANY
        # join keys — the hash join handles that; correctness only needs
        # all rows of a key co-located, which the key routing guarantees.
        # Null keys follow SQL semantics (never match) — pandas merge
        # would have matched NaN == NaN.
        lmask = pc.equal(t["__side"], "l")
        lhs = t.filter(lmask).select(left_cols)
        rhs = t.filter(pc.invert(lmask)).select(right_cols)
        return lhs.join(rhs, keys=on, join_type=arrow_how, right_suffix="_r")

    empty_both = pa.table({
        **{c: pa.array([], types[c]) for c in all_cols},
        "__side": pa.array([], pa.string())})
    return bucketed_apply(both, on, join_bucket, join_bucket(empty_both),
                          n_buckets=n_buckets)


# Named Ray actor (created by tests) that, when present, counts how many
# times an asof broadcast side is fetched out of the object store (cache
# miss) — lets the test suite assert the fetch happens at most once per
# WORKER PROCESS, never once per task.
_ASOF_PROBE_NAME = "rho_asof_init_probe"

# Worker-process-global cache of fetched broadcast sides, keyed by object
# ref — the r4 finding was a driver-local `_cache = {}` captured by the
# closure and re-pickled EMPTY into every task, re-fetching AND
# re-sorting the right table O(#tasks) times.  cloudpickle snapshots a
# nested function's referenced globals BY VALUE, and a package import
# inside the task only works when the worker can import the package
# (true under the driver/pytest layout, not for ad-hoc sys.path setups),
# so the cache anchors on the `ray` module — always importable in a Ray
# worker — looked up inline inside the task (a helper function here
# would itself be pickled by module reference and re-import this
# package).  Bounded FIFO: each cached frame is a zero-copy view that
# PINS its object-store entry even after the driver drops the ref, so
# the cap is the worker's worst-case pinned broadcast count — 2 covers
# a pipeline unioning two asof joins while keeping at most one stale
# broadcast pinned after a pipeline ends.
_ASOF_CACHE_MAX = 2


def asof_join(left_ds, right_table: pa.Table, key: str, ts: str,
              value_cols: Sequence[str], right_ts: Optional[str] = None,
              suffix: str = "_asof", direction: str = "backward"):
    """For each left row, the nearest right row with the same key under
    `direction`: "backward" (latest right.ts <= left.ts — DuckDB's ASOF
    `>=` form), "forward" (earliest right.ts >= left.ts — the `<=` form),
    or "nearest" (smallest |right.ts - left.ts|, backward wins ties; no
    SQL form).  The right side is sorted ONCE on the driver (Arrow
    sort_indices; it is immutable thereafter), converted to pandas ONCE,
    and `ray.put` once; tasks fetch it through a worker-process-global
    cache (zero-copy deserialization for numeric blocks) so each worker
    materializes it at most once — per-batch work is only the left-batch
    sort + merge_asof.  Task pool, not actor pool: the same cache
    guarantee without per-pipeline actor cold-start."""
    import ray

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r} "
                         "(backward, forward, nearest)")

    right_ts = right_ts or ts
    cols = [key, right_ts] + list(value_cols)
    rt = right_table.select(cols)
    # null timestamps / null keys never match (SQL asof semantics) and
    # crash pandas merge_asof outright — drop them on both sides
    rt = rt.filter(pc.and_(pc.is_valid(rt[right_ts]),
                           pc.is_valid(rt[key])))
    # Sort once, Arrow-native, BEFORE the broadcast: at 100 TB the right
    # side is a few GB — re-sorting it in every task is O(#tasks) wasted
    # sort work (VERDICT r4 #3).
    rt = rt.take(pc.sort_indices(
        rt, sort_keys=[(right_ts, "ascending"), (key, "ascending")]))
    ref = ray.put(rt.to_pandas())
    # right-side int columns come back float64+NaN from merge_asof on
    # unmatched rows; remember which to restore as NULLABLE int so every
    # output block keeps ONE schema regardless of match pattern
    int_base = {c for c in cols
                if pa.types.is_integer(rt.schema.field(c).type)}

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        # cache anchored on the ray module of THIS worker process —
        # naming a dict global here would ship a fresh snapshot of it
        # into every task (the exact r4 bug: cloudpickle pickles nested
        # functions by value, globals included)
        cache = ray.__dict__.setdefault("_rho_asof_right_cache", {})
        ck = ref.hex()
        right = cache.get(ck)
        if right is None:
            try:  # test-only probe; absent in production
                probe = ray.get_actor(_ASOF_PROBE_NAME)
            except ValueError:
                pass
            else:
                ray.get(probe.incr.remote())
            right = ray.get(ref)
            while len(cache) >= _ASOF_CACHE_MAX:
                cache.pop(next(iter(cache)))
            cache[ck] = right
        # drop left rows whose ts or key is null (they can never match;
        # merge_asof raises on null merge keys)
        batch = batch[batch[ts].notna() & batch[key].notna()]
        # a nullable int key/ts arrives as float64 in pandas; align to
        # the right side's dtype once the nulls are gone (merge_asof
        # requires matching key dtypes)
        for c in (key, ts):
            rc = key if c == key else right_ts
            if c in batch.columns and rc in right.columns \
                    and batch[c].dtype != right[rc].dtype:
                try:
                    batch[c] = batch[c].astype(right[rc].dtype)
                except (TypeError, ValueError):
                    pass
        left = batch.sort_values([ts, key], kind="mergesort")
        out = pd.merge_asof(left, right, left_on=ts, right_on=right_ts,
                            by=key, suffixes=("", suffix),
                            direction=direction)
        lcols = set(batch.columns)
        for c in int_base:
            name = c + suffix if c in lcols else c
            if name in out.columns and out[name].dtype.kind == "f":
                out[name] = out[name].astype("Int64")
        return out

    return left_ds.map_batches(merge, batch_format="pandas")


def asof_join_partitioned(left_ds, right_ds, key: str, ts: str,
                          value_cols: Sequence[str],
                          right_ts: Optional[str] = None,
                          n_buckets: Optional[int] = None,
                          suffix: str = "_asof", direction: str = "backward"):
    """As-of join (direction as in `asof_join`) where BOTH sides are large: both sides union
    into one stream that `bucketed_apply` hash-range routes by key (block
    references into one reduce task per bucket — no sort-based shuffle),
    so each key's full history lands co-located; inside a bucket ONE
    pandas merge_asof(by=key) handles all its keys at once.  Use
    `asof_join` (broadcast) when the right side fits in one object — this
    variant moves both sides once and never broadcasts.  Partitioning
    assumption: a hash range's rows (both sides) fit in one bucket task's
    memory; bucket count derives from input size when not given."""
    from .agg import bucketed_apply

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join_partitioned: unknown direction "
                         f"{direction!r} (backward, forward, nearest)")
    right_ts = right_ts or ts
    value_cols = list(value_cols)
    if n_buckets is None:
        n_buckets = auto_buckets(left_ds, right_ds)

    left_names = [f.name for f in left_ds.schema().base_schema]
    rcols = [key, right_ts] + value_cols
    types: dict = {}
    for f in left_ds.schema().base_schema:
        types[f.name] = f.type
    for f in right_ds.schema().base_schema:
        types.setdefault(f.name, f.type)
    all_names = left_names + [c for c in rcols if c not in left_names]

    def tag(side: str, keep: list):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(keep)
            # typed null padding for the other side's columns so the union
            # schema matches; padded cells are dropped after the __side
            # split and dtypes restored below
            for c in all_names:
                if c not in t.column_names:
                    t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
            t = t.select(all_names)
            return t.append_column("__side", pa.array([side] * t.num_rows))

        return fn

    both = left_ds.map_batches(tag("l", left_names),
                               batch_format="pyarrow").union(
        right_ds.map_batches(tag("r", rcols), batch_format="pyarrow"))

    def _restore(df: pd.DataFrame, cols: list) -> pd.DataFrame:
        # pandas upcasts int columns holding the other side's nulls to
        # float — cast back once the padded rows are gone
        for c in cols:
            try:
                want = np.dtype(types[c].to_pandas_dtype())
            except Exception:
                continue
            if df[c].dtype != want and not df[c].isna().any():
                try:
                    df[c] = df[c].astype(want)
                except (TypeError, ValueError):
                    pass
        return df

    def join_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lhs = df[df["__side"] == "l"][left_names].copy()
        rhs = df[df["__side"] == "r"][rcols].copy()
        # null ts / null key rows never match (SQL asof semantics) and
        # crash pandas merge_asof — drop them on both sides BEFORE the
        # dtype restore (a nullable int key only casts back to int once
        # its nulls are gone)
        lhs = lhs[lhs[ts].notna() & lhs[key].notna()]
        rhs = rhs[rhs[right_ts].notna() & rhs[key].notna()]
        lhs = _restore(lhs, left_names)
        rhs = _restore(rhs, rcols)
        lhs = lhs.sort_values([ts, key], kind="mergesort") \
            .reset_index(drop=True)
        rhs = rhs.sort_values([right_ts, key], kind="mergesort") \
            .reset_index(drop=True)
        out = pd.merge_asof(lhs, rhs, left_on=ts, right_on=right_ts,
                            by=key, suffixes=("", suffix),
                            direction=direction)
        # unmatched rows float-poison right int columns — restore as
        # NULLABLE int so every bucket block keeps one schema
        for c in rcols:
            if not pa.types.is_integer(types[c]):
                continue
            name = c + suffix if c in left_names else c
            if name in out.columns and out[name].dtype.kind == "f":
                out[name] = out[name].astype("Int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    empty_both = pa.table({
        **{c: pa.array([], types[c]) for c in all_names},
        "__side": pa.array([], pa.string())})
    return bucketed_apply(both, [key], join_bucket,
                          join_bucket(empty_both), n_buckets=n_buckets)


def range_join(ds, intervals: pa.Table, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               how: str = "inner", suffix: str = "_r"):
    """Interval (range) join: attach to each row the interval row with
    lo <= value < hi — the banding/bucketing enrichment (price bands,
    latency buckets, date ranges) Ray Data has no native operator for.

    The interval table is broadcast (`ray.put` ONCE, read zero-copy per
    task) — no shuffle at any fact-side scale.  Intervals must be
    non-overlapping and non-empty (validated once up front; a ValueError
    names the offender), so each row matches at most one interval and the
    probe is a single vectorized searchsorted per batch instead of the
    O(rows x intervals) scan a general theta join needs.  how='inner'
    drops unmatched rows, 'left' keeps them with null interval columns.
    Null (and NaN) values never match — SQL `v >= lo AND v < hi`
    semantics."""
    import ray
    import pyarrow.compute as pc

    ivs = intervals.take(
        pc.sort_indices(intervals, sort_keys=[(lo_col, "ascending")]))
    lo = ivs[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
    hi = ivs[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
    if np.any(hi <= lo):
        i = int(np.flatnonzero(hi <= lo)[0])
        raise ValueError(f"range_join: empty interval [{lo[i]}, {hi[i]})")
    if np.any(lo[1:] < hi[:-1]):
        i = int(np.flatnonzero(lo[1:] < hi[:-1])[0])
        raise ValueError(
            f"range_join: intervals overlap: [{lo[i]}, {hi[i]}) and "
            f"[{lo[i + 1]}, {hi[i + 1]})")
    ref = ray.put(ivs)
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how={how!r} not supported")

    def match(batch: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        los = iv[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        his = iv[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = batch[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
        if los.size == 0:   # empty dim: nothing matches (SQL join vs empty)
            ok = np.zeros(vals.size, bool)
            cl = np.zeros(vals.size, np.int64)
        else:
            pos = np.searchsorted(los, vals, side="right") - 1
            cl = np.clip(pos, 0, los.size - 1)
            with np.errstate(invalid="ignore"):
                ok = (pos >= 0) & (vals < his[cl])   # NaN/null -> False
        out_names = set(batch.column_names)
        if how == "inner":
            keep = np.flatnonzero(ok)
            t = batch.take(pa.array(keep, pa.int64()))
            picked = iv.take(pa.array(cl[keep], pa.int64()))
            for name in iv.column_names:
                col = name if name not in out_names else name + suffix
                t = t.append_column(col, picked[name])
            return t
        picked = iv.take(pa.array(cl, pa.int64())) if los.size else \
            pa.table({name: pa.nulls(len(ok), iv.schema.field(name).type)
                      for name in iv.column_names})
        t = batch
        for name in iv.column_names:
            col = name if name not in out_names else name + suffix
            c = picked[name].combine_chunks() \
                if isinstance(picked[name], pa.ChunkedArray) else picked[name]
            t = t.append_column(
                col, pc.if_else(pa.array(ok), c, pa.nulls(len(ok), c.type)))
        return t

    return ds.map_batches(match, batch_format="pyarrow")


def semi_join(ds, right, on: Sequence[str],
              right_on: Optional[Sequence[str]] = None, anti: bool = False):
    """Broadcast semi join (anti=True -> anti join): keep the rows of `ds`
    whose key tuple EXISTS (resp. does NOT EXIST) in `right`'s key set.

    The right side's DISTINCT keys are `ray.put` once and read once per
    worker — the no-shuffle filter-by-membership every fact/dim pipeline
    needs (the FK constraint is this op + a count).  Null semantics are
    SQL EXISTS / NOT EXISTS with an equality predicate: a null key never
    matches on EITHER side (right-side null keys are dropped from the
    broadcast set), so semi drops null-key left rows and anti keeps them.
    A single key column stays TYPED end-to-end (typed is_in per batch);
    multi-column keys combine to strings per batch with the \\x1f
    separator (values containing \\x1f can collide across columns — the
    same documented limitation as the FK constraint).
    `right` may be a pyarrow Table or a (small) Dataset."""
    import pyarrow.compute as pc
    import ray

    from ..constraints.foreign_key import _dim_key_array
    from ..functions.hashing import combine_key

    on = list(on)
    right_cols = list(right_on or on)
    if len(on) == 1:
        keys = _dim_key_array(right, right_cols, combined=False)
    else:
        keys = _dim_key_array(right, right_cols)
    keys_ref = ray.put(keys)

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        if len(on) == 1:
            col = batch[on[0]]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            m = pc.is_in(col, value_set=ks)
        else:
            m = pc.is_in(combine_key(batch, on), value_set=ks)
        for c in on:
            m = pc.and_(m, pc.is_valid(batch[c]))
        m = pc.fill_null(m, False)
        if anti:
            m = pc.invert(m)
        return batch.filter(m)

    return ds.map_batches(fn, batch_format="pyarrow")


def anti_join(ds, right, on: Sequence[str],
              right_on: Optional[Sequence[str]] = None):
    """NOT EXISTS filter — see semi_join."""
    return semi_join(ds, right, on, right_on=right_on, anti=True)


def hopping_window_count(ds, ts_col: str, size_us: int, hop_us: int):
    """Hopping (sliding) event-time window counts over a timestamp column
    -> Dataset[window_start_us, n]: every window [s, s + size) with
    s ≡ 0 (mod hop) counts the events it contains.  hop == size degenerates
    to a tumbling window.

    size must be a multiple of hop, so each event lands in EXACTLY
    size/hop windows — the per-batch explode is a fixed-k vectorized
    broadcast (no boundary filter needed), combined locally (one row per
    distinct window per batch) before the groupby, so the all-to-all only
    moves (window, partial-count) rows, never events.  Window starts are
    int64 epoch-microseconds: exact arithmetic a SQL oracle reproduces
    with epoch_us(ts) // hop."""
    import pyarrow.compute as pc

    if size_us <= 0 or hop_us <= 0 or size_us % hop_us:
        raise ValueError(
            f"hopping_window_count: size ({size_us}) must be a positive "
            f"multiple of hop ({hop_us})")
    k = size_us // hop_us
    offs = np.arange(k, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[ts_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()   # null timestamps belong to no window
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        t = col.to_numpy(zero_copy_only=False).astype(np.int64)
        base = t // hop_us   # numpy int64 // floors, matching SQL //
        starts = ((base[:, None] - offs[None, :]) * hop_us).reshape(-1)
        u, c = np.unique(starts, return_counts=True)
        return pa.table({"window_start_us": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    from .agg import bucketed_sum

    return bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                        ["window_start_us"], ["n"])


def _key_run_starts(t: pa.Table, key: str) -> np.ndarray:
    """Start indices of equal-`key` runs in an ALREADY key-sorted table —
    the shared null-safe run-boundary mask (one implementation:
    agg._run_starts_multi)."""
    from .agg import _run_starts_multi

    return _run_starts_multi(t, [key])


def _empty_like(ds) -> pa.Table:
    schema = ds.schema()
    if schema is None:
        # a zero-row dataset whose plan lost the schema (e.g. repartition
        # of an empty from_arrow) — Ray has no type information left, so
        # the only honest empty output is zero-column (the input itself
        # is equally degenerate downstream)
        return pa.table({})
    return pa.table({f.name: pa.array([], f.type)
                     for f in schema.base_schema})


def _empty_out(ds, fn) -> pa.Table:
    """Schema-correct zero-row OUTPUT table: fn applied to an empty input
    shaped like ds; zero-column when ds's schema is unrecoverable."""
    base = _empty_like(ds)
    if base.num_columns == 0:
        return base
    return fn(base)


def window_seq(ds, key: str, order_by: Sequence[str],
               out_col: str = "seq"):
    """ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_by...) — per-key
    sequence numbers.  Hash-range bucketed exchange (rows of a key land in
    one reduce task, no sort-based shuffle); the bucket body is ONE Arrow
    sort + a segment-offset arange over all its key runs — no per-group
    call at all (VERDICT r2 #8)."""
    from .agg import bucketed_apply

    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def number(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        starts = _key_run_starts(t, key)
        lens = np.diff(np.append(starts, t.num_rows))
        seq = np.arange(t.num_rows, dtype=np.int64) \
            - np.repeat(starts, lens) + 1
        return t.append_column(out_col, pa.array(seq))

    return bucketed_apply(ds, [key], number,
                          lambda: _empty_out(ds, number))


def top_k_per_group(ds, key: str, order_by: Sequence[str], k: int,
                    descending: bool = True):
    """Top-k rows per group by order_by (ties broken by the trailing
    order_by columns — pass an id column last for determinism).  Bucketed
    exchange + one Arrow sort per bucket; the per-run top-k is a
    segment-offset filter, no per-group call."""
    from .agg import bucketed_apply

    direction = "descending" if descending else "ascending"
    sort_keys = [(key, "ascending")] + [(c, direction) for c in order_by]

    def take(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        starts = _key_run_starts(t, key)
        lens = np.diff(np.append(starts, t.num_rows))
        offs = np.arange(t.num_rows, dtype=np.int64) \
            - np.repeat(starts, lens)
        return t.filter(pa.array(offs < k))

    return bucketed_apply(ds, [key], take,
                          lambda: _empty_out(ds, take))


def group_quantiles(ds, key: str, value: str,
                    qs: Sequence[float] = (0.5, 0.95, 0.99)):
    """EXACT per-group discrete quantiles -> (key, p50, p95, ...): the
    sorted group element at index ceil(q*n) - 1 — the same picking rule as
    DuckDB's quantile_disc (probed over n=1..200 incl. the q*n-integral
    boundaries), so the oracle compares value-exact: a picked element IS a
    data value, no interpolation arithmetic to diverge.  Nulls are ignored
    within a group (an all-null group yields nulls), matching SQL.

    Scale shape: one shuffle by key, one Arrow sort per group in the group
    task — exact quantiles need the group co-located; for sketched
    (shuffle-free) global quantiles use constraints.column_stats'
    t-digest instead."""
    import math

    import pyarrow.compute as pc

    qs = list(qs)
    from .agg import quantile_col_name
    names = [quantile_col_name(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"group_quantiles: quantiles {qs} collide in the p<NN> column "
            f"naming ({names}); pick quantiles distinct at 1% granularity")

    from .agg import bucketed_apply

    def body(t: pa.Table) -> pa.Table:
        # one Arrow sort for the WHOLE bucket: within each key run the
        # order is valid values ascending, then NaN, then null (verified
        # Arrow placement), so each group's quantile pick is just an
        # offset into its run — fully segment-vectorized, no group loop
        s = t.select([key, value]).take(pc.sort_indices(
            t.select([key, value]),
            sort_keys=[(key, "ascending"), (value, "ascending")],
            null_placement="at_end"))
        starts = _key_run_starts(s, key)
        v = s[value]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        valid = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            # the engine skips NaN like NULL; DuckDB's quantile_disc
            # does NOT (NaN sorts greatest and NaN = NaN is TRUE there),
            # so SQL oracles must pre-filter with NOT isnan(v)
            valid = pc.and_(valid, pc.invert(
                pc.fill_null(pc.is_nan(v), True)))
        valid_np = valid.to_numpy(zero_copy_only=False).astype(np.int64)
        n_valid = (np.add.reduceat(valid_np, starts)
                   if starts.size else np.empty(0, np.int64))
        out = {key: s[key].take(pa.array(starts))}
        for name, q in zip(names, qs):
            idx = starts + np.maximum(
                np.ceil(q * n_valid).astype(np.int64) - 1, 0)
            picked = v.take(pa.array(idx))
            # all-null/NaN group -> null (the pick would land on NaN/null
            # anyway for NaN-only groups, but be explicit for both)
            mask = pa.array(n_valid == 0)
            out[name] = pc.if_else(mask, pa.nulls(len(idx), v.type), picked)
        return pa.table(out)

    sub = ds.select_columns([key, value])
    return bucketed_apply(sub, [key], body,
                          lambda: _empty_out(sub, body))


def group_quantiles_cont(ds, key: str, value: str,
                         qs: Sequence[float] = (0.25, 0.5, 0.75),
                         drop_empty: bool = True):
    """EXACT per-group continuous (linearly interpolated) quantiles ->
    (key, p25, p50, ...), replicating DuckDB's quantile_cont arithmetic:
    rn = q*(n-1), result = (ceil(rn)-rn)*v[floor(rn)] +
    (rn-floor(rn))*v[ceil(rn)] in float64 — same formula, same dtype, so
    values agree to the last bits that matter.  Nulls and NaNs are skipped
    like quantile_disc; with drop_empty groups whose values are ALL
    null/NaN are omitted (matching a SQL oracle whose WHERE strips those
    rows), else they yield nulls.

    Scale shape identical to group_quantiles: one hash exchange by key,
    one Arrow sort per bucket, segment-vectorized picks — no per-group
    Python."""
    import pyarrow.compute as pc

    qs = list(qs)
    from .agg import quantile_col_name
    names = [quantile_col_name(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"group_quantiles_cont: quantiles {qs} collide in the p<NN> "
            f"column naming ({names}); use 1%-distinct quantiles")

    from .agg import bucketed_apply

    def body(t: pa.Table) -> pa.Table:
        s = t.select([key, value]).take(pc.sort_indices(
            t.select([key, value]),
            sort_keys=[(key, "ascending"), (value, "ascending")],
            null_placement="at_end"))
        starts = _key_run_starts(s, key)
        v = s[value]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        valid = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            valid = pc.and_(valid, pc.invert(
                pc.fill_null(pc.is_nan(v), True)))
        valid_np = valid.to_numpy(zero_copy_only=False).astype(np.int64)
        n_valid = (np.add.reduceat(valid_np, starts)
                   if starts.size else np.empty(0, np.int64))
        vnp = pc.cast(v, pa.float64()).to_numpy(zero_copy_only=False)
        out = {key: s[key].take(pa.array(starts))}
        nonempty = n_valid > 0
        cols = {}
        for name, q in zip(names, qs):
            rn = q * (n_valid - 1.0)
            rn = np.where(nonempty, np.maximum(rn, 0.0), 0.0)
            frn = np.floor(rn)
            crn = np.ceil(rn)
            lo = vnp[starts + frn.astype(np.int64)]
            hi = vnp[starts + crn.astype(np.int64)]
            # DuckDB Interpolator: two-sided weighting, not lo+f*(hi-lo)
            res = np.where(crn == frn, lo,
                           (crn - rn) * lo + (rn - frn) * hi)
            cols[name] = res
        if drop_empty:
            keep = pa.array(nonempty)
            out = {key: out[key].filter(keep)}
            for name in names:
                out[name] = pa.array(cols[name][nonempty], pa.float64())
        else:
            mask = ~nonempty
            for name in names:
                out[name] = pc.if_else(
                    pa.array(mask), pa.nulls(starts.size, pa.float64()),
                    pa.array(cols[name], pa.float64()))
        return pa.table(out)

    sub = ds.select_columns([key, value])
    return bucketed_apply(sub, [key], body,
                          lambda: _empty_out(sub, body))


def group_count_distinct(ds, key: str, value: str,
                         out_col: str = "n_distinct"):
    """EXACT COUNT(DISTINCT value) per key -> (key, n_distinct).

    Scale shape: each batch first reduces to its distinct (key, value)
    pairs (an Arrow group_by — the only thing the shuffle ever moves is
    one row per batch-distinct pair), then one shuffle by key and a
    per-group Arrow unique count.  Nulls are not counted (SQL COUNT
    DISTINCT semantics).  For shuffle-free APPROXIMATE distincts use
    constraints.column_stats' HyperLogLog instead."""
    import pyarrow.compute as pc

    from .agg import bucketed_apply

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.select([key, value]).group_by([key, value]) \
            .aggregate([])

    def count(t: pa.Table) -> pa.Table:
        # batch-level pair dedup leaves cross-batch duplicates: dedup the
        # co-located pairs once more, then one Arrow count of non-null
        # values per key (SQL COUNT DISTINCT semantics, keys with only
        # nulls still emit 0 rows counted)
        g = t.group_by([key, value]).aggregate([]) \
            .group_by(key).aggregate([(value, "count")])
        return g.rename_columns([key, out_col])

    def make_empty() -> pa.Table:
        schema = ds.schema()
        if schema is None:
            return pa.table({})
        return pa.table({key: pa.array([], schema.base_schema
                                       .field(key).type),
                         out_col: pa.array([], pa.int64())})

    return bucketed_apply(ds.map_batches(pairs, batch_format="pyarrow"),
                          [key], count, make_empty)


def window_cumsum(ds, key: str, order_by: Sequence[str], value: str,
                  out_col: str = "running"):
    """SUM(value) OVER (PARTITION BY key ORDER BY order_by ROWS UNBOUNDED
    PRECEDING).  Bucketed exchange + ONE Arrow sort per bucket; the
    per-key running sums are a segment cumsum (global cumsum minus its
    value at each run start), no per-group call."""
    from .agg import bucketed_apply

    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def cum(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        starts = _key_run_starts(t, key)
        lens = np.diff(np.append(starts, t.num_rows))
        col = t[value]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            # branch on the ARROW type, not the converted numpy dtype: an
            # int column with a null converts to float64+NaN, which would
            # make this bucket's out_col float while null-free buckets
            # stay int — mixed block schemas.  SQL SUM OVER skips nulls;
            # output is NULLABLE int64 in every bucket.
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            x = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
            run = np.cumsum(x, dtype=np.int64)
            base = np.repeat(run[starts] - x[starts], lens) \
                if starts.size else np.zeros(0, np.int64)
            cnt = np.cumsum(valid)
            cbase = np.repeat(cnt[starts] - valid[starts].astype(np.int64),
                              lens) if starts.size else np.zeros(0, np.int64)
            out = pa.array(run - base, type=pa.int64(),
                           mask=(cnt - cbase) == 0)
            return t.append_column(out_col, out)
        vals = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(vals.dtype, np.floating):
            # SQL SUM OVER skips nulls: a null row gets the running sum of
            # the non-null values so far (NULL only while none seen) — a
            # plain np.cumsum would instead poison every later row with NaN
            nan = np.isnan(vals)
            x = np.where(nan, 0.0, vals)
            run = np.cumsum(x)
            base = np.repeat(run[starts] - x[starts], lens) \
                if starts.size else np.zeros(0)
            cnt = np.cumsum(~nan)
            cbase = np.repeat(cnt[starts] - (~nan[starts]).astype(np.int64),
                              lens) if starts.size else np.zeros(0, np.int64)
            out = pa.array(run - base, type=pa.float64(),
                           mask=(cnt - cbase) == 0)
            return t.append_column(out_col, out)
        run = np.cumsum(vals)
        base = np.repeat(run[starts] - vals[starts], lens) \
            if starts.size else np.zeros(0, vals.dtype)
        return t.append_column(out_col, pa.array(run - base))

    return bucketed_apply(ds, [key], cum,
                          lambda: _empty_out(ds, cum))


def window_rolling(ds, key: str, order_by: Sequence[str], value: str,
                   k: int, aggs: Sequence[str] = ("sum", "avg"),
                   prefix: str = "w"):
    """Per-key bounded-frame moving aggregates — SQL
    AGG(value) OVER (PARTITION BY key ORDER BY order_by
    ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW) for agg in
    sum/avg/min/max/count -> input columns + {prefix}sum/{prefix}avg/...

    Scale shape: one bucketed exchange by key; the bucket body is ONE
    Arrow sort plus k shifted-array passes over the whole bucket
    (each pass a numpy where/accumulate — no per-group or per-row
    Python), so work is O(k x rows).  k is a FRAME length (a handful of
    rows), not a group size — for unbounded frames use window_cumsum.
    Null handling matches SQL aggregates: null (and NaN, mirroring
    window_cumsum's convention) rows contribute nothing; a frame with no
    valid values yields null for sum/avg/min/max and 0 for count."""
    from .agg import bucketed_apply

    _SUPPORTED = ("sum", "avg", "min", "max", "count")
    aggs = list(aggs)
    for a in aggs:
        if a not in _SUPPORTED:
            raise ValueError(f"window_rolling: unsupported agg {a!r} "
                             f"(supported: {_SUPPORTED})")
    if k < 1:
        raise ValueError("window_rolling: k must be >= 1")
    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def roll(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        starts = _key_run_starts(t, key)
        lens = np.diff(np.append(starts, t.num_rows))
        col = t[value]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.to_numpy(zero_copy_only=False)
        n = vals.size
        # int-ness from the ARROW type: an int column with a null
        # converts to float64+NaN, which would flip this bucket's output
        # columns to float while null-free buckets stay int (mixed block
        # schemas); the NaN rows are exactly the nulls and the valid
        # mask below skips them
        is_int = pa.types.is_integer(col.type)
        fvals = vals.astype(np.float64) \
            if vals.dtype.kind != "f" else vals
        valid = ~np.isnan(fvals)
        if is_int and n:
            amax = float(np.nanmax(np.abs(fvals))) if valid.any() else 0.0
            if amax * float(k) >= float(1 << 53):
                # the window sum rides float64; beyond 2^53 the cast
                # back to int64 would be silently wrong
                raise ValueError(
                    "window_rolling: |value| x k exceeds float64's "
                    "exact-integer range (2^53) — rescale the values")
        run_start = np.repeat(starts, lens) if starts.size \
            else np.zeros(0, np.int64)
        idx = np.arange(n, dtype=np.int64)
        x = np.where(valid, fvals, 0.0)

        wsum = np.zeros(n, np.float64)
        wcnt = np.zeros(n, np.int64)
        wmin = np.full(n, np.inf)
        wmax = np.full(n, -np.inf)
        need_mm = ("min" in aggs) or ("max" in aggs)
        for s in range(min(k, n) if n else 0):
            j = idx - s
            ok = j >= run_start          # frame never crosses a key run
            jc = np.where(ok, j, 0)
            use = ok & valid[jc]
            wsum += np.where(use, x[jc], 0.0)
            wcnt += use
            if need_mm:
                wmin = np.where(use, np.minimum(wmin, fvals[jc]), wmin)
                wmax = np.where(use, np.maximum(wmax, fvals[jc]), wmax)

        empty = wcnt == 0
        out = t
        for a in aggs:
            name = f"{prefix}{a}"
            if a == "count":
                out = out.append_column(name, pa.array(wcnt))
            elif a == "sum":
                arr = pa.array(wsum.astype(np.int64), mask=empty) if is_int \
                    else pa.array(wsum, mask=empty)
                out = out.append_column(name, arr)
            elif a == "avg":
                with np.errstate(invalid="ignore", divide="ignore"):
                    out = out.append_column(
                        name, pa.array(wsum / wcnt, mask=empty))
            elif a == "min":
                arr = wmin.astype(np.int64) if is_int else wmin
                out = out.append_column(name, pa.array(arr, mask=empty))
            else:
                arr = wmax.astype(np.int64) if is_int else wmax
                out = out.append_column(name, pa.array(arr, mask=empty))
        return out

    return bucketed_apply(ds, [key], roll,
                          lambda: _empty_out(ds, roll))


def window_rank(ds, key: str, order_by: Sequence[str],
                n_tiles: int = 0):
    """SQL ranking windows over (PARTITION BY key ORDER BY order_by):
    rank (ties share, gaps), dense_rank (ties share, no gaps),
    percent_rank ((rank-1)/(n-1), 0.0 for a 1-row group), cume_dist
    (rows <= current / n), plus ntile(n_tiles) when n_tiles > 0 (NTILE
    breaks ties by the sort's row order — pass a unique trailing
    order_by column for deterministic tiles, as in SQL).

    Scale shape: one bucketed exchange by key; the bucket body is ONE
    Arrow sort plus run-boundary numpy over (key runs x order-value
    runs) — tie groups are sub-runs of the key runs, handled with the
    same repeat/diff arithmetic, no per-group call."""
    from .agg import bucketed_apply

    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def _col_change(t: pa.Table, col_name: str) -> np.ndarray:
        col = t[col_name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        a, b = col.slice(1), col.slice(0, len(col) - 1)
        ne = pc.fill_null(pc.not_equal(a, b), False)
        return pc.or_(ne, pc.xor(pc.is_null(a), pc.is_null(b))) \
            .to_numpy(zero_copy_only=False)

    def rank_fn(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = t.num_rows
        if n == 0:
            t = t.append_column("rank", pa.array([], pa.int64()))
            t = t.append_column("dense_rank", pa.array([], pa.int64()))
            t = t.append_column("percent_rank", pa.array([], pa.float64()))
            t = t.append_column("cume_dist", pa.array([], pa.float64()))
            if n_tiles:
                t = t.append_column("ntile", pa.array([], pa.int64()))
            return t
        kstarts = _key_run_starts(t, key)
        klens = np.diff(np.append(kstarts, n))
        kstart_of = np.repeat(kstarts, klens)
        klen_of = np.repeat(klens, klens)
        # tie-group boundaries: key change OR any order column change
        change = np.zeros(n, bool)
        change[0] = True
        if n > 1:
            acc = _col_change(t, key)
            for c in order_by:
                acc = acc | _col_change(t, c)
            change[1:] = acc
        tstarts = np.flatnonzero(change).astype(np.int64)
        tlens = np.diff(np.append(tstarts, n))
        tstart_of = np.repeat(tstarts, tlens)
        tend_of = tstart_of + np.repeat(tlens, tlens)

        row = np.arange(n, dtype=np.int64) - kstart_of         # 0-based
        rank = tstart_of - kstart_of + 1
        # dense rank: # of tie-group starts in this key run so far
        dr_step = np.zeros(n, np.int64)
        dr_step[tstarts] = 1
        dr_step[kstarts] = 0
        csum = np.cumsum(dr_step)
        dense = csum - np.repeat(csum[kstarts], klens) + 1
        with np.errstate(invalid="ignore"):
            prank = np.where(klen_of > 1,
                             (rank - 1) / np.maximum(klen_of - 1, 1), 0.0)
        cume = (tend_of - kstart_of) / klen_of
        t = t.append_column("rank", pa.array(rank))
        t = t.append_column("dense_rank", pa.array(dense))
        t = t.append_column("percent_rank", pa.array(prank.astype(np.float64)))
        t = t.append_column("cume_dist", pa.array(cume.astype(np.float64)))
        if n_tiles:
            # SQL NTILE: first (n % b) tiles get size+1 rows, by row order
            size = klen_of // n_tiles
            extra = klen_of % n_tiles
            cut = (size + 1) * extra
            tile = np.where(row < cut,
                            row // np.maximum(size + 1, 1),
                            np.where(size > 0,
                                     extra + (row - cut) // np.maximum(size, 1),
                                     row)) + 1
            t = t.append_column("ntile", pa.array(tile.astype(np.int64)))
        return t

    return bucketed_apply(ds, [key], rank_fn,
                          lambda: _empty_out(ds, rank_fn))


def window_shift(ds, key: str, order_by: Sequence[str], value: str,
                 periods: int = 1, out_col: Optional[str] = None):
    """LAG (periods > 0) / LEAD (periods < 0) of `value` within
    (PARTITION BY key ORDER BY order_by); out-of-run positions are null,
    carried nulls stay null — SQL default-null LAG/LEAD semantics.

    Scale shape: one bucketed exchange; the bucket body is one Arrow
    sort plus a single index-shifted take (null indices yield nulls) —
    no per-group work at all."""
    out_col = out_col or (f"lag_{value}" if periods >= 0
                          else f"lead_{value}")

    from .agg import bucketed_apply

    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def shift(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = t.num_rows
        starts = _key_run_starts(t, key)
        lens = np.diff(np.append(starts, n))
        kstart = np.repeat(starts, lens) if starts.size \
            else np.zeros(0, np.int64)
        kend = kstart + (np.repeat(lens, lens) if starts.size
                         else np.zeros(0, np.int64))
        j = np.arange(n, dtype=np.int64) - periods
        ok = (j >= kstart) & (j < kend)
        idx = pa.array(np.where(ok, j, 0), pa.int64(),
                       mask=~ok)             # null index -> null output
        col = t[value]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return t.append_column(out_col, col.take(idx))

    return bucketed_apply(ds, [key], shift,
                          lambda: _empty_out(ds, shift))


def window_fill_forward(ds, key: str, order_by: Sequence[str], value: str,
                        out_col: Optional[str] = None):
    """Per-key forward fill: each null `value` takes the latest non-null
    value earlier in its partition's order (SQL: LAST_VALUE(value IGNORE
    NULLS) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)); leading nulls stay null.

    Scale shape: one bucketed exchange; inside the bucket the fill is a
    single np.maximum.accumulate over valid-value indices — positions
    whose accumulated source index falls before their key run start are
    leading nulls.  No per-group or per-row Python."""
    out_col = out_col or f"{value}_filled"

    from .agg import bucketed_apply

    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def fill(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = t.num_rows
        starts = _key_run_starts(t, key)
        lens = np.diff(np.append(starts, n))
        kstart = np.repeat(starts, lens) if starts.size \
            else np.zeros(0, np.int64)
        col = t[value]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        src = np.maximum.accumulate(
            np.where(valid, np.arange(n, dtype=np.int64), -1))
        ok = src >= kstart                   # a fill from an EARLIER key
        idx = pa.array(np.where(ok, src, 0), pa.int64(), mask=~ok)
        return t.append_column(out_col, col.take(idx))

    return bucketed_apply(ds, [key], fill,
                          lambda: _empty_out(ds, fill))


def window_ewma(ds, key: str, order_by: "Sequence[str]", value: str,
                alpha: float, out_col: str = "ewma"):
    """Exponentially weighted moving average per key in `order_by` order
    (the recurrence y_t = alpha*x_t + (1-alpha)*y_{t-1}, y_0 = x_0 —
    pandas ewm(adjust=False) semantics).  Null values are DROPPED first
    (like group_collect): the recurrence is over the non-null sequence.

    Scale shape: one bucketed exchange by key; the bucket body is one
    Arrow sort plus an affine PARALLEL SCAN — the recurrence is composed
    by index doubling (log2 n vectorized passes), with each key run's
    first row carrying coefficient 0 so compositions never cross segment
    boundaries and no masks are needed.  No per-group Python, no O(n)
    sequential loop, and no (1-alpha)^-i rescaling (which overflows for
    long runs).  Float caveat: scan composition reorders the arithmetic,
    so results can differ from the sequential recurrence in the last few
    ulps — pytest pins agreement to 1e-10 against pandas."""
    from .agg import bucketed_apply

    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def ew(t: pa.Table) -> pa.Table:
        # NaN mirrors null (the window_cumsum/rolling convention): a NaN
        # entering the affine scan would poison every later row of its
        # key run, where pandas ewm skips it
        vcol = t[value]
        ok = pc.is_valid(vcol)
        if pa.types.is_floating(vcol.type):
            ok = pc.and_(ok, pc.invert(pc.is_nan(vcol)))
        t = t.filter(ok)
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = t.num_rows
        col = t[value]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        x = col.to_numpy(zero_copy_only=False).astype(np.float64)
        starts = _key_run_starts(t, key)
        is_start = np.zeros(n, bool)
        is_start[starts] = True
        c = np.where(is_start, 0.0, 1.0 - alpha)
        d = np.where(is_start, x, alpha * x)
        s = 1
        while s < n:
            c_prev = np.concatenate([np.ones(s), c[:-s]])
            d_prev = np.concatenate([np.zeros(s), d[:-s]])
            d = c * d_prev + d
            c = c * c_prev
            s *= 2
        return t.append_column(out_col, pa.array(d, pa.float64()))

    return bucketed_apply(ds, [key], ew,
                          lambda: _empty_out(ds, ew))


def group_iqr_outliers(ds, key: str, value: str, id_col: str,
                       k: float = 1.5):
    """Per-group IQR outlier flags -> rows (id, key, value, lo, hi) for
    every value outside [q1 - k*iqr, q3 + k*iqr], with q1/q3 the
    quantile_disc picks (actual data values — so the SQL oracle using
    quantile_disc(...) OVER compares value-exact; the bound arithmetic is
    a handful of IEEE ops identical in both engines).  Null/NaN values
    are never flagged and are excluded from the quantile picks, matching
    the exact group_quantiles convention.

    Scale shape: ONE bucketed exchange co-locates each key's rows; the
    bucket body is one Arrow sort, segment-vectorized q1/q3 picks over
    all key runs, and one filter — no per-group Python.  The canonical
    per-group data-quality gate for a validation engine: the same pass
    that computes the fence emits the violating rows."""
    from .agg import bucketed_apply

    sub = ds.select_columns([id_col, key, value])

    def body_full(t: pa.Table) -> pa.Table:
        # the id rides along through the same sort, so flagged rows keep it
        s = t.take(pc.sort_indices(
            t, sort_keys=[(key, "ascending"), (value, "ascending")],
            null_placement="at_end"))
        return _flag(s)

    def _flag(s: pa.Table) -> pa.Table:
        starts = _key_run_starts(s, key)
        lens = np.diff(np.append(starts, s.num_rows))
        v = s[value]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        valid = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            valid = pc.and_(valid, pc.invert(
                pc.fill_null(pc.is_nan(v), True)))
        valid_np = valid.to_numpy(zero_copy_only=False).astype(np.int64)
        n_valid = (np.add.reduceat(valid_np, starts)
                   if starts.size else np.empty(0, np.int64))
        vals = pc.cast(v, pa.float64()).to_numpy(zero_copy_only=False)
        picks = {}
        for q in (0.25, 0.75):
            idx = starts + np.maximum(
                np.ceil(q * n_valid).astype(np.int64) - 1, 0)
            picks[q] = vals[idx]
        iqr = picks[0.75] - picks[0.25]
        lo = picks[0.25] - k * iqr
        hi = picks[0.75] + k * iqr
        lo_of = np.repeat(lo, lens) if starts.size else np.zeros(0)
        hi_of = np.repeat(hi, lens) if starts.size else np.zeros(0)
        ok_val = valid.to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            flag = ok_val & ((vals < lo_of) | (vals > hi_of))
        out = s.filter(pa.array(flag))
        return pa.table({
            id_col: out[id_col], key: out[key], value: out[value],
            "lo": pa.array(lo_of[flag]), "hi": pa.array(hi_of[flag]),
        })

    return bucketed_apply(sub, [key], body_full,
                          lambda: _empty_out(sub, body_full))


def _key_valid_mask(batch: pa.Table, on: Sequence[str]) -> np.ndarray:
    """True where EVERY key component is non-null — SQL equality
    semantics for single- and multi-column keys alike."""
    valid = np.ones(batch.num_rows, bool)
    for c in on:
        valid &= pc.is_valid(batch[c]).to_numpy(zero_copy_only=False)
    return valid


def build_key_bloom(ds, on: Sequence[str], fpr: float = 0.01):
    """One streaming pass -> a BloomFilter over `ds`'s key tuples
    (stable 64-bit hashes; null keys excluded — any null COMPONENT of a
    multi-column key drops, matching SQL equality).  Batches emit their
    unique SET BIT POSITIONS (k*8 B per key, deduped) and the driver
    folds them into the one filter as they stream — bytes held at any
    moment = one filter (nbits/8) plus a batch's position list, never a
    per-batch full bitmap.  At 10^9 keys / 1% FPR the filter is ~1.2 GB
    broadcast vs ~8 GB for the exact int64 key set — the prefilter for
    dimension sides too big to broadcast exactly.  (Scale path past
    that: bit-range-partitioned construction; documented, not needed
    below ~10^10 keys.)"""
    import ray

    from ..functions.hashing import combine_key, stable_hash64
    from ..functions.sketches import BloomFilter

    on = list(on)
    n = getattr(ds, "_rho_meta_count", None)
    if n is None:
        n = ds.count()
    bf = BloomFilter(max(1, n), fpr)
    nbits, k = bf.nbits, bf.k

    def part(batch: pa.Table) -> pa.Table:
        # validity from the ORIGINAL columns: combine_key fills nulls
        # with a sentinel token, so is_valid on the combined key would
        # never drop a null component
        valid = _key_valid_mask(batch, on)
        key = batch[on[0]] if len(on) == 1 else combine_key(batch, on)
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        h = stable_hash64(key)[valid]
        if h.size == 0:
            return pa.table({"pos": pa.array([], pa.int64())})
        # emit the UNIQUE set bit positions, not a full nbits/8 bitmap —
        # per-batch bytes scale with the batch's keys (k*8 B each), not
        # with the final filter size (1.2 GB at the 10^9-key design point)
        p = BloomFilter.__new__(BloomFilter)
        p.nbits, p.k = nbits, k
        pos = np.unique(p._positions(h).reshape(-1)).astype(np.int64)
        return pa.table({"pos": pa.array(pos)})

    for b in ds.map_batches(part, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows and "pos" in b.column_names:
            pos = b["pos"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            np.bitwise_or.at(
                bf.bits, (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(np.uint8(1),
                              (pos & np.uint64(7)).astype(np.uint8)))
    return bf


def bloom_filter_keys(ds, bloom, on: Sequence[str]):
    """Keep rows whose key tuple is (probably) in `bloom` — one-sided:
    real matches are never dropped, so running this BEFORE an exact join
    shrinks the exchange without changing the join's output.  Null keys
    drop (they cannot equality-match)."""
    import ray

    from ..functions.hashing import combine_key, stable_hash64

    on = list(on)
    ref = ray.put((bloom.bits, bloom.nbits, bloom.k))

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.sketches import BloomFilter

        bits, nbits, k = ray.get(ref)
        bf = BloomFilter.__new__(BloomFilter)
        bf.bits, bf.nbits, bf.k = bits, nbits, k
        # null components drop via the ORIGINAL columns (combine_key's
        # sentinel would otherwise hash and possibly pass the filter)
        valid = _key_valid_mask(batch, on)
        key = batch[on[0]] if len(on) == 1 else combine_key(batch, on)
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        h = stable_hash64(key)
        keep = valid & bf.contains_hashes(h)
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def longest_streak(ds, key: str, order_by: Sequence[str], value: str):
    """Longest strictly-increasing run of `value` per key, ordered by
    `order_by` -> Dataset[key, max_streak, n_runs].  The gaps-and-islands
    window shape (SQL: break where value <= lag(value), cumulative-sum
    group ids, count per island, max per key) collapsed into one bucket
    body: a single Arrow sort, one vectorized break mask, and
    np.maximum.at/bincount over run segments — no per-group Python.

    Null/NaN values break a run on both sides of the comparison (numpy
    NaN-compare is False); note DuckDB's NaN sorts GREATEST and compares
    true against numbers, so SQL oracles must pre-filter NaN if the
    column can hold it (nulls agree without help)."""
    from .agg import bucketed_apply

    order_by = list(order_by)
    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]

    def body(t: pa.Table) -> pa.Table:
        t2 = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        starts = _key_run_starts(t2, key)
        v = t2[value].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t2.num_rows
        inc = np.zeros(n, bool)
        if n > 1:
            inc[1:] = v[1:] > v[:-1]
        inc[starts] = False                      # a key begins a new run
        run_starts = np.flatnonzero(~inc)
        run_lens = np.diff(np.append(run_starts, n))
        key_of_run = np.searchsorted(starts, run_starts, side="right") - 1
        mx = np.zeros(starts.size, np.int64)
        np.maximum.at(mx, key_of_run, run_lens)
        cnt = np.bincount(key_of_run,
                          minlength=starts.size).astype(np.int64)
        return pa.table({key: t2[key].take(pa.array(starts)),
                         "max_streak": pa.array(mx),
                         "n_runs": pa.array(cnt)})

    return bucketed_apply(ds, [key], body, lambda: _empty_out(ds, body))


def collapse_runs(ds, key: str, order_by: Sequence[str], value: str,
                  ts_col: str):
    """SCD2 interval build (gaps-and-islands): collapse consecutive runs
    of equal `value` per key in `order_by` order into validity intervals
    -> Dataset[key, value, valid_from, valid_to, n_rows], where
    valid_from is `ts_col` at the run's first row and valid_to is the
    NEXT run's valid_from inside the same key (null for the key's last
    run) — the type-2 slowly-changing-dimension history every warehouse
    derives from a change log.  Matches the SQL lag-flag + windowed-sum
    island numbering with lead(valid_from) ordered by island index.

    One bucketed exchange on `key`; the body is one sort + vectorized
    run detection — no per-group python."""
    from .agg import bucketed_apply, col_type

    order_by = list(order_by)
    sort_keys = [(key, "ascending")] + [(c, "ascending")
                 for c in order_by]
    ktype, vtype = col_type(ds, key), col_type(ds, value, pa.string())
    ttype = col_type(ds, ts_col)

    def empty() -> pa.Table:
        return pa.table({key: pa.array([], ktype),
                         value: pa.array([], vtype),
                         "valid_from": pa.array([], ttype),
                         "valid_to": pa.array([], ttype),
                         "n_rows": pa.array([], pa.int64())})

    def body(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        s = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        kcol, vcol = s[key], s[value]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        kv = kcol.to_numpy(zero_copy_only=False)
        vv = vcol.to_numpy(zero_copy_only=False)
        k_chg = np.concatenate(([True], kv[1:] != kv[:-1]))
        v_chg = np.concatenate(([True], vv[1:] != vv[:-1]))
        starts = np.flatnonzero(k_chg | v_chg)
        lens = np.diff(np.append(starts, s.num_rows)).astype(np.int64)
        from_vals = s[ts_col].take(pa.array(starts))
        if isinstance(from_vals, pa.ChunkedArray):
            from_vals = from_vals.combine_chunks()
        # valid_to = next run's valid_from iff the next run shares the key
        run_keys = kv[starts]
        same_key_next = np.concatenate(
            (run_keys[1:] == run_keys[:-1], [False]))
        fv = from_vals.to_numpy(zero_copy_only=False)
        to_vals = np.empty(starts.size, object)
        to_vals[:-1] = fv[1:]
        to_vals[-1] = None
        to_vals[~same_key_next] = None
        return pa.table({
            key: kcol.take(pa.array(starts)),
            value: vcol.take(pa.array(starts)),
            "valid_from": from_vals,
            "valid_to": pa.array(to_vals.tolist(), from_vals.type),
            "n_rows": pa.array(lens)})

    return bucketed_apply(ds, [key], body, empty)

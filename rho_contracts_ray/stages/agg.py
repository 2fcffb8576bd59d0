"""Distributed aggregate shapes: rollup, fixed-width histogram, argmax
per group.

All three follow the engine's one rule for wide ops: combine inside
`map_batches` FIRST so the shuffle only ever moves one short row per
(batch, group) — never raw rows.  Reference parity: these are the
aggregate analogues of the reference's table-level constraint reductions
(rho-contracts src/validate.js summary rollups); the rollup/grouping-set
semantics follow ANSI SQL GROUP BY ROLLUP as implemented by DuckDB.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _first_per_key_run(t: pa.Table, keys: list[str],
                       sort_keys: list[tuple]) -> pa.Table:
    """Sort t by sort_keys and keep the FIRST row of each run of equal
    `keys` values — the shared null-safe run-boundary mask
    (_run_starts_multi), no per-group loop."""
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    if t.num_rows <= 1:
        return t
    mask = np.zeros(t.num_rows, dtype=bool)
    mask[_run_starts_multi(t, keys)] = True
    return t.filter(pa.array(mask))


def col_type(ds, col: str, default=None) -> "pa.DataType":
    """Arrow type of `col` in a Dataset (metadata-only when the plan
    allows) — for building schema-correct empty OUTPUT tables whose key
    column must mirror the input's key type (int keys and string keys
    both ride the same stages)."""
    try:
        for f in ds.schema().base_schema:
            if f.name == col:
                return f.type
    except Exception:
        pass
    return default if default is not None else pa.int64()


def bucketed_apply(ds, keys: Sequence[str], fn, empty,
                   n_buckets=None):
    """`ds.groupby(keys).map_groups(fn)` without the sort shuffle: rows are
    hash-range co-partitioned by key (block references routed straight into
    one reduce task per bucket, `stages.distagg.bucketed_reduce`) and
    `fn(table) -> table` runs ONCE per bucket with every row of equal keys
    co-located — the bucket may hold MANY key groups, so fn must group
    internally (Arrow group_by / run-boundary reductions).  Moves each row
    exactly once with no global sort; returns a Dataset whose blocks are
    the per-bucket outputs — nothing lands on the driver.  `empty` is a
    schema-correct zero-row OUTPUT table — or a zero-arg CALLABLE building
    one, preferred when the build needs `ds.schema()` (on a mapped dataset
    that executes a whole block; the callable defers the cost to the rare
    all-empty-input case).  Derive it by calling fn on a zero-row input
    rather than hand-building (Arrow's own naming/typing drifts from
    guesses and mixed block schemas break downstream)."""
    from ..functions.hashing import combine_key, stable_hash64
    from .distagg import bucketed_reduce, dataset_from_refs

    keys = list(keys)

    def add_kh(batch: pa.Table) -> pa.Table:
        kh = stable_hash64(combine_key(batch, keys))
        return batch.append_column("__kh", pa.array(kh.view(np.int64)))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        out = fn(t.drop_columns(["__kh"]))
        return out if out.num_rows else None   # dropped by dataset_from_refs

    hashed = ds.map_batches(add_kh, batch_format="pyarrow")
    refs = bucketed_reduce(hashed, "__kh", reduce_bucket,
                           n_buckets=n_buckets, as_refs=True, empty=None)
    return dataset_from_refs(refs, empty)


def bucketed_group_agg(ds, keys: Sequence[str],
                       aggs: Sequence[tuple], n_buckets=None):
    """Distributed GROUP BY without a sort shuffle — `bucketed_apply` with
    one Arrow `group_by().aggregate(aggs)` per bucket.  Equivalent to
    `ds.groupby(keys).agg(...)` but moves each row exactly once with no
    global sort — at scale a hash exchange, not a range repartition.

    `aggs` are pyarrow aggregate pairs, e.g. ``[("n", "sum")]``; output
    columns follow Arrow naming (``n_sum``).  Feed PRE-AGGREGATED per-batch
    partials when the aggregate allows it (sum/count/min/max) so the
    exchange moves one short row per (batch, group), never raw rows."""
    keys = list(keys)
    aggs = [tuple(a) for a in aggs]

    def agg_fn(t: pa.Table) -> pa.Table:
        return t.group_by(keys).aggregate(aggs)

    def make_empty() -> pa.Table:   # only built when EVERY bucket is empty
        schema = ds.schema()
        if schema is None:   # degenerate empty input lost its schema
            return pa.table({})
        types = {f.name: f.type for f in schema.base_schema}
        agg_cols = [c for c, _ in aggs if c]
        return agg_fn(pa.table({
            **{k: pa.array([], types[k]) for k in keys},
            **{c: pa.array([], types[c]) for c in agg_cols}}))

    return bucketed_apply(ds, keys, agg_fn, make_empty, n_buckets=n_buckets)


def bucketed_sum(ds, keys: Sequence[str], sum_cols: Sequence[str],
                 n_buckets=None):
    """`ds.groupby(keys).sum(sum_cols)` without the sort shuffle, output
    keeping the INPUT column names (``cnt`` stays ``cnt``, not Arrow's
    ``cnt_sum`` / Ray's ``sum(cnt)``).  The drop-in replacement for the
    post-partial total step of count/sum pipelines."""
    keys, sum_cols = list(keys), list(sum_cols)
    out = bucketed_group_agg(ds, keys, [(c, "sum") for c in sum_cols],
                             n_buckets=n_buckets)

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({**{k: t[k] for k in keys},
                         **{c: t[f"{c}_sum"] for c in sum_cols}})

    return out.map_batches(fix, batch_format="pyarrow")


def group_collect(ds, key: str, val: str, sep: str = ",",
                  out_col: str = "vals", distinct: bool = False):
    """Per-key ordered collect: the `val` values of each key joined with
    `sep` in ascending value order -> (key, out_col) — SQL
    string_agg(val, sep ORDER BY val) / array_agg.  Documented contract:
    rows with a null `val` are dropped first (oracle: WHERE val IS NOT
    NULL), so a key whose values are ALL null is omitted; null keys form
    their own group.

    Scale shape: ONE bucketed exchange by key; inside a bucket a single
    Arrow sort + one vectorized `binary_join` over the list-ified runs
    builds every key's string — no per-group call.  Partitioning
    assumption (inherent to any collect): one key's joined values fit in
    one task; cap or pre-aggregate upstream for pathological keys."""
    def collect(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[val]))
        s = t.select([key, val]).take(pc.sort_indices(
            t.select([key, val]),
            sort_keys=[(key, "ascending"), (val, "ascending")]))
        v = s[val]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        sv = pc.cast(v, pa.string())
        starts = _run_starts_multi(s, [key])
        if distinct and s.num_rows > 1:
            # drop repeats within a run (values sorted within the run)
            prev_same = np.zeros(s.num_rows, dtype=bool)
            eq = pc.equal(sv.slice(1), sv.slice(0, len(sv) - 1))
            prev_same[1:] = pc.fill_null(eq, False) \
                .to_numpy(zero_copy_only=False)
            prev_same[starts] = False
            m = pa.array(~prev_same)
            s = pa.table({key: s[key].filter(m)})
            sv = sv.filter(m)
            starts = _run_starts_multi(s, [key])
        if len(sv) > np.iinfo(np.int32).max:
            # int32 list offsets would wrap SILENTLY into corrupt lists;
            # a single key this hot survived the oversized-bucket split
            # (equal keys cannot be separated) — fail loudly instead
            raise ValueError(
                f"group_collect: one bucket holds {len(sv)} values — "
                "exceeds 32-bit list offsets; a pathologically hot key "
                "needs pre-aggregation or sampling upstream")
        offsets = np.append(starts, len(sv)).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), sv)
        return pa.table({key: s[key].take(pa.array(starts)),
                         out_col: pc.binary_join(lists, sep)})

    def make_empty() -> pa.Table:
        schema = ds.schema()
        if schema is None:
            return pa.table({})
        schema = schema.base_schema
        return pa.table({key: pa.array([], schema.field(key).type),
                         out_col: pa.array([], pa.string())})

    return bucketed_apply(ds.select_columns([key, val]), [key], collect,
                          make_empty)


def quantile_col_name(q: float) -> str:
    """Column label for a quantile: p50, p95, ... — sub-percent quantiles
    keep their fraction (0.999 -> p99_9) instead of rounding into a
    NEIGHBORING percentile's name (round(99.9) == 100 would mislabel the
    99.9th as the max and collide 0.995 with 1.0)."""
    return ("p%g" % (q * 100)).replace(".", "_").replace("-", "m")


def _run_starts_multi(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Start indices of equal-key runs in an already key-sorted table."""
    if t.num_rows <= 1:
        return np.zeros(min(t.num_rows, 1), dtype=np.int64)
    new_run = np.zeros(t.num_rows, dtype=bool)
    new_run[0] = True
    for k in keys:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        a, b = col.slice(1), col.slice(0, len(col) - 1)
        ne = pc.fill_null(pc.not_equal(a, b), False)
        diff = pc.or_(ne, pc.xor(pc.is_null(a), pc.is_null(b)))
        new_run[1:] |= diff.to_numpy(zero_copy_only=False)
    return np.flatnonzero(new_run).astype(np.int64)


def group_argmax(ds, key: str, score: str, id_col: str):
    """Best row per group: max `score`, ties broken by min `id_col` ->
    (key, id_col, score).  The keep-BEST-copy dedup primitive (keep the
    longest / highest-quality member of each duplicate group).

    Scale shape: each batch reduces to ONE candidate row per key present
    in it (sort + run-boundary mask), so the shuffle moves one short row
    per (batch, key); the per-group finish applies the same pick to the
    few surviving candidates.  Equivalent SQL: row_number() OVER
    (PARTITION BY key ORDER BY score DESC, id) = 1."""
    sort_keys = [(key, "ascending"), (score, "descending"),
                 (id_col, "ascending")]

    def partial(batch: pa.Table) -> pa.Table:
        return _first_per_key_run(batch.select([key, score, id_col]),
                                  [key], sort_keys)

    def finish(t: pa.Table) -> pa.Table:
        return _first_per_key_run(t, [key], sort_keys) \
            .select([key, id_col, score])

    def make_empty() -> pa.Table:
        schema = ds.schema()
        if schema is None:
            return pa.table({})
        schema = schema.base_schema
        return pa.table({key: pa.array([], schema.field(key).type),
                         id_col: pa.array([], schema.field(id_col).type),
                         score: pa.array([], schema.field(score).type)})

    return bucketed_apply(ds.map_batches(partial, batch_format="pyarrow"),
                          [key], finish, make_empty)


def rollup_agg(ds, keys: Sequence[str], value: str,
               sum_col: str = "sum_value", cnt_col: str = "n"):
    """GROUP BY ROLLUP(keys...): sum+count at every prefix level of
    `keys`, coarser levels null-padded, plus the grand total — ANSI
    ROLLUP semantics (DuckDB-oracle-able).

    Scale shape: ONE pass over the data (per-batch combine on the finest
    key set -> one small groupby); every coarser level re-aggregates the
    PREVIOUS level's output — each strictly smaller — so the raw data is
    scanned once and never re-shuffled.  Levels are unioned lazily."""
    import ray.data as rd

    keys = list(keys)
    if not keys:
        raise ValueError("rollup_agg: need at least one key")

    def mk_partial(level_keys: list[str], in_sum: str, in_cnt):
        def partial(batch: pa.Table) -> pa.Table:
            aggs = [(in_sum, "sum")]
            aggs.append(([], "count_all") if in_cnt is None
                        else (in_cnt, "sum"))
            g = batch.group_by(level_keys).aggregate(aggs)
            return g.rename_columns(level_keys + ["s", "n"])
        return partial

    def pad(t: pa.Table, level_keys: list[str]) -> pa.Table:
        cols = {}
        for k in keys:
            cols[k] = t[k] if k in level_keys else \
                pa.nulls(t.num_rows, key_types[k])
        cols[sum_col] = t["s"]
        cols[cnt_col] = t["n"]
        return pa.table(cols)

    schema = ds.schema().base_schema
    key_types = {k: schema.field(k).type for k in keys}

    # finest level: combine in-batch, then the only full-data exchange
    # (hash-range bucketed, no sort shuffle)
    levels = []
    prev = bucketed_sum(ds.map_batches(mk_partial(keys, value, None),
                                       batch_format="pyarrow"),
                        keys, ["s", "n"])
    levels.append(prev.map_batches(lambda t, lk=list(keys): pad(t, lk),
                                   batch_format="pyarrow"))
    for i in range(len(keys) - 1, 0, -1):
        lk = keys[:i]
        prev = bucketed_sum(prev.map_batches(mk_partial(lk, "s", "n"),
                                             batch_format="pyarrow"),
                            lk, ["s", "n"])
        levels.append(prev.map_batches(lambda t, lk=lk: pad(t, lk),
                                       batch_format="pyarrow"))

    def grand(t: pa.Table) -> pa.Table:
        # DuckDB ROLLUP grand total: SUM over no/all-null values is NULL
        # (count 0) — coercing to 0 here would diverge from the oracle
        # AND from this op's own finer levels
        sv = pc.sum(t["s"]).as_py()
        return pa.table({
            **{k: pa.nulls(1, key_types[k]) for k in keys},
            sum_col: pa.array([sv], t.schema.field("s").type),
            cnt_col: pa.array([int(pc.sum(t["n"]).as_py() or 0)],
                              pa.int64()),
        })

    # grand total from the coarsest level (tiny): collapse to one row
    total_src = prev.map_batches(
        lambda t: t.select(["s", "n"]), batch_format="pyarrow")
    parts = [b for b in total_src.iter_batches(batch_size=None,
                                               batch_format="pyarrow")]
    sum_type = pa.int64() if pa.types.is_integer(schema.field(value).type) \
        else pa.float64()
    tot_t = pa.concat_tables(
        [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
         for p in parts]) if parts else pa.table(
        {"s": pa.array([], sum_type), "n": pa.array([], pa.int64())})
    levels.append(rd.from_arrow(grand(tot_t)))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def histogram(ds, col: str, lo: float, hi: float, nbins: int,
              bin_col: str = "bin", lo_col: str = "bin_lo",
              cnt_col: str = "n"):
    """Fixed-width histogram over [lo, hi): (bin, bin_lo, n) for ALL
    nbins bins, zeros included.  Values outside [lo, hi) and nulls/NaNs
    are dropped (documented contract; count them upstream if needed).

    Bin assignment uses the EXACT expression `floor((v - lo) / w)` in
    IEEE double — the same arithmetic a SQL oracle writes — so boundary
    values bin identically in both engines (np.histogram's edge logic
    would not).  Scale shape: per-batch bincount partials (one row per
    non-empty bin per batch), small groupby, zero-fill on the driver
    (nbins rows)."""
    if nbins <= 0 or not (hi > lo):
        raise ValueError("histogram: need nbins > 0 and hi > lo")
    w = (hi - lo) / nbins

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        v = c.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v < hi)]
        idx = np.floor((v - lo) / w).astype(np.int64)
        # fp guard: (v-lo)/w can round up to nbins for v just below hi
        idx = np.minimum(idx, nbins - 1)
        cnt = np.bincount(idx, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({bin_col: pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    small = bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                         [bin_col], ["c"])
    full = np.zeros(nbins, np.int64)
    for b in small.iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        full[t[bin_col].to_numpy(zero_copy_only=False)] = \
            t["c"].to_numpy(zero_copy_only=False)
    bins = np.arange(nbins, dtype=np.int64)
    return pa.table({bin_col: pa.array(bins),
                     lo_col: pa.array(lo + bins * w, pa.float64()),
                     cnt_col: pa.array(full)})


def grouping_sets_agg(ds, sets: Sequence[Sequence[str]], value: str,
                      sum_col: str = "sum_value", cnt_col: str = "n"):
    """GROUP BY GROUPING SETS((...), ...): sum+count for each requested
    key subset, absent keys null-padded — ANSI semantics as DuckDB
    implements them.  The empty set () is the grand total.

    Scale shape: ONE pass over the raw data aggregates to the UNION of
    all keys (per-batch combine -> one small groupby); every requested
    set then re-aggregates that compact base — sums and counts are
    re-aggregable, so no second scan and no second full shuffle.  Caveat
    (documented, matches the SQL caveat without GROUPING()): a genuine
    NULL key value in the input is indistinguishable from padding in the
    output.
    """
    import ray.data as rd

    sets = [list(s) for s in sets]
    base_keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in base_keys:
                base_keys.append(k)
    if not base_keys:
        raise ValueError("grouping_sets_agg: need at least one non-empty "
                         "set (use rollup_agg for plain totals)")

    schema = ds.schema().base_schema
    key_types = {k: schema.field(k).type for k in base_keys}
    sum_type = pa.int64() if pa.types.is_integer(schema.field(value).type) \
        else pa.float64()

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(base_keys).aggregate([(value, "sum"),
                                                 ([], "count_all")])
        return g.rename_columns(base_keys + ["s", "n"])

    base = bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                        base_keys, ["s", "n"])

    def mk_level(level_keys: list[str]):
        def agg_level(t: pa.Table) -> pa.Table:
            if level_keys:
                g = t.group_by(level_keys).aggregate([("s", "sum"),
                                                      ("n", "sum")])
                g = g.rename_columns(level_keys + ["s", "n"])
            else:
                # SUM over no/all-null values stays NULL — the SQL
                # grand-total row has s=NULL, n=0 (coercing to 0 would
                # diverge from the oracle and the finer sets)
                sv = pc.sum(t["s"]).as_py()
                g = pa.table({
                    "s": pa.array([sv], sum_type),
                    "n": pa.array([int(pc.sum(t["n"]).as_py() or 0)],
                                  pa.int64())})
            cols = {}
            for k in base_keys:
                cols[k] = g[k] if k in level_keys else \
                    pa.nulls(g.num_rows, key_types[k])
            cols[sum_col] = pc.cast(g["s"], sum_type)
            cols[cnt_col] = g["n"]
            return pa.table(cols)
        return agg_level

    # each set re-aggregates the SAME compact base: for the non-trivial
    # sets this is a tiny groupby per block then a groupby over partials;
    # base is small (one row per distinct base-key combo) so a per-set
    # repartition(1)-free path: map_batches partials + groupby again
    levels = []
    for s in sets:
        if s == base_keys:
            levels.append(base.map_batches(mk_level(s),
                                           batch_format="pyarrow"))
        elif s:
            lv = bucketed_sum(
                base.map_batches(
                    lambda t, lk=list(s): t.group_by(lk).aggregate(
                        [("s", "sum"), ("n", "sum")]).rename_columns(
                            lk + ["s", "n"]),
                    batch_format="pyarrow"),
                list(s), ["s", "n"]) \
                .map_batches(mk_level(list(s)), batch_format="pyarrow")
            levels.append(lv)
        else:
            # grand total: collapse the base's (tiny) s/n columns
            parts = [b for b in base.select_columns(["s", "n"]).iter_batches(
                batch_size=None, batch_format="pyarrow")]
            tot = pa.concat_tables(
                [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
                 for p in parts]) if parts else pa.table(
                {"s": pa.array([], sum_type), "n": pa.array([], pa.int64())})
            levels.append(rd.from_arrow(mk_level([])(tot)))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_agg(ds, keys: Sequence[str], value: str,
             sum_col: str = "sum_value", cnt_col: str = "n"):
    """GROUP BY CUBE(keys...): every subset of `keys` including the grand
    total — delegates to grouping_sets_agg (2^len(keys) sets; cap at 6
    keys to keep the set count sane)."""
    keys = list(keys)
    if len(keys) > 6:
        raise ValueError("cube_agg: more than 6 keys means "
                         f"{2**len(keys)} grouping sets — pass an "
                         "explicit grouping_sets_agg selection instead")
    from itertools import combinations

    sets = []
    for r in range(len(keys), -1, -1):
        for combo in combinations(keys, r):
            sets.append(list(combo))
    return grouping_sets_agg(ds, sets, value, sum_col, cnt_col)


def pivot_counts(ds, key: str, cat_col: str, categories: Sequence[str],
                 prefix: str = "n_"):
    """Wide pivot: one row per `key`, one count column per category in
    `categories` (fixed, caller-supplied list — at 100 TB you never want
    the column set data-dependent) plus the row total.  Equivalent SQL:
    sum(CASE WHEN cat = 'x' THEN 1 ELSE 0 END) conditional aggregation.

    Scale shape: each batch reduces to one (key, n_cat...) row per key
    present in it (a small group_by on the batch), so the shuffle moves
    len(categories)+2 ints per (batch, key) — never raw rows."""
    categories = list(categories)
    cols = [f"{prefix}{c}" for c in categories]

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key, cat_col]).group_by([key, cat_col]) \
            .aggregate([([], "count_all")])
        out = {key: g[key]}
        m = g[cat_col]
        n = pc.cast(g["count_all"], pa.int64())
        zero = pc.cast(pa.scalar(0), pa.int64())
        for c, name in zip(categories, cols):
            # null-safe: a null category matches nothing (SQL CASE WHEN)
            out[name] = pc.if_else(pc.fill_null(pc.equal(m, c), False),
                                   n, zero)
        out["total"] = n
        return pa.table(out)

    return bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                        [key], cols + ["total"])


def group_mode(ds, key: str, val: str, cnt_col: str = "n"):
    """Most frequent `val` per `key`, ties broken by the smallest value →
    (key, val, n).  Equivalent SQL: row_number() OVER (PARTITION BY key
    ORDER BY count(*) DESC, val) = 1 on the (key, val) counts.

    Scale shape: per-batch (key, val, n) partials (one short row per
    distinct pair per batch) → one groupby summing n → argmax per key
    via the same run-boundary reduction group_argmax uses."""
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key, val]).group_by([key, val]) \
            .aggregate([([], "count_all")])
        return pa.table({key: g[key], val: g[val],
                         cnt_col: pc.cast(g["count_all"], pa.int64())})

    sort_keys = [(key, "ascending"), (cnt_col, "descending"),
                 (val, "ascending")]

    # ONE exchange: partials route by hash(key) — (key, val) pairs of the
    # same key land in the same bucket, so the bucket can both finish the
    # counts and pick the argmax without a second shuffle
    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by([key, val]).aggregate([(cnt_col, "sum")]) \
            .rename_columns([key, val, cnt_col])
        return _first_per_key_run(g, [key], sort_keys) \
            .select([key, val, cnt_col])

    def make_empty() -> pa.Table:
        schema = ds.schema()
        if schema is None:
            return pa.table({})
        schema = schema.base_schema
        return pa.table({key: pa.array([], schema.field(key).type),
                         val: pa.array([], schema.field(val).type),
                         cnt_col: pa.array([], pa.int64())})

    return bucketed_apply(ds.map_batches(partial, batch_format="pyarrow"),
                          [key], finish, make_empty)


def group_approx_distinct(ds, key: str, val: str, p: int = 12,
                          out_col: str = "approx_distinct",
                          n_buckets=None):
    """Per-key approximate COUNT(DISTINCT val) via mergeable HyperLogLog
    register partials -> (key, out_col float64).  ~1.04/sqrt(2^p) relative
    error (p=12 -> ~1.6%); the scale counterpart of the exact
    `distinct_pairs` path: exact count-distinct must move one row per
    DISTINCT (key, val) pair through the exchange, this moves one 2^p-byte
    sketch per (batch, key) regardless of cardinality — the only option
    when distinct values per key outnumber what a bucket task can hold.

    Scale shape: each batch emits one (key, m-byte register blob) row per
    distinct key in the batch; ONE bucketed exchange by key; the bucket
    merge is a single segment-maximum over the stacked register matrix —
    no per-key Python.  Deterministic (stable_hash64) and
    partition-order-independent (register max is commutative), so results
    are byte-identical across repartitionings.  Null `val` rows are
    ignored (SQL COUNT(DISTINCT) semantics); null keys form their own
    group.  Partitioning note: a batch's partial is one sketch PER
    DISTINCT KEY, so this fits low-to-moderate key cardinality with huge
    per-key value sets — for millions of tiny groups use the exact
    `distinct_pairs` path instead.  Reference parity: the HLL
    register/estimator math follows constraints/stats.py's column-level
    HyperLogLog (Flajolet et al. 2007, public)."""
    from ..functions.hashing import stable_hash64

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def _key_runs(t: pa.Table):
        """(sorted table, run-start indices) by `key` (nulls form a run)
        — the shared null-safe run-boundary mask."""
        t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending")]))
        return t, _run_starts_multi(t, [key])

    def _rho(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(register index, rank) per hash — same math as
        functions.sketches.HyperLogLog.add_hashes."""
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        rho = np.ones(h.size, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest
        unresolved = np.ones(h.size, dtype=bool)
        for k in range(1, 64 - p + 2):
            topset = (cur & mask) != 0
            newly = unresolved & topset
            rho[newly] = k
            unresolved &= ~topset
            if not unresolved.any():
                break
            cur = cur << np.uint64(1)
        return idx, rho

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, val]).filter(pc.is_valid(batch[val]))
        if t.num_rows == 0:
            return pa.table({key: pa.array([], batch.schema.field(key).type),
                             "__hll": pa.array([], pa.binary())})
        t, starts = _key_runs(t)
        run_id = np.zeros(t.num_rows, np.int64)
        run_id[starts[1:]] = 1
        run_id = np.cumsum(run_id)
        idx, rho = _rho(stable_hash64(t[val]))
        regs = np.zeros(starts.size * m, np.uint8)
        np.maximum.at(regs, run_id * m + idx, rho)
        keys_first = t[key].take(pa.array(starts))
        blobs = regs.reshape(starts.size, m)
        return pa.table({
            key: keys_first,
            "__hll": pa.array([r.tobytes() for r in blobs], pa.binary())})

    def _blob_matrix(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # fixed-width m-byte blobs: when the BinaryArray is dense (no
        # nulls, contiguous offsets — the only shape the partial emits),
        # view its data buffer directly instead of materializing every
        # blob as a Python bytes object + one joined copy
        offs = np.frombuffer(col.buffers()[1], np.int32,
                             len(col) + 1, col.offset * 4)
        if col.null_count == 0 and offs[0] + m * len(col) == offs[-1] \
                and np.all(np.diff(offs) == m):
            return np.frombuffer(col.buffers()[2], np.uint8,
                                 m * len(col), offs[0]).reshape(-1, m)
        return np.frombuffer(b"".join(col.to_pylist()), np.uint8) \
            .reshape(-1, m)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: t[key], out_col: pa.array([], pa.float64())})
        t, starts = _key_runs(t)
        mat = _blob_matrix(t["__hll"])
        merged = np.maximum.reduceat(mat, starts, axis=0) \
            if starts.size else mat[:0]
        # vectorized HLL estimate across keys (+ linear counting branch)
        est = alpha * m * m / np.exp2(-merged.astype(np.float64)).sum(axis=1)
        zeros = (merged == 0).sum(axis=1)
        lc = zeros > 0
        small = est <= 2.5 * m
        use_lc = small & lc
        with np.errstate(divide="ignore"):
            est[use_lc] = m * np.log(m / zeros[use_lc].astype(np.float64))
        return pa.table({key: t[key].take(pa.array(starts)),
                         out_col: pa.array(est, pa.float64())})

    def make_empty() -> pa.Table:
        schema = ds.schema()
        ktype = pa.string() if schema is None \
            else schema.base_schema.field(key).type
        return pa.table({key: pa.array([], ktype),
                         out_col: pa.array([], pa.float64())})

    return bucketed_apply(ds.map_batches(partial, batch_format="pyarrow"),
                          [key], finish, make_empty, n_buckets=n_buckets)


def group_quantiles_sketch(ds, key: str, value: str,
                           qs: Sequence[float] = (0.5, 0.95, 0.99),
                           compression: float = 200.0, n_buckets=None):
    """Per-key APPROXIMATE quantiles via mergeable t-digests ->
    (key, p50, p95, ...).  The scale counterpart of the exact
    `joins.group_quantiles`: exact quantiles must co-locate every raw row
    of a key in one task; this moves one ~KB digest per (batch, key)
    regardless of group size — the only option when a single group
    outgrows a bucket task.  Accuracy follows the t-digest guarantee
    (tight at the tails); results depend on merge order at float-rounding
    scale, so the contract is accuracy vs the exact answer (pytest), not
    byte determinism.  Null/NaN values are ignored; a key whose values
    are all null yields nulls (matching the exact op)."""
    import pickle

    from ..functions.sketches import TDigest

    qs = list(qs)
    names = [quantile_col_name(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"group_quantiles_sketch: quantiles {qs} collide in the p<NN> "
            f"naming ({names})")

    def _runs(t: pa.Table):
        t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending")]))
        return t, _run_starts_multi(t, [key])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, value])
        if t.num_rows == 0:
            return pa.table({key: t[key], "__td": pa.array([], pa.binary())})
        t, starts = _runs(t)
        ends = np.append(starts[1:], t.num_rows)
        vals = pc.cast(t[value], pa.float64()).to_numpy(zero_copy_only=False)
        blobs = []
        for s, e in zip(starts, ends):   # one digest per DISTINCT key
            d = TDigest(compression)
            v = vals[s:e]
            d.add(v[~np.isnan(v)])
            blobs.append(pickle.dumps(d))
        return pa.table({key: t[key].take(pa.array(starts)),
                         "__td": pa.array(blobs, pa.binary())})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: t[key],
                             **{nm: pa.array([], pa.float64())
                                for nm in names}})
        t, starts = _runs(t)
        ends = np.append(starts[1:], t.num_rows)
        blobs = t["__td"].to_pylist()
        out_q = {nm: [] for nm in names}
        for s, e in zip(starts, ends):
            # canonical merge order: t-digest merging is order-sensitive
            # at float-rounding scale and the bucket's row order follows
            # Ray's nondeterministic block arrival — sort the serialized
            # digests so identical data reproduces bit-for-bit
            run = sorted(blobs[s:e])
            d = pickle.loads(run[0])
            for b in run[1:]:
                d.merge(pickle.loads(b))
            for q, nm in zip(qs, names):
                out_q[nm].append(d.quantile(q) if d.count else None)
        return pa.table({key: t[key].take(pa.array(starts)),
                         **{nm: pa.array(out_q[nm], pa.float64())
                            for nm in names}})

    def make_empty() -> pa.Table:
        schema = ds.schema()
        ktype = pa.string() if schema is None \
            else schema.base_schema.field(key).type
        return pa.table({key: pa.array([], ktype),
                         **{nm: pa.array([], pa.float64()) for nm in names}})

    return bucketed_apply(ds.map_batches(partial, batch_format="pyarrow"),
                          [key], finish, make_empty, n_buckets=n_buckets)

"""Constraint suggestion — profile a Dataset in one streaming pass and
propose the contracts/constraints its columns already satisfy (the
"constraint suggestion" idea of Deequ: Schelter et al., "Automating
Large-Scale Data Quality Verification", VLDB 2018 — re-expressed on Ray
Data; the reference library's fromExample (contract.impl.js:744-760)
does the same for ONE value, this does it for a corpus).

Scale design: one partial row per (batch, column) — a dozen scalars plus
a distinct-value list of at most `domain_cap` entries (a batch with more
than `domain_cap` distinct values emits a NULL domain instead, and null
is sticky through the merge), so the driver-side fold is
O(#batches x #columns x domain_cap) regardless of input size.  No
shuffle; the input streams once.

Every emitted statistic is SQL-exact (integer basis points, exact
min/max, epoch-microsecond timestamps) so the whole profile has a
bit-for-bit DuckDB oracle (`suggest_constraints_*` in __ray_entry__).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PROFILE_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("dtype", pa.string()),
    ("n_rows", pa.int64()),
    ("n_null", pa.int64()),
    ("completeness_bp", pa.int64()),   # floor(non_null * 10000 / n_rows)
    ("min_num", pa.float64()),         # numeric cols; timestamps as epoch us
    ("max_num", pa.float64()),
    ("min_str", pa.string()),
    ("max_str", pa.string()),
    # 1/0/null instead of bool: a NULLABLE bool round-trips to a pandas
    # object column where None != NaN, breaking the driver's value compare
    ("all_int", pa.int64()),           # numeric cols: every value whole
    ("domain", pa.string()),           # sorted distinct, '|'-joined, <= cap
    ("n_distinct_capped", pa.int64()),
    ("suggestions", pa.string()),
])

_PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("dtype", pa.string()),
    ("cnt", pa.int64()),
    ("nulls", pa.int64()),
    ("vmin", pa.float64()),
    ("vmax", pa.float64()),
    ("smin", pa.string()),
    ("smax", pa.string()),
    ("all_int", pa.bool_()),
    ("dom", pa.list_(pa.string())),    # null = cap exceeded (sticky)
])


def _dtype_label(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    return str(t)


class SuggestPartialStage:
    """Per-batch profile partials for a set of columns (map_batches fn)."""

    def __init__(self, cols: Sequence[str], domain_cap: int = 20):
        self.cols = list(cols)
        self.cap = domain_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {f.name: [] for f in _PARTIAL_SCHEMA}
        for name in self.cols:
            if name not in batch.column_names:
                continue
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = col.type
            n = len(col)
            nulls = col.null_count
            vmin = vmax = None
            smin = smax = None
            all_int = None
            dom = None
            nn = col.drop_null()
            if pa.types.is_integer(t) or pa.types.is_floating(t):
                v = nn.to_numpy(zero_copy_only=False).astype(np.float64)
                v = v[~np.isnan(v)]
                if v.size:
                    vmin, vmax = float(v.min()), float(v.max())
                    all_int = bool(np.all(v == np.floor(v)))
            elif pa.types.is_timestamp(t):
                # epoch microseconds: exact integers < 2^53, so the
                # float64 column hashes identically to the SQL oracle's
                # CAST(epoch_us(...) AS DOUBLE)
                us = pc.cast(nn, pa.int64()).to_numpy(zero_copy_only=False)
                if us.size:
                    vmin, vmax = float(us.min()), float(us.max())
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                if len(nn):
                    mm = pc.min_max(nn)
                    smin, smax = mm["min"].as_py(), mm["max"].as_py()
                u = pc.unique(nn)
                # more than cap distinct values -> NULL (sticky-overflow)
                # domain; the full distinct set never leaves the task
                dom = u.to_pylist() if len(u) <= self.cap else None
            rows["column"].append(name)
            rows["dtype"].append(_dtype_label(t))
            rows["cnt"].append(n - nulls)
            rows["nulls"].append(nulls)
            rows["vmin"].append(vmin)
            rows["vmax"].append(vmax)
            rows["smin"].append(smin)
            rows["smax"].append(smax)
            rows["all_int"].append(all_int)
            rows["dom"].append(dom)
        return pa.Table.from_pydict(rows, schema=_PARTIAL_SCHEMA)


def _merge_min(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def _merge_max(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b)


def _suggestion_string(dtype: str, n_rows: int, n_null: int,
                       min_num, all_int, domain) -> str:
    """Deterministic rule list — the SQL oracle rebuilds this string with
    the same fixed order, so keep the order stable."""
    parts = [f"hasType:{dtype}"]
    if n_rows > 0 and n_null == 0:
        parts.append("complete")
    if dtype not in ("string", "timestamp") and min_num is not None \
            and min_num >= 0:
        parts.append("nonNegative")
    if dtype == "double" and all_int:
        parts.append("integerValued")
    if domain is not None:
        parts.append(f"inSet:{domain}")
    return "; ".join(parts)


def _fresh_acc(dtype: str) -> dict:
    return {"dtype": dtype, "cnt": 0, "nulls": 0, "vmin": None,
            "vmax": None, "smin": None, "smax": None, "all_int": None,
            "dom": set(), "dom_over": False}


def _fold_partial_row(m: dict, r: dict, domain_cap: int) -> None:
    """Fold one partial row into an accumulator — the ONE merge shared
    by the global and the grouped profile."""
    m["cnt"] += r["cnt"]
    m["nulls"] += r["nulls"]
    m["vmin"] = _merge_min(m["vmin"], r["vmin"])
    m["vmax"] = _merge_max(m["vmax"], r["vmax"])
    m["smin"] = _merge_min(m["smin"], r["smin"])
    m["smax"] = _merge_max(m["smax"], r["smax"])
    if r["all_int"] is not None:
        m["all_int"] = r["all_int"] if m["all_int"] is None \
            else (m["all_int"] and r["all_int"])
    if r["dtype"] == "string":
        if r["dom"] is None:
            m["dom_over"] = True
        elif not m["dom_over"]:
            # once overflowed, stop growing the (discarded) set — the
            # fold must stay at O(cap) per key, not O(batches x cap)
            m["dom"].update(r["dom"])
            if len(m["dom"]) > domain_cap:
                m["dom_over"] = True


def _emit_acc(out: dict, name: str, m: dict) -> None:
    """Append one PROFILE_SCHEMA row from an accumulator."""
    n_rows = m["cnt"] + m["nulls"]
    domain = None
    n_dom = None
    if m["dtype"] == "string" and not m["dom_over"] and m["dom"]:
        vals = sorted(m["dom"])
        domain = "|".join(vals)
        n_dom = len(vals)
    out["column"].append(name)
    out["dtype"].append(m["dtype"])
    out["n_rows"].append(n_rows)
    out["n_null"].append(m["nulls"])
    out["completeness_bp"].append(
        (m["cnt"] * 10000) // n_rows if n_rows > 0 else None)
    out["min_num"].append(m["vmin"])
    out["max_num"].append(m["vmax"])
    out["min_str"].append(m["smin"])
    out["max_str"].append(m["smax"])
    out["all_int"].append(
        None if m["all_int"] is None else int(m["all_int"]))
    out["domain"].append(domain)
    out["n_distinct_capped"].append(n_dom)
    out["suggestions"].append(_suggestion_string(
        m["dtype"], n_rows, m["nulls"], m["vmin"], m["all_int"], domain))


def suggest_constraints(ds, cols: Optional[Sequence[str]] = None,
                        domain_cap: int = 20) -> pa.Table:
    """Profile `ds` and return one PROFILE_SCHEMA row per column, sorted
    by column name, with a `suggestions` rule list per column."""
    sch = ds.schema()
    if sch is None:
        # an empty Dataset that went through an all-to-all op has no
        # schema at all — there is nothing to profile or even name
        raise ValueError("suggest_constraints: input dataset has no "
                         "schema (empty post-shuffle dataset)")
    schema = sch.base_schema
    if cols is None:
        cols = list(schema.names)
    missing = [n for n in cols if n not in schema.names]
    if missing:
        raise ValueError(f"suggest_constraints: columns {missing} not in "
                         f"the input schema {schema.names}")
    stage = SuggestPartialStage(cols, domain_cap)
    parts = []
    for b in ds.map_batches(stage, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if {"column", "cnt"} <= set(t.column_names) and t.num_rows:
            parts.append(t)
    # seed every requested column from the SCHEMA so an empty input still
    # yields one profile row per column (the SQL oracle's aggregate-only
    # form always returns a row)
    merged: dict[str, dict] = {
        name: _fresh_acc(_dtype_label(schema.field(name).type))
        for name in cols}
    for t in (parts or []):
        for r in t.to_pylist():
            _fold_partial_row(merged[r["column"]], r, domain_cap)
    out = {f.name: [] for f in PROFILE_SCHEMA}
    for name in sorted(merged):
        _emit_acc(out, name, merged[name])
    return pa.Table.from_pydict(out, schema=PROFILE_SCHEMA)


def _nonneg_scalar(v):
    return v is not None and v >= 0


def _nonneg_vec(col):
    return pc.greater_equal(col, 0.0)


def suggested_contract(profile: pa.Table):
    """Compose a real contract from a profile: every suggested rule
    becomes the matching DSL node, so `validate(ds, suggested_contract(
    suggest_constraints(ds)))` is violation-free by construction — and
    catches regressions on the NEXT snapshot (the Deequ suggestion
    loop)."""
    from .. import c

    fields = {}
    for r in profile.to_pylist():
        dtype, rules = r["dtype"], r["suggestions"].split("; ")
        if dtype == "string":
            if r["domain"] is not None:
                vals = r["domain"].split("|")
                # the profile joins the domain with '|' (bit-exact SQL
                # oracle contract); a domain VALUE containing '|' would
                # shred into fragments and the contract would reject the
                # very data it was profiled from — detect via the
                # distinct count and fall back to c.string
                if (r.get("n_distinct_capped") is not None
                        and len(vals) != r["n_distinct_capped"]):
                    base = c.string
                else:
                    base = c.oneOf(*vals)
            else:
                base = c.string
        elif dtype == "timestamp":
            base = c.date
        elif "integerValued" in rules or dtype.startswith("int"):
            base = c.integer
        else:
            base = c.number
        if dtype not in ("string", "timestamp") and "nonNegative" in rules:
            # module-level fns, not lambdas: the contract is pickled into
            # the validator actor pool
            base = c.and_(base, c.pred(
                _nonneg_scalar, vectorized=_nonneg_vec)
                .rename("nonNegative"))
        if "complete" not in rules:
            base = c.optional(base)
        fields[r["column"]] = base
    return c.object(fields)


DRIFT_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("change", pa.string()),       # added | removed | dtype | rules
    ("before", pa.string()),
    ("after", pa.string()),
])


def profile_drift(before: pa.Table, after: pa.Table) -> pa.Table:
    """Rule-level drift between two suggest_constraints profiles —
    columns added/removed, dtype changes, and suggestion-rule changes
    (a lost `complete`, a grown `inSet` domain, a lost `nonNegative`)
    -> DRIFT_SCHEMA rows sorted by (column, change); empty = no drift.

    This is the contract-shaped complement of the value-level drift
    checks (constraints/drift.py): those ask "did the DISTRIBUTION
    move", this asks "did the RULES the data satisfies move"."""
    for t, side in ((before, "before"), (after, "after")):
        missing = {"column", "dtype", "suggestions"} \
            - set(t.column_names)
        if missing:
            raise ValueError(f"profile_drift: {side} profile lacks "
                             f"{sorted(missing)}")
    b = {r["column"]: r for r in before.to_pylist()}
    a = {r["column"]: r for r in after.to_pylist()}
    rows = []
    for col in sorted(set(b) | set(a)):
        if col not in a:
            rows.append((col, "removed", b[col]["suggestions"], None))
            continue
        if col not in b:
            rows.append((col, "added", None, a[col]["suggestions"]))
            continue
        if b[col]["dtype"] != a[col]["dtype"]:
            rows.append((col, "dtype", b[col]["dtype"], a[col]["dtype"]))
        if b[col]["suggestions"] != a[col]["suggestions"]:
            rows.append((col, "rules", b[col]["suggestions"],
                         a[col]["suggestions"]))
    out = {f.name: [] for f in DRIFT_SCHEMA}
    for col, change, bef, aft in rows:
        out["column"].append(col)
        out["change"].append(change)
        out["before"].append(bef)
        out["after"].append(aft)
    return pa.Table.from_pydict(out, schema=DRIFT_SCHEMA)


def suggest_constraints_grouped(ds, group_col: str,
                                cols: Optional[Sequence[str]] = None,
                                domain_cap: int = 20) -> pa.Table:
    """Per-GROUP constraint suggestion — the rules each segment
    satisfies (a column complete in one lang and nullable in another is
    invisible to the global profile) -> PROFILE_SCHEMA plus a leading
    `grp` column, sorted by (grp, column).

    Scale shape: one streaming pass; each batch loops over ITS OWN
    distinct group values (bounded by per-batch group cardinality) and
    reuses the single-column partial kernels; the driver fold is
    O(batches x groups x cols x cap).  High-cardinality group columns
    belong on the bucketed exchange instead — this raises above
    `max_groups` distinct groups rather than melting the driver."""
    sch = ds.schema()
    if sch is None:
        raise ValueError("suggest_constraints_grouped: input dataset has "
                         "no schema")
    schema = sch.base_schema
    if group_col not in schema.names:
        raise ValueError(f"group column {group_col!r} not in "
                         f"{schema.names}")
    if cols is None:
        cols = [n for n in schema.names if n != group_col]
    missing = [n for n in cols if n not in schema.names]
    if missing:
        raise ValueError(f"columns {missing} not in the input schema")
    max_groups = 10_000
    stage = SuggestPartialStage(cols, domain_cap)

    gtype = schema.field(group_col).type

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        for g in pc.unique(batch[group_col]).to_pylist():
            if g is None:
                sub = batch.filter(pc.is_null(batch[group_col]))
            else:
                sub = batch.filter(pc.equal(batch[group_col], g))
            t = stage(sub)
            outs.append(t.append_column(
                "grp", pa.array([g] * t.num_rows, gtype)))
        if outs:
            return pa.concat_tables(outs)
        # empty batch: a ZERO-ROW, schema-correct table (stage() emits
        # one row per column even on zero rows, which a length-0 grp
        # column cannot attach to)
        return stage(batch).slice(0, 0).append_column(
            "grp", pa.array([], gtype))

    parts = []
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if {"grp", "column"} <= set(t.column_names) and t.num_rows:
            parts.append(t)
    merged: dict[tuple, dict] = {}
    for t in parts:
        for r in t.to_pylist():
            m = merged.setdefault((r["grp"], r["column"]),
                                  _fresh_acc(r["dtype"]))
            _fold_partial_row(m, r, domain_cap)
        if len({k[0] for k in merged}) > max_groups:
            raise ValueError(
                f"suggest_constraints_grouped: more than {max_groups} "
                f"distinct {group_col!r} groups — use the bucketed "
                f"exchange (high-cardinality grouping melts the driver "
                f"fold)")
    out = {"grp": []}
    out.update({f.name: [] for f in PROFILE_SCHEMA})
    for (grp, name), m in merged.items():
        out["grp"].append(grp)
        _emit_acc(out, name, m)
    fields = [pa.field("grp", gtype)] + list(PROFILE_SCHEMA)
    # typed sort (Arrow, nulls last) — a str(grp) sort key would order
    # int groups lexically and place a null group before the langs,
    # diverging from the oracle's ORDER BY grp
    return pa.Table.from_pydict(out, schema=pa.schema(fields)) \
        .sort_by([("grp", "ascending"), ("column", "ascending")])

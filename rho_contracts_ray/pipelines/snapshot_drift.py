"""Snapshot-to-snapshot distribution drift for the repo-files corpus.

The north-star pipeline (BASELINE.json) calls for "KS-style
distribution-drift checks on content-length and lang frequency between
snapshots" of the source-code table `(repo, path, commit, lang, content)`.
`sources/repo_files.py` already synthesises drift pairs (the `epoch`
parameter shifts the content-length log-mean and rolls the lang
frequencies); this module wires the comparison:

  * ONE streaming pass per snapshot reduces each batch to value-count
    partials for BOTH checked columns — `content_len` (utf8 length of
    content, nulls excluded) and `lang` — tagged with the snapshot side.
  * Both partial streams union and ride ONE bucketed exchange keyed on
    (kind, key); the driver receives only the reduced count table
    (rows = #distinct lengths + #distinct langs — bounded, tiny).
  * From exact integer counts the driver computes the EXACT two-sample
    KS statistic on content_len and the EXACT total-variation distance
    on lang — both bit-reproducible by a SQL oracle (window-function
    ECDFs / frequency tables), unlike a sketch.

Content length here is bounded (discrete ECDF over ≤ a few thousand
distinct values), which is exactly when the exact two-sample KS is the
right tool; for genuinely continuous columns at 100 TB use
`constraints.drift.numeric_drift`'s t-digest sketch instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tagged_partial(side: int):
    """Batch -> (kind, key, ca, cb) value-count partials for content_len
    and lang.  Nulls are excluded on both columns (SQL aggregate
    semantics); `key` is a string on both kinds so one exchange carries
    both families."""
    def fn(batch: pa.Table) -> pa.Table:
        parts = []
        ln = pc.utf8_length(batch["content"]).drop_null()
        if len(ln):
            g = pa.table({"v": pc.cast(ln, pa.int64())}) \
                .group_by("v").aggregate([([], "count_all")])
            parts.append(pa.table({
                "kind": pa.array(["len"] * g.num_rows),
                "key": pc.cast(g["v"], pa.string()),
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }))
        lg = batch["lang"].drop_null()
        if len(lg):
            g = pa.table({"v": lg}).group_by("v") \
                .aggregate([([], "count_all")])
            parts.append(pa.table({
                "kind": pa.array(["lang"] * g.num_rows),
                "key": pc.cast(g["v"], pa.string()),
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }))
        if not parts:
            return pa.table({"kind": pa.array([], pa.string()),
                             "key": pa.array([], pa.string()),
                             "ca": pa.array([], pa.int64()),
                             "cb": pa.array([], pa.int64())})
        t = pa.concat_tables(parts)
        zero = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({"kind": t["kind"], "key": t["key"],
                         "ca": t["cnt"] if side == 0 else zero,
                         "cb": zero if side == 0 else t["cnt"]})
    return fn


def drift_counts(ds_a, ds_b) -> pa.Table:
    """The distributed half: both snapshots reduce to (kind, key, ca, cb)
    through one bucketed exchange.  Returned table is tiny (bounded by
    the distinct value counts), sorted for determinism."""
    from ..stages.agg import bucketed_sum

    both = ds_a.map_batches(_tagged_partial(0), batch_format="pyarrow") \
        .union(ds_b.map_batches(_tagged_partial(1), batch_format="pyarrow"))
    agg = bucketed_sum(both, ["kind", "key"], ["ca", "cb"])
    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in agg.iter_batches(batch_size=None,
                                       batch_format="pyarrow")]
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return pa.table({"kind": pa.array([], pa.string()),
                         "key": pa.array([], pa.string()),
                         "ca": pa.array([], pa.int64()),
                         "cb": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    return t.take(pc.sort_indices(
        t, sort_keys=[("kind", "ascending"), ("key", "ascending")]))


def _exact_ks_from_counts(keys: np.ndarray, ca: np.ndarray,
                          cb: np.ndarray) -> float:
    """sup |ECDF_a - ECDF_b| from per-value exact counts (numeric keys)."""
    o = np.argsort(keys, kind="stable")
    ca, cb = ca[o].astype(np.int64), cb[o].astype(np.int64)
    na, nb = int(ca.sum()), int(cb.sum())
    if na == 0 or nb == 0:
        return 0.0
    return float(np.abs(np.cumsum(ca) / na - np.cumsum(cb) / nb).max())


def repo_files_drift(path_a, path_b, *, ks_threshold: float = 0.1,
                     tv_threshold: float = 0.05) -> pa.Table:
    """Drift report between two repo-files snapshots (parquet paths or
    directories).  One row per check:

        column       kind            statistic  threshold  drifted  n_a  n_b
        content_len  numeric-ks      ...        0.1        bool     ...
        lang         categorical-tv  ...        0.05       bool     ...

    Statistics are exact (integer count arithmetic); a DuckDB oracle with
    window-function ECDFs reproduces them bit-for-bit
    (tests/test_snapshot_drift.py)."""
    import ray.data as rd

    ds_a = rd.read_parquet(path_a, columns=["lang", "content"])
    ds_b = rd.read_parquet(path_b, columns=["lang", "content"])
    t = drift_counts(ds_a, ds_b)

    kind = np.asarray(t["kind"].to_pylist(), dtype=object)
    key = np.asarray(t["key"].to_pylist(), dtype=object)
    ca = t["ca"].to_numpy(zero_copy_only=False)
    cb = t["cb"].to_numpy(zero_copy_only=False)

    lm = kind == "len"
    ks = _exact_ks_from_counts(key[lm].astype(np.int64), ca[lm], cb[lm])

    gm = kind == "lang"
    ga, gb = ca[gm].astype(np.float64), cb[gm].astype(np.float64)
    na_l, nb_l = ga.sum(), gb.sum()
    tv = (0.5 * np.abs(ga / na_l - gb / nb_l).sum()
          if na_l and nb_l else 0.0)

    return pa.table({
        "column": pa.array(["content_len", "lang"]),
        "kind": pa.array(["numeric-ks", "categorical-tv"]),
        "statistic": pa.array([float(ks), float(tv)], pa.float64()),
        "threshold": pa.array([ks_threshold, tv_threshold], pa.float64()),
        "drifted": pa.array([ks > ks_threshold, tv > tv_threshold]),
        "n_a": pa.array([int(ca[lm].sum()), int(na_l)], pa.int64()),
        "n_b": pa.array([int(cb[lm].sum()), int(nb_l)], pa.int64()),
    })

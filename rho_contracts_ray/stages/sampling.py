"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be (a) a pure per-row predicate — no global state,
no shuffle, resumable across retries — and (b) exactly reproducible.  Both
operators therefore decide membership from a multiplicative hash of the id
column (Knuth's 2654435761 mod 2^32), which is also expressible in ANSI
SQL, so the driver's DuckDB oracle can verify the sample EXACTLY:

    (id * 2654435761) % 4294967296 < threshold       -- threshold/2^32 = rate
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.int64(2654435761)
_MOD = np.int64(1 << 32)
# ids above this overflow id * 2654435761 past int64 in the SQL oracle;
# negative ids flip the sign of `%` in SQL vs numpy.  The exact-SQL-parity
# claim therefore only holds for 0 <= id <= _MAX_ID: out-of-range ids
# still sample deterministically (uint64 wraparound) but a ONE-TIME
# warning flags that the documented SQL predicate no longer reproduces
# the membership.
_MAX_ID = (2**63 - 1) // 2654435761


def sample_threshold(rate: float) -> int:
    """Integer threshold for a target rate (floor, so engine and SQL agree
    bit-for-bit)."""
    return int(rate * (1 << 32))


def _validate_ids(ids: np.ndarray) -> np.ndarray:
    """int64 view + a ONE-TIME warning when ids leave the SQL-parity range.
    Sampling stays deterministic for ANY int64 id (uint64 wraparound), but
    the documented SQL oracle predicate only reproduces it for
    0 <= id <= _MAX_ID — never crash a long job, just say so."""
    import warnings

    ids = ids.astype(np.int64)
    if ids.size and (int(ids.min()) < 0 or int(ids.max()) > _MAX_ID):
        warnings.warn(
            f"hash sampling ids outside [0, {_MAX_ID}]: membership is "
            f"still deterministic (uint64 wraparound) but the SQL oracle "
            f"predicate no longer reproduces it — remap ids for SQL "
            f"parity", stacklevel=3)
    return ids


def _ids_from_arrow(ids_col) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """int64 ids + validity mask (None when null-free).  Null ids are
    EXCLUDED from every sample — matching the SQL oracle, where
    `NULL * k % m < t` is NULL and filters the row out.  (Previously
    int64-with-nulls converted via float64 NaN, and astype(int64) turned
    NaN into INT64_MIN: platform-defined membership diverging silently
    from the oracle — ADVICE r2.)"""
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    if ids_col.null_count:
        valid = pc.is_valid(ids_col).to_numpy(zero_copy_only=False)
        ids = pc.fill_null(ids_col, 0).to_numpy(zero_copy_only=False)
        return ids.astype(np.int64), valid
    return ids_col.to_numpy(zero_copy_only=False).astype(np.int64), None


def _hash_mask(ids: np.ndarray, threshold: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        prod = _validate_ids(ids).view(np.uint64) * np.uint64(2654435761)
    return (prod % np.uint64(1 << 32)) < np.uint64(threshold)


def hash_sample(ds, id_col: str, rate: Optional[float] = None,
                threshold: Optional[int] = None):
    """Keep rows where hash(id) falls under the threshold — a streaming
    filter, deterministic across runs/partitionings/cluster sizes."""
    if threshold is None:
        if rate is None:
            raise ValueError("pass rate or threshold")
        threshold = sample_threshold(rate)

    def fil(batch: pa.Table) -> pa.Table:
        ids_np, valid = _ids_from_arrow(batch[id_col])
        m = _hash_mask(ids_np, threshold)
        if valid is not None:
            m &= valid
        return batch.filter(pa.array(m))

    return ds.map_batches(fil, batch_format="pyarrow")


def _per_stratum_filter(ds, id_col: str, stratum_col: str,
                        thresholds: Mapping, default_threshold: int = 0):
    """Shared per-stratum hash predicate (stratified_sample AND
    mix_sources ride it — ONE copy of the SQL-parity arithmetic): the
    stratum value selects a threshold (vectorized index_in lookup; a
    stratum outside the map — and a null stratum — gets
    `default_threshold`), membership is hash32(id) < threshold."""
    src_arr = pa.array(list(thresholds.keys()))
    thr_arr = np.fromiter((int(v) for v in thresholds.values()),
                          np.uint64, len(thresholds))
    dflt = np.uint64(default_threshold)

    def fil(batch: pa.Table) -> pa.Table:
        ids_raw, valid = _ids_from_arrow(batch[id_col])
        ids_np = _validate_ids(ids_raw)
        strata = batch[stratum_col]
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        if thr_arr.size:
            idx = pc.index_in(strata, value_set=src_arr) \
                .to_numpy(zero_copy_only=False)
            miss = np.isnan(idx) if idx.dtype.kind == "f" else (idx < 0)
            pos = np.where(miss, 0, idx).astype(np.int64)
            thr = np.where(miss, dflt, thr_arr[pos])
        else:
            thr = np.full(batch.num_rows, dflt, np.uint64)
        with np.errstate(over="ignore"):
            prod = ids_np.view(np.uint64) * np.uint64(2654435761)
        m = (prod % np.uint64(1 << 32)) < thr
        if valid is not None:
            m &= valid
        return batch.filter(pa.array(m))

    return ds.map_batches(fil, batch_format="pyarrow")


def stratified_sample(ds, id_col: str, stratum_col: str,
                      rates: Mapping[str, float],
                      default_rate: float = 0.0):
    """Per-stratum hash sampling: each stratum value gets its own rate
    (e.g. downsample boilerplate languages, keep all rare ones).  Still a
    pure per-row predicate — the stratum only selects the threshold."""
    thresholds = {k: sample_threshold(v) for k, v in rates.items()}
    return _per_stratum_filter(ds, id_col, stratum_col, thresholds,
                               sample_threshold(default_rate))


def split_train_holdout(ds, id_col: str, holdout_rate: float = 0.01):
    """(train_ds, holdout_ds) by the same hash — disjoint, exhaustive over
    non-null ids (null-id rows land in neither half, like the SQL
    predicate), stable across reruns (the property that matters for
    decontamination)."""
    threshold = sample_threshold(holdout_rate)

    def keep(hold: bool):
        def fil(batch: pa.Table) -> pa.Table:
            ids_np, valid = _ids_from_arrow(batch[id_col])
            m = _hash_mask(ids_np, threshold)
            m = m if hold else ~m
            if valid is not None:
                # null ids belong to NEITHER half (SQL predicate semantics)
                m &= valid
            return batch.filter(pa.array(m))

        return fil

    return (ds.map_batches(keep(False), batch_format="pyarrow"),
            ds.map_batches(keep(True), batch_format="pyarrow"))


def weighted_sample(ds, id_col: str, weight_col: str, base_rate: float):
    """Weight-proportional deterministic sampling: keep a row iff
    hash32(id) < base_rate * weight * 2^32 — inclusion probability is
    base_rate x weight (clamped to 1), stable across runs, partitionings
    and cluster sizes, with zero shuffle or state.  Rows with null /
    non-positive weights never survive; null ids are dropped (matching
    the hash_sample convention).  The predicate is the multiplicative
    hash the SQL oracle reproduces verbatim:
    (id * 2654435761) % 2^32 < round(base_rate * weight * 2^32)."""
    if not (0.0 <= base_rate):
        raise ValueError("weighted_sample: base_rate must be >= 0")

    def fil(batch: pa.Table) -> pa.Table:
        ids_raw, valid = _ids_from_arrow(batch[id_col])
        ids_np = _validate_ids(ids_raw)
        w = pc.cast(pc.fill_null(batch[weight_col], 0.0), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        thr = np.rint(np.clip(base_rate * w, 0.0, 1.0) * float(1 << 32)) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            prod = ids_np.view(np.uint64) * np.uint64(2654435761)
        m = (prod % np.uint64(1 << 32)) < thr
        if valid is not None:
            m &= valid
        return batch.filter(pa.array(m))

    return ds.map_batches(fil, batch_format="pyarrow")


def mix_sources(ds, id_col: str, source_col: str,
                target_shares: Mapping[str, float], target_rows: int):
    """Deterministic mixture resampling: downsample each source to
    approximately `target_shares[source] * target_rows` rows, i.e. build
    a corpus of ~target_rows rows with the requested source mixture
    (the "data mixing" step of a training-data pipeline — e.g. 50% web,
    30% books, 20% code — applied to whatever the raw corpus actually
    contains).

    One tiny counting pass first: per-batch (source, count) partials
    fold on the driver to the EXACT per-source totals (cardinality-
    sized, no shuffle of rows), giving each source the keep rate
    min(1, share * target_rows / count).  Membership is then the same
    pure per-row multiplicative-hash predicate as `hash_sample` with a
    per-source threshold — stable across runs, partitionings and
    cluster sizes, resumable, and reproducible verbatim in SQL:

        (id * 2654435761) % 2^32 < floor(min(1, share*T/cnt) * 2^32)

    Sources missing from `target_shares` (and null sources / null ids)
    are dropped.  A source with fewer rows than its quota keeps all its
    rows (rate clamps at 1) — the mixture then undershoots rather than
    inventing rows; callers wanting upsampling must repeat rows
    explicitly."""
    if target_rows < 0:
        raise ValueError("mix_sources: target_rows must be >= 0")
    for s, v in target_shares.items():
        if v < 0:
            raise ValueError(f"mix_sources: negative share for {s!r}")

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([source_col]).group_by([source_col]) \
            .aggregate([([], "count_all")])
        return g.rename_columns([source_col, "c"])

    counts: dict = {}
    for b in ds.map_batches(count_partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for s, c in zip(t[source_col].to_pylist(), t["c"].to_pylist()):
            if s is not None:
                counts[s] = counts.get(s, 0) + int(c)

    # float64 arithmetic in the exact order the SQL oracle writes it:
    # share * target_rows / count, clamped, floored at 2^32
    thresholds = {}
    for s, share in target_shares.items():
        c = counts.get(s, 0)
        if c > 0:
            rate = min(1.0, share * float(target_rows) / float(c))
            thresholds[s] = sample_threshold(rate)
    return _per_stratum_filter(ds, id_col, source_col, thresholds)

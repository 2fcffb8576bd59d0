"""Exact duplicate-substring-span removal (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022 — the ExactSubstr
variant, re-expressed for word-token granularity on Ray Data).

Doc-level dedup keeps one copy of near-identical DOCUMENTS; this operator
removes repeated SPANS — every window of `n` consecutive tokens whose
exact sequence occurs >= min_count times anywhere in the corpus (including
within one document) is deleted from every occurrence, and the surviving
tokens are re-joined.  Boilerplate headers, license blocks and templated
paragraphs disappear even when the surrounding documents are unique.

Scale shape (two streaming passes, one exchange):
  pass 1  per batch: vectorized n-gram construction (text.gram_arrays,
          all Arrow C++ kernels) -> two independent 64-bit hash families
          per gram -> per-batch (h1, h2, cnt) combine.  Only one row per
          distinct gram per batch enters the bucketed exchange; gram
          STRINGS never leave the task.
  reduce  bucketed_sum on (h1, h2); grams with total cnt >= min_count
          form the dup set — distinct-repeated-grams only, gathered and
          broadcast once (ray.put) exactly like the decontamination
          holdout set.  128 bits/gram: ~1 GB per 6e7 distinct duplicated
          grams.  If a corpus ever exceeds broadcastable size, the
          membership test becomes a second bucketed join keyed on
          (h1, h2) — same pass-2 kernel, not implemented until needed.
  pass 2  per batch: recompute window hashes, binary-search the sorted
          dup set (structured-dtype searchsorted, one shot for the whole
          batch), mark covered tokens with a difference array + cumsum,
          rebuild texts with ListArray.from_arrays + binary_join.  No
          Python loop over docs, tokens or grams anywhere.

Two independent hash families make a false positive require a
simultaneous 128-bit collision (~impossible below 2^64 grams); the
bit-exact DuckDB oracle in tests/test_substring.py and __ray_entry__
(`dedup_spans_documents`) compares against true string equality.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64
from .text import gram_arrays

_PAIR_DT = np.dtype([("a", np.uint64), ("b", np.uint64)])

_EMPTY_SPANS_PARTIAL = pa.table({
    "h1": pa.array([], pa.uint64()),
    "h2": pa.array([], pa.uint64()),
    "cnt": pa.array([], pa.int64()),
})


def _gram_hash_partial(col, n: int, sep: str) -> pa.Table:
    """Batch -> (h1, h2, cnt) combine over its gram occurrences."""
    grams, _ = gram_arrays(col, n, sep)
    if len(grams) == 0:
        return _EMPTY_SPANS_PARTIAL
    t = pa.table({"h1": pa.array(stable_hash64(grams, seed=101)),
                  "h2": pa.array(stable_hash64(grams, seed=202))})
    g = t.group_by(["h1", "h2"]).aggregate([([], "count_all")])
    return pa.table({"h1": g["h1"], "h2": g["h2"],
                     "cnt": pc.cast(g["count_all"], pa.int64())})


def _dup_set_from_counts(t: pa.Table, min_count: int) -> np.ndarray:
    keep = pc.greater_equal(t["cnt"], min_count)
    t = t.filter(keep)
    out = np.empty(t.num_rows, _PAIR_DT)
    out["a"] = t["h1"].to_numpy(zero_copy_only=False)
    out["b"] = t["h2"].to_numpy(zero_copy_only=False)
    out.sort()
    return out


def _mark_batch(batch: pa.Table, dup: np.ndarray, text_col: str,
                id_col: str, n: int, sep: str) -> pa.Table:
    """Drop every token covered by a duplicated window; rebuild texts."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(pc.fill_null(col, ""), sep)
    offs = toks.offsets.to_numpy()
    vals = toks.values
    n_tok = int(offs[-1]) if len(offs) else 0
    covered = np.zeros(n_tok, bool)

    if dup.size:
        # reuse the batch's tokenization (split_pattern above) instead
        # of re-splitting inside gram_arrays — pass 2 is the hot path
        grams, doc_idx, pos = gram_arrays(col, n, sep, with_pos=True,
                                          toks=toks)
        if len(grams):
            q = np.empty(len(grams), _PAIR_DT)
            q["a"] = stable_hash64(grams, seed=101)
            q["b"] = stable_hash64(grams, seed=202)
            idx = np.clip(np.searchsorted(dup, q), 0, dup.size - 1)
            hit = dup[idx] == q
            if hit.any():
                starts = offs[:-1][doc_idx[hit]] + pos[hit]
                diff = np.zeros(n_tok + n + 1, np.int64)
                np.add.at(diff, starts, 1)
                np.add.at(diff, starts + n, -1)
                covered = np.cumsum(diff[:n_tok]) > 0

    keep = pa.array(~covered)
    kept_vals = vals.filter(keep)
    cs = np.concatenate(([0], np.cumsum(covered, dtype=np.int64)))
    cov_per_doc = cs[offs[1:]] - cs[offs[:-1]]
    tok_per_doc = np.diff(offs)
    kept_per_doc = tok_per_doc - cov_per_doc
    new_offs = np.concatenate(([0], np.cumsum(kept_per_doc)))
    lst = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept_vals)
    return pa.table({
        id_col: batch[id_col],
        text_col: pc.binary_join(lst, sep),
        "n_kept": pa.array(kept_per_doc, pa.int64()),
        "n_dropped": pa.array(cov_per_doc, pa.int64()),
    })


def remove_dup_spans(ds_or_table, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 5,
                     min_count: int = 2, sep: str = " ",
                     n_buckets: Optional[int] = None):
    """Corpus-internal exact substring dedup: delete every token covered
    by some n-token window whose exact sequence occurs >= min_count times
    across the corpus.  -> (id_col, text_col rebuilt, n_kept, n_dropped),
    one output row per input row (a fully-duplicated doc keeps its row
    with text='').  Docs with < n tokens are never touched.

    Tokenization is split(sep) with empties kept and null -> '' — the
    exact semantics of the DuckDB string_split oracle."""
    if isinstance(ds_or_table, pa.Table):
        t = ds_or_table
        counts = _gram_hash_partial(t[text_col], n, sep)
        dup = _dup_set_from_counts(counts, min_count)
        return _mark_batch(t, dup, text_col, id_col, n, sep)

    import ray

    from .agg import bucketed_sum

    ds = ds_or_table
    partial = ds.map_batches(
        lambda b: _gram_hash_partial(b[text_col], n, sep),
        batch_format="pyarrow")
    agg = bucketed_sum(partial, ["h1", "h2"], ["cnt"], n_buckets=n_buckets)
    # apply the min_count filter INSIDE the reduce output, before the
    # driver gather: the distinct-gram table is ~one row per corpus
    # token (singleton majority) — only the duplicated grams may land on
    # the driver, as the module docstring promises
    agg = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)),
        batch_format="pyarrow")
    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in agg.iter_batches(batch_size=None,
                                       batch_format="pyarrow")]
    parts = [p for p in parts
             if {"h1", "h2", "cnt"} <= set(p.column_names) and p.num_rows]
    counts = (pa.concat_tables(parts) if parts else _EMPTY_SPANS_PARTIAL)
    dup = _dup_set_from_counts(counts, min_count)
    dup_ref = ray.put(dup)

    def mark(batch: pa.Table) -> pa.Table:
        return _mark_batch(batch, ray.get(dup_ref), text_col, id_col,
                           n, sep)

    return ds.map_batches(mark, batch_format="pyarrow")

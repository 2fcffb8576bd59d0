"""Sequence packing — grouping documents into fixed-token-budget training
sequences (the step between dedup/filter and the trainer's data loader).

Scale shape: packing is greedy WITHIN each batch (first-fit over a
token-sorted batch) — a per-partition operation with NO shuffle; bins
never span batches, so the operator streams and resumes like any map.
Cross-batch packing would need a global sort for marginal fill gains; the
local form loses only the final partial bin per batch (fill ratios >0.9
at realistic batch sizes).  Deterministic: same input rows -> same bins.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pack_batch(ids: np.ndarray, tokens: np.ndarray, capacity: int):
    """First-fit-decreasing over one batch: (bins, oversized) where bins
    hold row indexes and oversized lists rows whose token count exceeds
    the capacity (surfaced, never silently dropped — the no-silent-caps
    rule)."""
    order = np.lexsort((ids, -tokens))  # big docs first; ties by id
    bins: list[list[int]] = []
    oversized: list[int] = []
    remaining = np.empty(len(order), np.int64)  # capacity slack per bin
    n_bins = 0
    for idx in order:
        t = int(tokens[idx])
        if t > capacity:
            oversized.append(int(idx))  # chunk_documents is the fix
            continue
        fits = remaining[:n_bins] >= t  # vectorized first-fit probe
        if fits.any():
            b = int(np.argmax(fits))
            bins[b].append(int(idx))
            remaining[b] -= t
        else:
            bins.append([int(idx)])
            remaining[n_bins] = capacity - t
            n_bins += 1
    return bins, oversized


def pack_sequences(ds, capacity: int, id_col: str = "doc_id",
                   tokens_col: Optional[str] = None,
                   text_col: str = "text",
                   batch_size: Optional[int] = 4096):
    """-> Dataset[first_doc_id, bin_idx, doc_ids(list<int64>), n_docs,
    total_tokens, fill_ratio, oversized].  tokens_col overrides the default
    whitespace token count of text_col.  (first_doc_id, bin_idx) is the
    globally unique, deterministic sequence key — two columns rather than a
    bit-packed int64, which overflowed for doc_id >= 2^43 and misbehaved
    for negative ids (ADVICE r2); any int64 id is valid.  Oversized rows
    (token count > capacity) carry bin_idx = -1 and oversized = True."""

    def pack(batch: pa.Table) -> pa.Table:
        ids_arr = batch[id_col]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        ids = ids_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        if tokens_col is not None:
            toks = batch[tokens_col]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            if toks.null_count:
                # a null count would cast to int64 MIN and silently
                # corrupt bin accounting — fail loudly (module rule:
                # surfaced, never silently dropped)
                raise ValueError(
                    f"pack_sequences: {toks.null_count} null values in "
                    f"tokens_col {tokens_col!r}")
            tokens = toks.to_numpy(zero_copy_only=False).astype(np.int64)
            if tokens.size and tokens.min() < 0:
                raise ValueError(
                    f"pack_sequences: negative token count in "
                    f"{tokens_col!r}")
        else:
            col = batch[text_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # whitespace token count, vectorized (runs + 1)
            tokens = pc.count_substring_regex(
                pc.fill_null(col, ""), r"\S+") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        bins, oversized = _pack_batch(ids, tokens, capacity)
        out_first, out_bin, out_ids, out_n, out_tok, out_over = \
            [], [], [], [], [], []
        for b, members in enumerate(bins):
            members_ids = sorted(int(ids[i]) for i in members)
            total = int(tokens[members].sum()) if members else 0
            out_first.append(members_ids[0])
            out_bin.append(b)
            out_ids.append(members_ids)
            out_n.append(len(members))
            out_tok.append(total)
            out_over.append(False)
        # over-capacity docs surface as their own flagged rows (route them
        # through chunk_documents) instead of silently vanishing
        for i in oversized:
            out_first.append(int(ids[i]))
            out_bin.append(-1)
            out_ids.append([int(ids[i])])
            out_n.append(1)
            out_tok.append(int(tokens[i]))
            out_over.append(True)
        return pa.table({
            "first_doc_id": pa.array(out_first, pa.int64()),
            "bin_idx": pa.array(out_bin, pa.int64()),
            "doc_ids": pa.array(out_ids, pa.list_(pa.int64())),
            "n_docs": pa.array(out_n, pa.int64()),
            "total_tokens": pa.array(out_tok, pa.int64()),
            "fill_ratio": pa.array(
                [t / capacity for t in out_tok], pa.float64()),
            "oversized": pa.array(out_over, pa.bool_()),
        })

    # explicit batch_size pins bin boundaries: output is identical across
    # cluster sizes and read parallelism, not just within one session
    return ds.map_batches(pack, batch_format="pyarrow",
                          batch_size=batch_size)


def chunk_documents(ds, max_tokens: int, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text",
                    sep: str = " "):
    """Split long documents into overlapping token windows ->
    Dataset[doc_id, chunk_id, chunk_text, n_tokens] — the step before
    pack_sequences for documents over the budget.

    Chunk k covers tokens [k*stride, k*stride + max_tokens) with
    stride = max_tokens - overlap; the chunk count is
    ceil(max(n_tokens - overlap, 1) / stride).  Tokenization is exactly
    `split(sep)` (empties kept), so a SQL oracle reproduces every chunk
    string bit-for-bit (array_slice + array_to_string).  A pure per-row
    flat-map: streams, no shuffle, deterministic."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids_arr = batch[id_col]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        out_id, out_chunk, out_text, out_n = [], [], [], []
        for did, s in zip(ids_arr.to_pylist(),
                          pc.fill_null(col, "").to_pylist()):
            toks = s.split(sep)
            n = len(toks)
            n_chunks = (max(n - overlap, 1) + stride - 1) // stride
            for k in range(n_chunks):
                piece = toks[k * stride: k * stride + max_tokens]
                out_id.append(did)
                out_chunk.append(k)
                out_text.append(sep.join(piece))
                out_n.append(len(piece))
        return pa.table({
            # native id type (string doc ids are legal)
            id_col: pa.array(out_id, ids_arr.type),
            "chunk_id": pa.array(out_chunk, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")

"""Content-defined chunking (CDC) and chunk-level dedup.

Fixed-size chunking breaks on insertion: add one byte at the front and
every downstream chunk hash changes.  Content-defined boundaries (the
gear-hash family behind storage dedup — LBFS, FastCDC) cut where a
rolling hash of the last 64 bytes hits a mask, so identical content
embedded at DIFFERENT offsets in different documents still yields
identical chunks — the property that makes corpus-wide chunk dedup
work.

The gear hash h_i = sum_{k=0}^{63} G[b_{i-k}] << k is a 64-step shifted
sum, so it vectorizes over a whole batch's concatenated bytes as 64
numpy shift-adds — no per-byte Python loop; document boundaries mask
out cross-document windows.  Boundary rule: h & mask == 0 with the
window fully inside the document (positions < 64 from the start can't
cut, matching the reference implementation below bit-for-bit).

`chunk_dedup` then hashes each chunk (md5 — collision-safe at corpus
scale) and routes (hash, doc_id, length) rows through one bucketed
exchange to count duplicates; payloads never move.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_WINDOW = 64


def _gear_table(seed: int = 7) -> np.ndarray:
    """Deterministic 256-entry uint64 gear table (splitmix64 stream)."""
    x = np.uint64(seed)
    out = np.empty(256, np.uint64)
    v = int(x)
    for i in range(256):
        v = (v + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = v
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out[i] = z ^ (z >> 31)
    return out


_GEAR = _gear_table()


def gear_boundaries(data: np.ndarray, doc_starts: np.ndarray,
                    mask: int) -> np.ndarray:
    """Boundary positions (cut AFTER index i) over concatenated document
    bytes.  `doc_starts` are the start offsets of each document in
    `data`; windows never span documents and the first WINDOW-1 bytes
    of a document cannot cut."""
    n = data.size
    if n == 0:
        return np.zeros(0, np.int64)
    g = _GEAR[data]
    h = np.zeros(n, np.uint64)
    for k in range(_WINDOW):
        h[k:] += g[: n - k] << np.uint64(k)
    hits = (h & np.uint64(mask)) == 0
    # position i may cut only if its 64-byte window lies inside i's doc:
    # i - doc_start >= WINDOW - 1
    doc_of = np.searchsorted(doc_starts, np.arange(n), side="right") - 1
    ok = (np.arange(n) - doc_starts[doc_of]) >= (_WINDOW - 1)
    return np.flatnonzero(hits & ok).astype(np.int64)


def _chunks_of(buf: bytes, mask: int) -> list:
    """Single-document chunk list [(offset, length, md5hex)]."""
    data = np.frombuffer(buf, np.uint8)
    cuts = gear_boundaries(data, np.array([0], np.int64), mask)
    bounds = [0] + [int(c) + 1 for c in cuts]
    if not buf:
        return []
    if bounds[-1] != len(buf):
        bounds.append(len(buf))
    out = []
    for s, e in zip(bounds, bounds[1:]):
        out.append((s, e - s, hashlib.md5(buf[s:e]).hexdigest()))
    return out


def cdc_chunks(ds, text_col: str = "text", id_col: str = "doc_id",
               mask: int = 0x1FF):
    """Chunk every document at content-defined boundaries ->
    Dataset[doc_id, chunk_ix, offset, length, chunk_hash].  mask=0x1FF
    targets ~512 B average chunks.  One streaming pass: the gear hash
    runs vectorized over each batch's concatenated bytes."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        ids_type = batch[id_col].type   # native id type (str ids legal)
        bufs = [(t or "").encode("utf-8") for t in texts]
        lens = np.array([len(b) for b in bufs], np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        data = np.frombuffer(b"".join(bufs), np.uint8)
        cuts = gear_boundaries(data, starts, mask)
        out_id, out_ix, out_off, out_len, out_h = [], [], [], [], []
        cut_doc = np.searchsorted(starts, cuts, side="right") - 1
        per_doc: dict = {}
        for c, d in zip(cuts.tolist(), cut_doc.tolist()):
            per_doc.setdefault(d, []).append(c - int(starts[d]) + 1)
        for i, buf in enumerate(bufs):
            if not buf:
                continue
            bounds = [0] + per_doc.get(i, [])
            if bounds[-1] != len(buf):
                bounds.append(len(buf))
            for ix, (s, e) in enumerate(zip(bounds, bounds[1:])):
                out_id.append(ids[i])
                out_ix.append(ix)
                out_off.append(s)
                out_len.append(e - s)
                out_h.append(hashlib.md5(buf[s:e]).hexdigest())
        return pa.table({
            # native id type (string doc ids are legal)
            id_col: pa.array(out_id, ids_type),
            "chunk_ix": pa.array(out_ix, pa.int64()),
            "offset": pa.array(out_off, pa.int64()),
            "length": pa.array(out_len, pa.int64()),
            "chunk_hash": pa.array(out_h, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_dedup_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                      mask: int = 0x1FF, n_buckets=None):
    """Corpus-wide duplicate-chunk analysis -> Dataset[chunk_hash,
    n_copies, n_docs, length] of chunks appearing more than once, plus
    the dedup opportunity those rows imply.  Chunk payloads never move:
    only (hash, doc, length) rows cross the exchange."""
    from .agg import bucketed_apply

    chunks = cdc_chunks(ds, text_col, id_col, mask)

    def per_hash(t: pa.Table) -> pa.Table:
        g = t.group_by(["chunk_hash"]).aggregate(
            [([], "count_all"), (id_col, "count_distinct"),
             ("length", "min")])
        g = g.rename_columns(["chunk_hash", "n_copies", "n_docs",
                              "length"])
        import pyarrow.compute as pc

        return g.filter(pc.greater(g["n_copies"], 1))

    empty = pa.table({"chunk_hash": pa.array([], pa.string()),
                      "n_copies": pa.array([], pa.int64()),
                      "n_docs": pa.array([], pa.int64()),
                      "length": pa.array([], pa.int64())})
    return bucketed_apply(chunks, ["chunk_hash"], per_hash, empty,
                          n_buckets=n_buckets)

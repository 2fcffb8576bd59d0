"""Levenshtein fuzzy-duplicate pairs with (lang, byte-length-block)
candidate blocking — exact edit-distance dedup, DuckDB-oracle-able.

Semantics (mirrored bit-for-bit by the SQL oracle): a pair with
``a.doc_id < b.doc_id`` is emitted iff

* ``a.lang = b.lang`` (nulls drop out, as in a SQL equi-join),
* ``abs(strlen(a.text)//block - strlen(b.text)//block) <= 1``, and
* ``levenshtein(a.text, b.text) <= k``

where the distance runs over UTF-8 **bytes** — DuckDB's ``levenshtein``
is byte-based (``levenshtein('é','e') = 2``) while its ``length()``
counts characters, so byte semantics (``strlen``) are used consistently
on both sides.

Scale shape (matters at 100 TB): every doc is emitted into TWO meeting
blocks (its own byte-length block ``b`` and ``b+1``); a qualifying pair
whose blocks differ by <=1 meets in block ``max(b_a, b_b)`` EXACTLY
once, so no pair-dedup pass is needed.  Rows route through the bucketed
exchange on ``hash(lang, meeting_block)`` (stages/distagg.py), so no
all-pairs step ever crosses (lang, block) groups and the pair set never
lands on the driver.  Inside a group, candidates are pruned with the
byte-bag lower bound (``bag(a,b) <= lev(a,b)``) before the O(m*n) DP —
on the synthetic corpus this kills >99% of candidates — and the DP
itself is the vectorized two-row form with per-row early abandon.

Reference scope note: rho-contracts has no similarity operator; this is
part of the beyond-reference LLM-pipeline surface (exact fuzzy dedup
next to the approximate minhash/simhash paths in stages/dedup.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def levenshtein_bytes(a: bytes, b: bytes, k: Optional[int] = None) -> int:
    """Exact Levenshtein distance over byte strings, vectorized across
    the DP row (the insertion chain ``cur[j]=min(cand[j], cur[j-1]+1)``
    unrolls to ``j + min_{l<=j}(d[l]-l)`` — one ``minimum.accumulate``).
    With ``k`` set, abandons early and returns ``k+1`` once every cell
    of a row exceeds ``k``."""
    if len(a) > len(b):
        a, b = b, a
    m, n = len(a), len(b)
    if m == 0:
        return n if k is None or n <= k else k + 1
    av = np.frombuffer(a, np.uint8)
    bv = np.frombuffer(b, np.uint8)
    prev = np.arange(n + 1, dtype=np.int32)
    idx = np.arange(n + 1, dtype=np.int32)
    d = np.empty(n + 1, np.int32)
    for i in range(1, m + 1):
        d[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (bv != av[i - 1]), out=d[1:])
        cur = np.minimum.accumulate(d - idx) + idx
        if k is not None and cur.min() > k:
            return k + 1
        prev, d = cur, prev
    return int(prev[-1])


def _byte_hist(enc: list[bytes]) -> np.ndarray:
    """(n_docs, 256) int32 byte histograms."""
    H = np.zeros((len(enc), 256), np.int32)
    for i, e in enumerate(enc):
        if e:
            H[i] = np.bincount(np.frombuffer(e, np.uint8), minlength=256)
    return H


def _gram_sets(enc: list[bytes], idx: np.ndarray) -> list:
    """Per-doc (sorted unique 4-grams, counts) for enc[i], i in idx
    (None elsewhere) — grams packed as uint32 from 4 consecutive bytes
    (exact, no hash-binning)."""
    out: list = [None] * len(enc)
    for i in idx:
        e = enc[i]
        if len(e) >= 4:
            v = np.frombuffer(e, np.uint8).astype(np.uint32)
            grams = (v[:-3] << np.uint32(24)) | (v[1:-2] << np.uint32(16)) \
                | (v[2:-1] << np.uint32(8)) | v[3:]
            out[i] = np.unique(grams, return_counts=True)
        else:
            out[i] = (np.empty(0, np.uint32), np.empty(0, np.int64))
    return out


def _gram_bag(ga, gb) -> int:
    """Exact 4-gram multiset bag distance max(|A\\B|, |B\\A|) from the
    per-doc (unique, counts) pairs."""
    va, ca = ga
    vb, cb = gb
    _, ia, ib = np.intersect1d(va, vb, assume_unique=True,
                               return_indices=True)
    inter = int(np.minimum(ca[ia], cb[ib]).sum())
    return max(int(ca.sum()) - inter, int(cb.sum()) - inter)


def _expand_factory(id_col: str, text_col: str, lang_col: str, block: int):
    def expand(t: pa.Table) -> pa.Table:
        if not pa.types.is_integer(t[id_col].type):
            # the pair exchange hashes fixed-width ids (the family-wide
            # contract of every pair operator here); silently parsing a
            # string id would collapse '007' with '7'
            raise ValueError(
                f"fuzzy_dup_pairs: id column {id_col!r} must be integer "
                f"(got {t[id_col].type}); map string ids to int64 first")
        keep = pc.and_(pc.is_valid(t[text_col]), pc.is_valid(t[lang_col]))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             text_col: pa.array([], pa.string()),
                             lang_col: pa.array([], pa.string()),
                             "b_orig": pa.array([], pa.int32()),
                             "meet": pa.array([], pa.int32()),
                             "kh": pa.array([], pa.int64())})
        blen = pc.binary_length(t[text_col]).to_numpy() \
            .astype(np.int64, copy=False)
        b = (blen // block).astype(np.int32)
        lh = stable_hash64(t[lang_col].combine_chunks()
                           if isinstance(t[lang_col], pa.ChunkedArray)
                           else t[lang_col])
        base = pa.table({id_col: t[id_col], text_col: t[text_col],
                         lang_col: t[lang_col]})
        parts = []
        for off in (0, 1):
            meet = b + off
            kh = (lh ^ ((meet.astype(np.uint64) + np.uint64(1)) * _MIX)) \
                .view(np.int64)
            parts.append(base.append_column(
                "b_orig", pa.array(b, pa.int32())).append_column(
                "meet", pa.array(meet, pa.int32())).append_column(
                "kh", pa.array(kh, pa.int64())))
        return pa.concat_tables(parts)
    return expand


def _pair_schema() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.int64()),
                     "doc_b": pa.array([], pa.int64()),
                     "lev": pa.array([], pa.int64())})


def _bucket_factory(id_col: str, text_col: str, lang_col: str, k: int,
                    max_group: Optional[int]):
    def pairs_in_bucket(t: pa.Table) -> Optional[pa.Table]:
        if t.num_rows < 2:
            return None
        # group by the ACTUAL (lang, meet) values (kh only routes)
        lang_codes = t[lang_col].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        meet = t["meet"].to_numpy().astype(np.int64)
        order = np.lexsort((meet, lang_codes))
        gl, gm = lang_codes[order], meet[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (gl[1:] != gl[:-1]) | (gm[1:] != gm[:-1]))))
        bounds = np.append(starts, gl.size)
        ids = t[id_col].to_numpy().astype(np.int64)[order]
        b_orig = t["b_orig"].to_numpy().astype(np.int64)[order]
        texts = t[text_col].to_pylist()
        enc = [texts[j].encode("utf-8") for j in order]
        out_a, out_b, out_d = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = e - s
            if g < 2:
                continue
            if max_group is not None and g > max_group:
                # per-group work is quadratic; a degenerate corpus (one
                # lang, one length block) must fail LOUDLY, not OOM
                raise ValueError(
                    f"fuzzy_dup_pairs: candidate group of {g} docs "
                    f"exceeds max_group={max_group}; shrink `block` (finer "
                    f"length blocking) or raise max_group explicitly")
            gb, gid = b_orig[s:e], ids[s:e]
            genc = enc[s:e]
            glen = np.fromiter((len(x) for x in genc), np.int64, g)
            mv = gm[s]
            # chunked pair generation: a full np.triu_indices(g) is
            # O(g^2) int64 BEFORE any prune (80 GB at the 100k cap) —
            # build i-row strips and apply the meeting-block + length
            # candidate mask per strip, so peak temp is STRIP x g
            STRIP_I = 2048
            ii_parts, jj_parts = [], []
            for i0 in range(0, g - 1, STRIP_I):
                iend = min(i0 + STRIP_I, g - 1)
                ivals = np.arange(i0, iend)
                cnts = g - 1 - ivals
                ii_c = np.repeat(ivals, cnts)
                csum = np.cumsum(cnts)
                jj_c = (np.arange(int(csum[-1]))
                        - np.repeat(csum - cnts, cnts)) + ii_c + 1
                cand = ((np.maximum(gb[ii_c], gb[jj_c]) == mv)
                        & (np.abs(glen[ii_c] - glen[jj_c]) <= k))
                if cand.any():
                    ii_parts.append(ii_c[cand])
                    jj_parts.append(jj_c[cand])
            if not ii_parts:
                continue
            ii = np.concatenate(ii_parts)
            jj = np.concatenate(jj_parts)
            # histogram ONLY the docs that appear in surviving candidate
            # pairs — a 100k-doc group whose masks leave a handful of
            # pairs should not pay 100k bincounts + a (g, 256) matrix
            uniq = np.unique(np.concatenate((ii, jj)))
            H = _byte_hist([genc[int(u)] for u in uniq])
            lut = np.zeros(len(genc), np.int64)
            lut[uniq] = np.arange(uniq.size)
            # byte-bag lower bound: with A = sum|h_a - h_b| and
            # S = len_a - len_b (same parity), max(|A\B|,|B\A|) =
            # (A + |S|) / 2 — one abs pass instead of two clips
            keep_chunks = []
            for s0 in range(0, ii.size, 8192):
                i_c, j_c = ii[s0:s0 + 8192], jj[s0:s0 + 8192]
                A = np.abs(H[lut[i_c]] - H[lut[j_c]]).sum(1)
                lb = (A + np.abs(glen[i_c] - glen[j_c])) >> 1
                keep_chunks.append(lb <= k)
            sel = np.concatenate(keep_chunks) if keep_chunks \
                else np.zeros(0, bool)
            ii, jj = ii[sel], jj[sel]
            if ii.size:
                # second prune: one edit changes at most 4 of a doc's
                # 4-grams, so gram_bag/4 <= lev — kills the same-vocab
                # pairs whose byte histograms coincide (exact sorted-gram
                # intersection; hashed binning lost the decisive margin)
                gsets = _gram_sets(genc, np.unique(
                    np.concatenate((ii, jj))))
                lim = 4 * k
                sel2 = np.fromiter(
                    (_gram_bag(gsets[a], gsets[b]) <= lim
                     for a, b in zip(ii, jj)), bool, ii.size)
                ii, jj = ii[sel2], jj[sel2]
            for a_i, b_i in zip(ii, jj):
                d = levenshtein_bytes(genc[a_i], genc[b_i], k)
                if d <= k:
                    da, db = gid[a_i], gid[b_i]
                    if da > db:
                        da, db = db, da
                    out_a.append(da)
                    out_b.append(db)
                    out_d.append(d)
        if not out_a:
            return None
        o = np.lexsort((np.asarray(out_b), np.asarray(out_a)))
        return pa.table({
            "doc_a": pa.array(np.asarray(out_a, np.int64)[o]),
            "doc_b": pa.array(np.asarray(out_b, np.int64)[o]),
            "lev": pa.array(np.asarray(out_d, np.int64)[o])})
    return pairs_in_bucket


def fuzzy_dup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                    lang_col: str = "lang", k: int = 40, block: int = 32,
                    n_buckets: Optional[int] = None,
                    max_group: Optional[int] = 100_000):
    """Exact byte-Levenshtein near-dup pairs (see module docstring for
    the blocking semantics the SQL oracle mirrors).  Returns a Dataset
    of (doc_a, doc_b, lev) with doc_a < doc_b; blocks are per-bucket,
    sorted internally — sort the collected result for a global order.

    `max_group` bounds the quadratic per-(lang, block) work: a group
    larger than it raises with guidance instead of attempting O(g^2)
    candidate enumeration in one task (results are EXACT whenever the
    call succeeds — the cap never silently truncates)."""
    from .distagg import bucketed_reduce, dataset_from_refs, \
        default_buckets

    expanded = ds.map_batches(
        _expand_factory(id_col, text_col, lang_col, block),
        batch_format="pyarrow")
    if n_buckets is None:
        # per-bucket work is QUADRATIC in group size, so the row-scaled
        # bucket default (tuned for linear reduces) under-fans badly —
        # always spread across the cluster
        n_buckets = default_buckets()
    refs = bucketed_reduce(expanded, "kh",
                           _bucket_factory(id_col, text_col, lang_col, k,
                                           max_group),
                           n_buckets=n_buckets, as_refs=True)
    return dataset_from_refs(refs, _pair_schema())

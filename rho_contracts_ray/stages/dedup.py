"""Deduplication operators (first-class scale components).

Scale shapes:
  * exact       — per-batch (key -> min id, count) combine, then a key-only
                  groupby: the only thing shuffled is one row per distinct
                  key per batch (content never moves);
  * MinHash+LSH — shingle -> minhash signature per doc (vectorized numpy,
                  one pass over the text bytes), banded signatures exploded
                  to (band, band_hash) rows, groupby bucket, candidate
                  pairs verified by signature-estimated Jaccard.  Only ids
                  + small signatures enter the shuffle;
  * SimHash     — 64-bit fingerprint, 4x16-bit bands, Hamming<=k verify;
  * n-gram Jaccard — exact verifier for candidate pairs;
  * connected components — driver-side union-find over the (small) pair
                  list to form dup groups.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(ds_or_table, cols: Sequence[str], id_col: str,
                     min_count: int = 2):
    """Duplicate groups by exact value of `cols`:
    -> (cols..., keep_id=min(id), cnt) for groups with cnt >= min_count
    (min_count=1 gives the full dedup keep-list)."""
    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(cols + [id_col]).group_by(cols).aggregate(
            [(id_col, "min"), ([], "count_all")])
        return g.rename_columns(cols + ["keep_id", "cnt"])

    if isinstance(ds_or_table, pa.Table):
        t = partial(ds_or_table)
        g = t.group_by(cols).aggregate([("keep_id", "min"), ("cnt", "sum")])
        g = g.rename_columns(cols + ["keep_id", "cnt"])
        return g.filter(pc.greater_equal(g["cnt"], min_count))
    return exact_dup_groups_ds(ds_or_table, cols, id_col, min_count)


def exact_dup_groups_ds(ds, cols: Sequence[str], id_col: str,
                        min_count: int = 2):
    """Dataset flavor of exact_dup_groups (separate to keep both paths
    obvious): per-batch combine then key-only groupby."""
    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(cols + [id_col]).group_by(cols).aggregate(
            [(id_col, "min"), ([], "count_all")])
        return g.rename_columns(cols + ["keep_id", "cnt"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(cols, as_index=False).agg(
            keep_id=("keep_id", "min"), cnt=("cnt", "sum"))
        return out[out["cnt"] >= min_count]

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(cols).map_groups(finish, batch_format="pandas")


def exact_dedup(ds, cols: Sequence[str], id_col: str):
    """Keep exactly one row (min id) per distinct `cols` value.  This one
    shuffles whole rows (hash partition by key) — use exact_dup_groups +
    an anti-filter when rows are wide."""
    cols = list(cols)

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).head(1)

    return ds.groupby(cols).map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 polynomial hashes of all k-byte shingles — one vectorized
    pass over the text bytes (no per-shingle Python loop)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if b.size < k:
        b = np.pad(b, (0, k - b.size), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    pows = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64),
                    dtype=np.uint64)  # FNV-prime powers, wraparound
    return (win * pows).sum(axis=1, dtype=np.uint64)


class MinHashStage:
    """Per-doc minhash signature; permutation constants generated once per
    actor from the seed."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 128, k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        # min over the shingle SET — dedupe first (typical text repeats
        # shingles 3-5x, and min() is set-semantics anyway)
        h = np.unique(_shingle_hashes(text, self.k))
        # universal-ish hash family with uint64 wraparound; min per perm
        vals = self.a[:, None] * h[None, :] + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        ids = batch[self.id_col].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else \
            np.empty((0, self.num_perm), dtype=np.uint64)
        return pa.table({
            self.id_col: pa.array(ids),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), type=pa.uint64()), self.num_perm),
        })


def minhash_signatures(ds, text_col="text", id_col="doc_id", num_perm=128,
                       k=5, seed=42, concurrency=None):
    from ..validate import stateless_stage

    return ds.map_batches(
        stateless_stage(MinHashStage, text_col=text_col, id_col=id_col,
                        num_perm=num_perm, k=k, seed=seed),
        batch_format="pyarrow",
    )


def _explode_bands(bands: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(0).to_pylist()
        sig = batch["sig"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        num_perm = sig.type.list_size
        flat = sig.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint64).reshape(len(ids), num_perm)
        r = num_perm // bands
        out_ids, out_band, out_hash, out_sig = [], [], [], []
        band_view = flat[:, : bands * r].reshape(len(ids), bands, r)
        # hash each band (row-of-uint64 -> one uint64)
        mix = np.power(np.uint64(1099511628211),
                       np.arange(r, dtype=np.uint64), dtype=np.uint64)
        # int64 bit-view: Ray's shuffle path rejects uint64 columns
        band_hashes = (band_view * mix).sum(axis=2, dtype=np.uint64) \
            .view(np.int64)
        for i, did in enumerate(ids):
            for bnd in range(bands):
                out_ids.append(did)
                out_band.append(bnd)
                out_hash.append(int(band_hashes[i, bnd]))
                out_sig.append(flat[i].tobytes())
        return pa.table({
            "doc_id": pa.array(out_ids),
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
            "sig": pa.array(out_sig, type=pa.binary()),
        })

    return fn


class MinHashExplodeStage(MinHashStage):
    """Fused signature + band-explode stage: one pass from raw text to
    (doc_id, bkey, sig) rows, where bkey is a single int64 per (band,
    band-content) — cheaper to shuffle and to count than a two-column
    key."""

    def __init__(self, bands: int = 32, **kw):
        super().__init__(**kw)
        self.bands = bands
        r = self.num_perm // bands
        self._mix = np.power(np.uint64(1099511628211),
                             np.arange(r, dtype=np.uint64), dtype=np.uint64)
        self._band_salt = _splitmix64_np(
            np.arange(1, bands + 1, dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        n = len(texts)
        bands, r = self.bands, self.num_perm // self.bands
        sigs = np.stack([self.signature(t) for t in texts]) if n else \
            np.empty((0, self.num_perm), dtype=np.uint64)
        band_view = sigs[:, : bands * r].reshape(n, bands, r)
        bh = (band_view * self._mix).sum(axis=2, dtype=np.uint64)
        bkey = _splitmix64_np(bh ^ self._band_salt[None, :]).view(np.int64)
        sig_bytes = [sigs[i].tobytes() for i in range(n) for _ in range(bands)]
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, bands)),
            "bkey": pa.array(bkey.reshape(-1)),
            "sig": pa.array(sig_bytes, pa.binary()),
        })


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def minhash_dup_pairs(ds, text_col="text", id_col="doc_id", num_perm=128,
                      bands=32, k=5, threshold=0.7, seed=42,
                      max_bucket: int = 200) -> pa.Table:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    Almost every LSH bucket holds ONE doc; shuffling those through a
    per-group UDF is pure overhead.  So: (1) ONE fused pass from text to
    (doc_id, band-key, sig) rows; (2) collided band-keys found with a
    vectorized hash count (no groupby); (3) broadcast the (sorted) hot
    keys, semi-join by binary search; (4) pairwise-verify only inside hot
    buckets.  Buckets larger than max_bucket are truncated (flagged in the
    output's `truncated` column) — the no-silent-caps rule."""
    import ray

    from ..validate import stateless_stage

    exploded = ds.map_batches(
        stateless_stage(MinHashExplodeStage, bands=bands, text_col=text_col,
                        id_col=id_col, num_perm=num_perm, k=k, seed=seed),
        batch_format="pyarrow",
    ).materialize()

    # (2) collided keys via per-batch unique counts + driver numpy reduce
    def key_counts(batch: pa.Table) -> pa.Table:
        kk = batch["bkey"].to_numpy(zero_copy_only=False)
        u, c = np.unique(kk, return_counts=True)
        return pa.table({"k": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    kp, cp = [], []
    for b in exploded.map_batches(key_counts, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        kp.append(t["k"].to_numpy(zero_copy_only=False))
        cp.append(t["cnt"].to_numpy(zero_copy_only=False))
    if not kp:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64()),
                         "truncated": pa.array([], pa.bool_())})
    kk = np.concatenate(kp)
    cc = np.concatenate(cp)
    u, inv = np.unique(kk, return_inverse=True)
    hot = u[np.bincount(inv, weights=cc) >= 2]
    if hot.size == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64()),
                         "truncated": pa.array([], pa.bool_())})
    hot_ref = ray.put(hot)  # already sorted by np.unique

    # (3) keep only rows in collided buckets (broadcast binary search)
    def only_hot(batch: pa.Table) -> pa.Table:
        kb = batch["bkey"].to_numpy(zero_copy_only=False)
        sh = ray.get(hot_ref)
        pos = np.clip(np.searchsorted(sh, kb), 0, sh.size - 1)
        return batch.filter(pa.array(sh[pos] == kb))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # one bucket = identical bkey
        sub = df.drop_duplicates("doc_id").sort_values("doc_id")
        trunc = len(sub) > max_bucket
        sub = sub.head(max_bucket)
        ids = sub["doc_id"].to_numpy()
        raw = [np.frombuffer(s, dtype=np.uint64) for s in sub["sig"]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float((raw[i] == raw[j]).mean())
                if est >= threshold:
                    rows.append((int(min(ids[i], ids[j])),
                                 int(max(ids[i], ids[j])), est, trunc))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard",
                                           "truncated"])

    pairs = exploded.map_batches(only_hot, batch_format="pyarrow") \
        .groupby("bkey") \
        .map_groups(bucket_pairs, batch_format="pandas")
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64()),
                         "truncated": pa.array([], pa.bool_())})
    pdf = pdf.sort_values(["id_a", "id_b", "est_jaccard"],
                          ascending=[True, True, False]) \
             .drop_duplicates(["id_a", "id_b"])
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash over whitespace tokens."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        h = pd.util.hash_array(np.array(toks, dtype=object),
                               categorize=False).astype(np.uint64)
        bits = ((h[:, None] >> self.bit_idx[None, :]) & np.uint64(1)
                ).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << self.bit_idx).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array([self.simhash(t) for t in texts],
                                type=pa.uint64()),
        })


def simhash64(ds, text_col="text", id_col="doc_id", concurrency=None):
    from ..validate import stateless_stage

    return ds.map_batches(
        stateless_stage(SimHashStage, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


def simhash_dup_pairs(ds, text_col="text", id_col="doc_id",
                      max_hamming: int = 3, max_bucket: int = 500) -> pa.Table:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found via
    4x16-bit band buckets (a pair within Hamming 3 shares at least one
    exact 16-bit band — pigeonhole).  Like minhash_dup_pairs, singleton
    buckets are filtered out by a vectorized count + broadcast binary
    search before any per-group UDF runs."""
    import ray

    sh = simhash64(ds, text_col, id_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        bands = np.arange(4, dtype=np.uint64)
        parts = (h[:, None] >> (bands[None, :] * np.uint64(16))) \
            & np.uint64(0xFFFF)
        # single int64 bucket key per (band, 16-bit value)
        bkey = ((bands[None, :] << np.uint64(16)) | parts).astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, 4)),
            "bkey": pa.array(bkey.reshape(-1)),
            "simhash": pa.array(np.repeat(h, 4).view(np.int64)),
        })

    exploded = sh.map_batches(explode, batch_format="pyarrow").materialize()

    def key_counts(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["bkey"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"k": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    kp, cp = [], []
    for b in exploded.map_batches(key_counts, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        kp.append(t["k"].to_numpy(zero_copy_only=False))
        cp.append(t["cnt"].to_numpy(zero_copy_only=False))
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if not kp:
        return empty
    kk = np.concatenate(kp)
    cc = np.concatenate(cp)
    u, inv = np.unique(kk, return_inverse=True)
    hot = u[np.bincount(inv, weights=cc) >= 2]
    if hot.size == 0:
        return empty
    hot_ref = ray.put(hot)

    def only_hot(batch: pa.Table) -> pa.Table:
        kb = batch["bkey"].to_numpy(zero_copy_only=False)
        shs = ray.get(hot_ref)
        pos = np.clip(np.searchsorted(shs, kb), 0, shs.size - 1)
        return batch.filter(pa.array(shs[pos] == kb))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.drop_duplicates(id_col).sort_values(id_col).head(max_bucket)
        ids = sub[id_col].to_numpy()
        hs = sub["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        rows = []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1:]
            d = np.array([bin(int(v)).count("1") for v in x])
            for off in np.nonzero(d <= max_hamming)[0]:
                j = i + 1 + off
                rows.append((int(ids[i]), int(ids[j]), int(d[off])))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    pairs = exploded.map_batches(only_hot, batch_format="pyarrow") \
        .groupby("bkey").map_groups(bucket_pairs, batch_format="pandas")
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    pdf = pdf.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard + clustering
# ---------------------------------------------------------------------------


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (candidate-pair verifier)."""
    ta, tb = a.split(), b.split()
    ga = {tuple(ta[i:i + n]) for i in range(max(len(ta) - n + 1, 1))}
    gb = {tuple(tb[i:i + n]) for i in range(max(len(tb) - n + 1, 1))}
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(len(ga | gb), 1)


def connected_components(pairs: Iterable[tuple[int, int]]) -> list[list[int]]:
    """Union-find over the (small) dup-pair list -> dup clusters."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for x in list(parent):
        groups.setdefault(find(x), []).append(x)
    return sorted([sorted(g) for g in groups.values() if len(g) > 1])

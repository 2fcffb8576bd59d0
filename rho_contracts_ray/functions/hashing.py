"""Stable, vectorized hashing used by sketches, dedup and row invariants.

Requirements: deterministic across processes and cluster nodes (Ray workers
are separate processes — Python's builtin str hash is salted and unusable),
and vectorized (no Python loop per row in the hot path).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def stable_hash64(col: pa.Array, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of an Arrow column (any scalar type), vectorized
    via pandas' buffer hasher.  Distinct seeds give independent families
    (used for minhash permutations)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    key = hashlib.md5(f"rho-{seed}".encode()).hexdigest()[:16]
    s = col.to_pandas()
    h = pd.util.hash_array(np.asarray(s.values, dtype=object)
                           if s.dtype == object else s.values,
                           hash_key=key, categorize=False)
    return h.astype(np.uint64)


def sha256_hex_array(col: pa.Array) -> pa.Array:
    """Per-row sha256 hex of a string/binary column.

    The per-row content hash invariant (BASELINE.json input_hint) — sha256
    has no vectorized Arrow kernel, so this is a C-speed-per-call loop over
    the column only (never over whole rows).  Null -> null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out: list[Optional[str]] = []
    sha = hashlib.sha256
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        for v in col:
            b = v.as_py()
            out.append(None if b is None else sha(b).hexdigest())
    else:
        for v in col:
            s = v.as_py()
            out.append(None if s is None else sha(s.encode("utf-8")).hexdigest())
    return pa.array(out, type=pa.string())


def combine_key(table: pa.Table, cols: list[str], sep: str = "\x1f") -> pa.Array:
    """Combine several columns into one string key (for multi-column
    uniqueness / FK checks): cast to string and join with an unlikely
    separator; nulls become the literal token '\\N'."""
    parts = []
    for c in cols:
        col = table[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.cast(col, pa.string())
        s = pc.fill_null(s, "\\N")
        parts.append(s)
    if len(parts) == 1:
        return parts[0]
    out = parts[0]
    for p in parts[1:]:
        out = pc.binary_join_element_wise(out, p, sep)
    return out

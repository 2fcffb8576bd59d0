"""Per-row content invariants (BASELINE.json input_hint: sha256(content)
equality vs the reference pass).

`with_sha256` is a streaming stage appending the hex digest column;
`content_rollup` reduces a whole dataset to ONE order-independent digest
(sum of per-row hash words mod 2^64) so two runs / two cluster sizes can be
compared with O(1) driver state — the scaling criterion's
"identical output" check."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.hashing import sha256_hex_array, stable_hash64


def with_sha256(ds, col: str, out_col: str = "content_sha256"):
    def stage(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, sha256_hex_array(batch[col]))

    return ds.map_batches(stage, batch_format="pyarrow")


def _rollup_partial(col: str):
    def fn(batch: pa.Table) -> pa.Table:
        hashes = stable_hash64(sha256_hex_array(batch[col]))
        s = int(np.sum(hashes, dtype=np.uint64))
        return pa.table({"partial": [s], "rows": [batch.num_rows]})

    return fn


def content_rollup(ds, col: str) -> dict:
    """Order-independent digest over sha256(col) of every row."""
    parts = ds.map_batches(_rollup_partial(col), batch_format="pyarrow")
    total = 0
    rows = 0
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for p, r in zip(t["partial"].to_pylist(), t["rows"].to_pylist()):
            total = (total + p) % (1 << 64)
            rows += r
    return {"rows": rows, "rollup": f"{total:016x}"}


def content_rollup_table(table: pa.Table, col: str) -> dict:
    hashes = stable_hash64(sha256_hex_array(table[col]))
    return {"rows": table.num_rows,
            "rollup": f"{int(np.sum(hashes, dtype=np.uint64)) % (1 << 64):016x}"}

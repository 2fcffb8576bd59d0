"""Global top-k without a full sort.

`Dataset.sort(...).limit(k)` is an all-to-all range shuffle of EVERY row —
for a top-10 over 100 TB that moves the whole corpus to pick 10 rows.
`global_topk` instead keeps only k rows per batch (one Arrow sort_indices +
slice, local to each map task), so the only thing that ever leaves a worker
is k rows per block; the final pick runs over that tiny union.  Total ties
beyond position k are resolved by the trailing sort keys — pass a unique id
column last for a deterministic result (same contract as
joins.top_k_per_group).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def global_topk(ds, order_by: Sequence[str], k: int,
                descending: Sequence[bool] | bool = True):
    """Top-k rows of the whole dataset by `order_by`.

    Scale shape: map_batches local top-k (k rows kept per block) ->
    sort+limit over the k-per-block partials (k x n_blocks rows — for
    k=10 on a 100k-block corpus that is 1M short rows, not the corpus).
    Deterministic iff the key tuple is unique (append an id column)."""
    order_by = list(order_by)
    if isinstance(descending, bool):
        descending = [descending] * len(order_by)
    descending = list(descending)
    if len(descending) != len(order_by):
        raise ValueError(
            f"global_topk: {len(order_by)} sort keys but "
            f"{len(descending)} descending flags")
    if k <= 0:
        raise ValueError(f"global_topk: k must be positive, got {k}")
    sort_keys = [(c, "descending" if d else "ascending")
                 for c, d in zip(order_by, descending)]

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=sort_keys)
        return batch.take(idx.slice(0, k))

    partial = ds.map_batches(local, batch_format="pyarrow")
    # the final pick runs over <= k rows per block — a sort over partials
    # this small is a driver-scale operation regardless of input size
    return partial.sort(order_by, descending=descending).limit(k)

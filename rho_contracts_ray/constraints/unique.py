"""Uniqueness constraint — `unique(cols)` (SURVEY.md §2.6).

The reference has no cross-row operators; uniqueness of e.g.
(repo, path, commit) is the first dataset-level constraint the north rule
adds.  Scale design:

  * project to the key columns FIRST — the wide `content` column never
    enters the shuffle;
  * pre-aggregate per batch (pyarrow group_by count) — this is the
    combiner/salting story: a hot key collapses to ONE row per batch
    before the all-to-all exchange, so skew in the input becomes at most
    `num_batches` rows per key in the shuffle;
  * a single small `groupby(key).sum(cnt)` finishes the count.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _partial_counts(cols: Sequence[str]):
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.select(list(cols))
        return t.group_by(list(cols)).aggregate([([], "count_all")]).rename_columns(
            list(cols) + ["cnt"]
        )

    return fn


def unique_violations(ds, cols: Sequence[str], min_count: int = 2):
    """Keys appearing more than once -> Dataset[cols..., cnt].

    Streaming: input batches reduce to per-batch (key, partial-count) rows;
    the groupby shuffles only those partials."""
    cols = list(cols)
    partial = ds.map_batches(_partial_counts(cols), batch_format="pyarrow")
    total = partial.groupby(cols).sum("cnt")
    # ray's Sum names the column 'sum(cnt)'
    def finish(batch: pa.Table) -> pa.Table:
        cnt = batch["sum(cnt)"]
        keep = pc.greater_equal(cnt, min_count)
        out = batch.filter(keep)
        return out.rename_columns(cols + ["cnt"])

    return total.map_batches(finish, batch_format="pyarrow")


def unique_violations_table(table: pa.Table, cols: Sequence[str],
                            min_count: int = 2) -> pa.Table:
    """Local pyarrow path (for tests / small driver-side checks)."""
    cols = list(cols)
    g = table.select(cols).group_by(cols).aggregate([([], "count_all")])
    g = g.rename_columns(cols + ["cnt"])
    return g.filter(pc.greater_equal(g["cnt"], min_count))

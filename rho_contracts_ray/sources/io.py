"""Shared parquet IO helpers."""

from __future__ import annotations


def clean_read_parquet(path, **kwargs):
    """ray.data.read_parquet with the file's schema METADATA stripped.

    Parquet files carry a pandas-metadata dict in the Arrow schema; Ray
    2.49's repartition/groupby reduce tasks try to hash block schemas for
    deduplication and log a 'Failed to hash the schemas' warning per task
    on the unhashable dict (VERDICT r2 #9 — a warning storm in driver
    artifacts).  The metadata-free schema is passed to read_parquet
    itself, so even the ReadParquet->SplitBlocks operator emits hashable
    schemas — no extra map_batches stage, so the Dataset keeps its
    metadata-only count() (which joins.auto_buckets uses to size
    shuffles; the count is also pinned on the object for consumers that
    chain transforms before asking)."""
    import ray.data as rd

    count = None
    if "schema" not in kwargs:
        try:
            import pyarrow.dataset as pads

            import pyarrow as pa

            d = pads.dataset(path, format="parquet")
            s = d.schema.remove_metadata()
            if kwargs.get("columns"):
                # Ray expects the schema of the PROJECTED batches when a
                # column selection rides along
                s = pa.schema([s.field(c) for c in kwargs["columns"]])
            kwargs["schema"] = s
            count = d.count_rows()   # footer reads only — no data IO
        except Exception:
            pass
    ds = rd.read_parquet(path, **kwargs)
    if count is not None:
        ds._rho_meta_count = count
    return ds


def ensure_empty_dir(path: str) -> None:
    """Refuse to checkpoint into a non-empty directory: Ray's write_parquet
    APPENDS files, so re-using a scratch dir would silently duplicate every
    row on the re-read (each run's files sit side by side)."""
    import os

    if os.path.isdir(path) and os.listdir(path):
        raise ValueError(
            f"checkpoint dir {path!r} is not empty — pass a fresh "
            f"directory (write_parquet appends; a reused dir would "
            f"silently duplicate rows)")

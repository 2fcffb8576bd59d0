"""The flagship pipeline (north_star): full validation suite over the
source-code corpus `(repo, path, commit, lang, content)`.

One streaming pass over the input feeds FOUR consumers without ever
materializing the corpus:
  1. row contracts  — vectorized kernels in an actor pool (violations out);
  2. sha256 rollup  — per-row content hash, order-independent digest;
  3. column sketches — content-length t-digest + per-column HLL partials;
  4. uniqueness partial counts — per-batch combine, then a key-only shuffle.
FK checks run as a broadcast semi-join (no shuffle).  `content` is
projected away before anything wide (SURVEY.md §4).
"""

from __future__ import annotations

import os
import time

import ray
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..contracts import ast
from ..constraints.foreign_key import fk_violations_table
from ..constraints.stats import StatsPartialStage, _merge_partials, PARTIAL_SCHEMA
from ..constraints.unique import unique_violations
from ..functions.hashing import combine_key, stable_hash64
from ..sources.repo_files import commits_dim_table, repo_contract, repos_dim_table
from ..validate import ValidatorStage, VIOLATION_SCHEMA, _cluster_cpus


_UNIQ_BUCKETS = 16
# interior edges: bucket r covers uint64 hashes with top-4 bits == r
_BUCKET_INNER_EDGES = (np.arange(1, _UNIQ_BUCKETS, dtype=np.uint64)
                       << np.uint64(60))


def _bucket_bounds(sorted_hashes: np.ndarray) -> np.ndarray:
    """Slice boundaries of a SORTED uint64 hash array into the 16 top-bit
    buckets: [0, ...15 interior searchsorted positions..., n]."""
    inner = np.searchsorted(sorted_hashes, _BUCKET_INNER_EDGES)
    return np.concatenate(([0], inner, [sorted_hashes.size]))


class SuiteStage:
    """One actor-pool stage computing row-contract verdicts + violations,
    sha256 rollup partial, stats partials and uniqueness partials for a
    batch — a single pass over each block, contract compiled once per
    actor (SURVEY.md §4 'stateful stages')."""

    def __init__(self, contract: ast.Contract, key_cols: Sequence[str],
                 capture_limit: int = 64):
        self.validator = ValidatorStage(contract, name="repo_files",
                                        id_cols=key_cols,
                                        capture_limit=capture_limit)
        self.stats = StatsPartialStage(["content_len", "repo", "lang", "commit"])
        self.key_cols = list(key_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        # row contracts
        viol = self.validator(batch)
        # sha256 rollup partial over content: order-independent sum of the
        # first 8 digest bytes per row — no intermediate hex strings
        sha = hashlib.sha256
        content_col = batch["content"]
        if isinstance(content_col, pa.ChunkedArray):
            content_col = content_col.combine_chunks()
        rollup = 0
        for s in content_col.to_pylist():
            if s is not None:
                rollup += int.from_bytes(
                    sha(s.encode("utf-8")).digest()[:8], "little")
        rollup &= (1 << 64) - 1
        # stats partials over content length + key columns
        lens = pc.utf8_length(batch["content"].combine_chunks()
                              if isinstance(batch["content"], pa.ChunkedArray)
                              else batch["content"])
        stat_in = pa.table({
            "content_len": pc.cast(lens, pa.int64()),
            "repo": batch["repo"], "lang": batch["lang"],
            "commit": batch["commit"],
        })
        stats = self.stats(stat_in)
        # distinct FK keys seen in this batch (tiny) — folded into THIS
        # pass so the FK check needs no second scan of the corpus
        keys = pa.table({
            "repo": pc.unique(batch["repo"].combine_chunks()
                              if isinstance(batch["repo"], pa.ChunkedArray)
                              else batch["repo"]).drop_null(),
        })

        ckeys = pa.table({
            "commit": pc.unique(batch["commit"].combine_chunks()
                                if isinstance(batch["commit"], pa.ChunkedArray)
                                else batch["commit"]).drop_null(),
        })
        # uniqueness partial: (key-hash, count) per distinct key in batch —
        # 16 bytes per key, PRE-BUCKETED by the hash's top bits so the
        # reduce can ship each bucket's blobs straight into a parallel Ray
        # task: the driver never concatenates or sorts the hash stream
        kh = stable_hash64(combine_key(batch, self.key_cols))
        uh, uc = np.unique(kh, return_counts=True)  # sorted by hash
        bounds = _bucket_bounds(uh)
        uniq_blobs = [
            (uh[bounds[r]:bounds[r + 1]].view(np.int64).tobytes()
             + uc[bounds[r]:bounds[r + 1]].astype(np.int64).tobytes())
            for r in range(_UNIQ_BUCKETS)
        ]
        # pack the partials into one mixed table via serialization
        failed = int(pc.sum(viol.filter(
            pc.equal(viol["kind"], "summary"))["batch_failed"]).as_py() or 0)
        return pa.table({
            "kind": ["partial"],
            "violations": [_serialize(viol)],
            "stats": [_serialize(stats)],
            "repo_keys": [_serialize(keys)],
            "commit_keys": [_serialize(ckeys)],
            "uniq_buckets": [_serialize(pa.table({
                "bucket": pa.array(range(_UNIQ_BUCKETS), pa.int32()),
                "blob": pa.array(uniq_blobs, pa.binary()),
            }))],
            "rows": [batch.num_rows],
            "failed": [failed],
            # explicit uint64 — the rollup exceeds int64 and inference overflows
            "sha_rollup": pa.array([rollup % (1 << 64)], type=pa.uint64()),
        })


@ray.remote
def _reduce_uniq_bucket(blobs: list):
    """Merge one hash-range bucket's (hash, count) blobs -> duplicated
    (hashes, counts).  Each blob is n int64 hashes followed by n int64
    counts."""
    hs, cs = [], []
    for b in blobs:
        n = len(b) // 16
        arr = np.frombuffer(b, dtype=np.int64)
        hs.append(arr[:n].view(np.uint64))
        cs.append(arr[n:])
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    c = np.concatenate(cs) if cs else np.empty(0, np.int64)
    if h.size == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    u, inv = np.unique(h, return_inverse=True)
    sums = np.bincount(inv, weights=c)
    keep = sums >= 2
    return u[keep], sums[keep].astype(np.int64)


def _finish_unique(input_path, ds, key_cols, bucket_blobs) -> pa.Table:
    import ray.data as rd
    import pyarrow.compute as _pc

    empty = pa.table({**{c: pa.array([], pa.string()) for c in key_cols},
                      "cnt": pa.array([], pa.int64())})
    if not any(bucket_blobs):
        return empty
    # distributed range-partitioned reduce: the main pass pre-bucketed every
    # partial by the hash's top bits, so the driver ships each bucket's
    # blob list into its own Ray task — no driver-side concat or sort at
    # all.  (A driver-local unique() here capped the whole suite's scaling
    # efficiency at ~0.6.)
    futs = [_reduce_uniq_bucket.remote(blobs) for blobs in bucket_blobs]
    outs = ray.get(futs)
    dup_hashes = np.concatenate([o[0] for o in outs]).view(np.int64)
    dup_counts = np.concatenate([o[1] for o in outs])
    if dup_hashes.size == 0:
        return empty
    order0 = np.argsort(dup_hashes)
    dup_hashes = dup_hashes[order0]
    dup_counts = dup_counts[order0]
    ref = ray.put(dup_hashes)  # SORTED: workers binary-search, no set build

    def extract(batch: pa.Table) -> pa.Table:
        # keep only rows whose key-hash collided, deduped WITHIN the batch
        # (vectorized) so the driver never re-counts — counts come from the
        # hash reduce above (64-bit collision odds are ~distinct^2/2^64)
        kh = stable_hash64(combine_key(batch, key_cols)).view(np.int64)
        sorted_dup = ray.get(ref)
        pos = np.searchsorted(sorted_dup, kh)
        pos_c = np.clip(pos, 0, sorted_dup.size - 1)
        mask = sorted_dup[pos_c] == kh
        sub = batch.select(key_cols).filter(pa.array(mask))
        return sub.group_by(key_cols).aggregate([]).select(key_cols)

    if isinstance(input_path, (str, list)):
        key_ds = rd.read_parquet(input_path, columns=key_cols)
    else:
        key_ds = ds.select_columns(key_cols)
    parts = []
    for b in key_ds.map_batches(extract, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        parts.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
    cands = pa.concat_tables(parts) if parts else None
    if cands is None or cands.num_rows == 0:
        return empty
    # distinct keys across batches, then counts via vectorized hash lookup
    # (dup_hashes/dup_counts already co-sorted above)
    g = cands.group_by(key_cols).aggregate([]).select(key_cols)
    gh = stable_hash64(combine_key(g, key_cols)).view(np.int64)
    pos = np.searchsorted(dup_hashes, gh)
    cnt = dup_counts[np.clip(pos, 0, dup_counts.size - 1)]
    return g.append_column("cnt", pa.array(cnt, pa.int64()))


def _serialize(t: pa.Table) -> bytes:
    import io
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue()


def _deserialize(b: bytes) -> pa.Table:
    return pa.ipc.open_stream(pa.BufferReader(b)).read_all()


_STAGE_CACHE: dict = {}


def _stateless_suite_fn(batch: pa.Table, contract_bytes: bytes,
                        key_cols: tuple, capture_limit: int) -> pa.Table:
    """Stateless-task flavor of SuiteStage with a per-worker-process cache:
    tasks reuse Ray's prestarted worker pool (no actor spin-up), while the
    compiled stage is still built once per worker, not once per batch."""
    import pickle

    key = (contract_bytes, key_cols, capture_limit)
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE[key] = SuiteStage(
            pickle.loads(contract_bytes), list(key_cols), capture_limit)
    return st(batch)


def run_suite(input_path, out_dir: Optional[str] = None,
              strict: bool = False, concurrency=None,
              batch_size: int = 16384, use_actors: bool = False,
              capture_limit: int = 64) -> dict:
    """Full suite over parquet path(s) or a Dataset.  Returns the summary;
    writes violations parquet under out_dir if given.

    use_actors=False (default) runs the stage as stateless tasks with a
    per-worker cache — measured ~3.5s faster per run than an autoscaling
    actor pool at this scale because tasks reuse prestarted workers.  Pass
    use_actors=True for long-lived deployments where heavier per-actor
    state (models, large broadcast sets) should pin to a pool."""
    import functools
    import pickle

    import ray.data as rd

    t0 = time.monotonic()
    if isinstance(input_path, (str, list)):
        ds = rd.read_parquet(input_path)
    else:
        ds = input_path
    contract = repo_contract(strict=strict)
    key_cols = ["repo", "path", "commit"]

    if use_actors:
        part_ds = ds.map_batches(
            SuiteStage,
            fn_constructor_kwargs=dict(contract=contract, key_cols=key_cols,
                                       capture_limit=capture_limit),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None
            else (1, _cluster_cpus()),
        ).materialize()  # partials only — small
    else:
        part_ds = ds.map_batches(
            functools.partial(_stateless_suite_fn,
                              contract_bytes=pickle.dumps(contract),
                              key_cols=tuple(key_cols),
                              capture_limit=capture_limit),
            batch_format="pyarrow",
            batch_size=batch_size,
        ).materialize()

    t_main = time.monotonic()

    # merge partials on the driver — zero-copy: binary cells are read
    # through Arrow buffers, never via to_pylist (which would copy ~MBs of
    # hash partials per batch into Python objects)
    viol_tables, stats_tables = [], []
    repo_key_tables, commit_key_tables = [], []
    bucket_blobs = [[] for _ in range(_UNIQ_BUCKETS)]
    rows = failed = 0
    rollup = 0
    for b in part_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        viol_col = t["violations"].combine_chunks()
        stats_col = t["stats"].combine_chunks()
        rk_col = t["repo_keys"].combine_chunks()
        ck_col = t["commit_keys"].combine_chunks()
        ub_col = t["uniq_buckets"].combine_chunks()
        for i in range(t.num_rows):
            viol_tables.append(_deserialize(viol_col[i].as_buffer()))
            stats_tables.append(_deserialize(stats_col[i].as_buffer()))
            repo_key_tables.append(_deserialize(rk_col[i].as_buffer()))
            commit_key_tables.append(_deserialize(ck_col[i].as_buffer()))
            bt = _deserialize(ub_col[i].as_buffer())
            blob_col = bt["blob"].combine_chunks()
            for r in range(_UNIQ_BUCKETS):
                b = blob_col[r].as_buffer()
                if len(b):
                    bucket_blobs[r].append(b.to_pybytes())
        rows += int(pc.sum(t["rows"]).as_py() or 0)
        failed += int(pc.sum(t["failed"]).as_py() or 0)
        for v in t["sha_rollup"].to_pylist():
            rollup = (rollup + v) % (1 << 64)
    t_merge = time.monotonic()

    # uniqueness finish: one vectorized reduction over the (hash, count)
    # partials; if any hash repeats, ONE key-projected extraction scan
    # recovers the real key values (collision-proof — real keys re-grouped)
    dup_ds = _finish_unique(input_path, ds, key_cols, bucket_blobs)
    t_uniq = time.monotonic()

    violations = (pa.concat_tables(viol_tables) if viol_tables
                  else VIOLATION_SCHEMA.empty_table())
    violations = violations.filter(pc.equal(violations["kind"], "violation"))
    stats = _merge_partials(pa.concat_tables(stats_tables)
                            if stats_tables else PARTIAL_SCHEMA.empty_table())

    # collect the (small) duplicate-key result
    if isinstance(dup_ds, pa.Table):
        dup_keys = dup_ds
    else:
        dup_parts = []
        for b in dup_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            dup_parts.append(b if isinstance(b, pa.Table)
                             else pa.Table.from_batches([b]))
        dup_keys = (pa.concat_tables(dup_parts) if dup_parts
                    else pa.table({k: pa.array([], pa.string())
                                   for k in key_cols}).append_column(
                        "cnt", pa.array([], pa.int64())))

    # FK on the distinct keys gathered during the single pass (no rescan)
    def _dedup_keys(tables, col):
        if not tables:
            return pa.table({col: pa.array([], pa.string())})
        t = pa.concat_tables(tables)
        return pa.table({col: pc.unique(t[col].combine_chunks()
                                        if isinstance(t[col], pa.ChunkedArray)
                                        else t[col])})

    fk_repo = fk_violations_table(
        _dedup_keys(repo_key_tables, "repo"), ["repo"],
        repos_dim_table(), ["repo"])
    fk_commit = fk_violations_table(
        _dedup_keys(commit_key_tables, "commit"), ["commit"],
        commits_dim_table(), ["commit"])

    summary = {
        "rows": rows,
        "contract_violations": failed,
        "violations_captured": violations.num_rows,
        "duplicate_keys": dup_keys.num_rows,
        "fk_dangling_repo": fk_repo.num_rows,
        "fk_dangling_commit": fk_commit.num_rows,
        "sha256_rollup": f"{rollup:016x}",
        "content_len_p50": stats["content_len"].quantile(0.5)
        if "content_len" in stats else None,
        "content_len_p99": stats["content_len"].quantile(0.99)
        if "content_len" in stats else None,
        "approx_distinct_repo": stats["repo"].approx_distinct()
        if "repo" in stats else None,
        "wall_s": round(time.monotonic() - t0, 3),
        "phases": {
            "main_pass_s": round(t_main - t0, 3),
            "driver_merge_s": round(t_merge - t_main, 3),
            "unique_finish_s": round(t_uniq - t_merge, 3),
            "fk_and_stats_s": round(time.monotonic() - t_uniq, 3),
        },
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        pq.write_table(violations, os.path.join(out_dir, "violations.parquet"))
        pq.write_table(dup_keys, os.path.join(out_dir, "duplicate_keys.parquet"))
        with open(os.path.join(out_dir, "summary.json"), "w") as fh:
            import json
            json.dump(summary, fh, indent=2, default=str)
    return summary


def run_suite_checkpointed(fragments: Sequence[str], ckpt_dir: str,
                           out_dir: str, group_size: int = 2,
                           max_partitions: Optional[int] = None,
                           strict: bool = False) -> dict:
    """Resumable flagship run: one checkpointed partition per fragment
    group; violations land in out_dir/part=<id>/ (resumable output layout)."""
    from ..state.checkpoint import run_partitioned

    def do_partition(pid: str, files: list[str]) -> dict:
        s = run_suite(files, out_dir=os.path.join(out_dir, f"part={pid}"),
                      strict=strict)
        return {"rows": s["rows"], "violations": s["contract_violations"],
                "sha256_rollup": s["sha256_rollup"],
                "duplicate_keys": s["duplicate_keys"]}

    return run_partitioned(fragments, do_partition, ckpt_dir,
                           group_size=group_size,
                           max_partitions=max_partitions)

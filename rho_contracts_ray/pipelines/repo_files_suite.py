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
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..contracts import ast
from ..constraints.foreign_key import fk_violations_table
from ..constraints.stats import StatsPartialStage, _merge_partials, PARTIAL_SCHEMA
from ..constraints.unique import unique_violations
from ..functions.hashing import combine_key, sha256_hex_array, stable_hash64
from ..sources.repo_files import commits_dim_table, repo_contract, repos_dim_table
from ..validate import ValidatorStage, VIOLATION_SCHEMA, _cluster_cpus


class SuiteStage:
    """One actor-pool stage computing row-contract verdicts + violations,
    sha256 rollup partial, stats partials and uniqueness partials for a
    batch — a single pass over each block, contract compiled once per
    actor (SURVEY.md §4 'stateful stages')."""

    def __init__(self, contract: ast.Contract, key_cols: Sequence[str],
                 capture_limit: int = 200):
        self.validator = ValidatorStage(contract, name="repo_files",
                                        id_cols=key_cols,
                                        capture_limit=capture_limit)
        self.stats = StatsPartialStage(["content_len", "repo", "lang", "commit"])
        self.key_cols = list(key_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # row contracts
        viol = self.validator(batch)
        # sha256 rollup partial over content
        sha = sha256_hex_array(batch["content"])
        rollup = int(np.sum(stable_hash64(pa.array(
            [s for s in sha.to_pylist() if s is not None])), dtype=np.uint64)) \
            if batch.num_rows else 0
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
        # uniqueness partial (project away content first!)
        uniq = batch.select(self.key_cols).group_by(self.key_cols) \
            .aggregate([([], "count_all")]) \
            .rename_columns(self.key_cols + ["cnt"])
        # pack the three partials into one mixed table via serialization
        failed = int(pc.sum(viol.filter(
            pc.equal(viol["kind"], "summary"))["batch_failed"]).as_py() or 0)
        return pa.table({
            "kind": ["partial"],
            "violations": [_serialize(viol)],
            "stats": [_serialize(stats)],
            "uniq": [_serialize(uniq)],
            "rows": [batch.num_rows],
            "failed": [failed],
            # explicit uint64 — the rollup exceeds int64 and inference overflows
            "sha_rollup": pa.array([rollup % (1 << 64)], type=pa.uint64()),
        })


def _serialize(t: pa.Table) -> bytes:
    import io
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue()


def _deserialize(b: bytes) -> pa.Table:
    return pa.ipc.open_stream(pa.BufferReader(b)).read_all()


def run_suite(input_path, out_dir: Optional[str] = None,
              strict: bool = False, concurrency=None,
              batch_size: int = 16384) -> dict:
    """Full suite over parquet path(s) or a Dataset.  Returns the summary;
    writes violations parquet under out_dir if given."""
    import ray.data as rd

    t0 = time.monotonic()
    if isinstance(input_path, (str, list)):
        ds = rd.read_parquet(input_path)
    else:
        ds = input_path
    contract = repo_contract(strict=strict)
    key_cols = ["repo", "path", "commit"]

    part_ds = ds.map_batches(
        SuiteStage,
        fn_constructor_kwargs=dict(contract=contract, key_cols=key_cols),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, _cluster_cpus()),
    ).materialize()  # partials only — small

    # merge partials on the driver (tiny)
    viol_tables, stats_tables, uniq_tables = [], [], []
    rows = failed = 0
    rollup = 0
    for b in part_ds.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for r in t.to_pylist():
            viol_tables.append(_deserialize(r["violations"]))
            stats_tables.append(_deserialize(r["stats"]))
            uniq_tables.append(_deserialize(r["uniq"]))
            rows += r["rows"]
            failed += r["failed"]
            rollup = (rollup + r["sha_rollup"]) % (1 << 64)

    violations = (pa.concat_tables(viol_tables) if viol_tables
                  else VIOLATION_SCHEMA.empty_table())
    violations = violations.filter(pc.equal(violations["kind"], "violation"))
    stats = _merge_partials(pa.concat_tables(stats_tables)
                            if stats_tables else PARTIAL_SCHEMA.empty_table())

    # uniqueness: finish the partial counts (key-only aggregation)
    if uniq_tables:
        uniq_all = pa.concat_tables(uniq_tables)
        g = uniq_all.group_by(key_cols).aggregate([("cnt", "sum")])
        g = g.rename_columns(key_cols + ["cnt"])
        dup_keys = g.filter(pc.greater_equal(g["cnt"], 2))
    else:
        dup_keys = pa.table({k: [] for k in key_cols + ["cnt"]})

    # FK via broadcast key sets (dims are small)
    fk_repo = fk_violations_table(
        _collect_keys(ds, "repo"), ["repo"], repos_dim_table(), ["repo"])
    fk_commit = fk_violations_table(
        _collect_keys(ds, "commit"), ["commit"], commits_dim_table(), ["commit"])

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


def _collect_keys(ds, col: str) -> pa.Table:
    """Distinct keys of one column, collected small: per-batch unique ->
    driver unique.  (Dim-side anti-join input; keys are low-cardinality.)"""
    def uniq(batch: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(batch[col].combine_chunks()
                                        if isinstance(batch[col], pa.ChunkedArray)
                                        else batch[col])})

    parts = []
    for b in ds.map_batches(uniq, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        parts.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
    t = pa.concat_tables(parts) if parts else pa.table({col: []})
    return pa.table({col: pc.unique(t[col].combine_chunks()
                                    if isinstance(t[col], pa.ChunkedArray)
                                    else t[col])})


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

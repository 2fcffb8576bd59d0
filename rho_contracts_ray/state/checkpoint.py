"""Per-partition checkpoint / lineage records and resumable runs
(SURVEY.md §4; north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Ray Data has no built-in mid-dataset checkpointing — a restarted job
recomputes the whole pipeline.  The engine therefore partitions the INPUT
(by parquet fragment groups), runs each partition as its own full-cluster
streaming pipeline, writes that partition's outputs under
`out_dir/part=<id>/`, and commits an atomic JSON lineage record
`(partition_id, fragments, rows, violations, sha256 rollup, wall ms)` only
after the partition's outputs are durably written.  A killed job re-runs
the same command; completed partitions are skipped by record presence, and
re-validated outputs are byte-identical because every kernel is
deterministic (no wall clock, no unseeded RNG — retries idempotent).

At 100 TB: make partitions large (hundreds of GB each) so the sequential
wave overhead is noise; each wave saturates the cluster internally via
Ray Data's streaming executor.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Sequence


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    def _path(self, partition_id: str) -> str:
        return os.path.join(self.dir, f"{partition_id}.json")

    def completed(self) -> dict[str, dict]:
        out = {}
        for f in os.listdir(self.dir):
            if f.endswith(".json"):
                try:
                    with open(os.path.join(self.dir, f)) as fh:
                        out[f[:-5]] = json.load(fh)
                except (json.JSONDecodeError, OSError):
                    # torn write from a kill — treat as not completed
                    continue
        return out

    def record(self, partition_id: str, payload: dict) -> None:
        """Atomic: write tmp then rename (rename is atomic on POSIX)."""
        tmp = self._path(partition_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._path(partition_id))


def plan_partitions(fragments: Sequence[str], group_size: int = 1
                    ) -> list[tuple[str, list[str]]]:
    """Deterministic partition plan: fragments sorted, grouped, id = index.
    Identity is stable under retries because it depends only on the sorted
    fragment paths."""
    frags = sorted(fragments)
    out = []
    for i in range(0, len(frags), group_size):
        group = frags[i:i + group_size]
        out.append((f"p{i // group_size:05d}", group))
    return out


def run_partitioned(
    fragments: Sequence[str],
    partition_fn: Callable[[str, list[str]], dict],
    ckpt_dir: str,
    group_size: int = 1,
    max_partitions: Optional[int] = None,
) -> dict:
    """Run `partition_fn(partition_id, fragment_paths) -> metrics dict` over
    every pending partition; skip those already recorded.  Returns the merged
    summary including per-partition lineage."""
    mgr = CheckpointManager(ckpt_dir)
    done = mgr.completed()
    plan = plan_partitions(fragments, group_size)
    plan_pids = {pid for pid, _ in plan}
    ran, skipped, stale = [], [], []
    for n, (pid, files) in enumerate(plan):
        if max_partitions is not None and len(ran) >= max_partitions:
            break
        rec = done.get(pid)
        # a record only counts as done when it covers EXACTLY this plan's
        # fragments for the pid: a reused ckpt_dir with a changed
        # fragment set or group_size must re-process, not silently skip
        # new data while summing stale totals
        if rec is not None and rec.get("fragments") == files:
            skipped.append(pid)
            continue
        if rec is not None:
            stale.append(pid)
        t0 = time.monotonic()
        metrics = partition_fn(pid, files)
        metrics = dict(metrics)
        metrics["partition_id"] = pid
        metrics["fragments"] = files
        metrics["wall_ms"] = int((time.monotonic() - t0) * 1000)
        mgr.record(pid, metrics)
        done[pid] = metrics
        ran.append(pid)
    # totals sum only records belonging to the CURRENT plan — records
    # left over from a previous layout are reported, never counted
    current = {pid: d for pid, d in done.items() if pid in plan_pids}
    total_rows = sum(d.get("rows", 0) for d in current.values())
    total_viol = sum(d.get("violations", 0) for d in current.values())
    out = {
        "partitions": len(plan),
        "ran": ran,
        "skipped": skipped,
        "rows": total_rows,
        "violations": total_viol,
        "records": current,
    }
    if stale:
        out["reprocessed_stale"] = sorted(stale)
    return out

#!/usr/bin/env python
"""Benchmark runner.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

--scaling: run the flagship suite twice in FRESH processes at num_cpus=8
and num_cpus=32 on the same input, print both throughputs and the scaling
efficiency (north_rule's two-cluster-size criterion, evidenced locally by
two parallelism levels), and assert the two runs' violation outputs and
sha256 rollups are identical.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))

# flagship corpus size scales with the sf of the aux tables:
# sf0.1 -> 600k rows (mirrors lineitem's row count at that sf)
_SF_GUESS = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}


def _sf_label() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


def _corpus_dir() -> str:
    label = _sf_label()
    n = _SF_GUESS.get(label, 60_000)
    d = f"/tmp/rho_bench_corpus_{label}"
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        from rho_contracts_ray.sources import write_repo_files

        write_repo_files(d, n_rows=n, n_shards=32)
        with open(marker, "w") as fh:
            fh.write("ok")
    return d


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def run_benchmarks() -> dict:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entry

    queries: dict[str, float] = {}
    extra: dict[str, object] = {}

    # 1. flagship: full validation suite over the synthetic repo corpus
    from rho_contracts_ray.pipelines import run_suite

    corpus = _corpus_dir()
    dt, s = _timed(lambda: run_suite(corpus, batch_size=16384))
    queries["suite_repo_files"] = round(dt, 3)
    extra["suite_rows"] = s["rows"]
    extra["suite_rows_per_sec"] = round(s["rows"] / dt, 1)
    extra["suite_sha256_rollup"] = s["sha256_rollup"]
    extra["suite_violations"] = s["contract_violations"]

    # 2. headline operator pipelines over the driver tables
    q = entry.queries()
    for name in ("validate_events_summary", "unique_orders_custkey",
                 "fk_lineitem_orders", "agg_pricing_summary",
                 "sha256_documents", "token_counts_documents",
                 "minhash_pairs_documents", "knn_embeddings",
                 "events_hourly_counts"):
        def run(n=name):
            res = q[n](SF_DIR)
            # consume lazily-built results fully
            if hasattr(res, "iter_batches"):
                rows = 0
                for b in res.iter_batches(batch_format="pyarrow"):
                    rows += b.num_rows if hasattr(b, "num_rows") else len(b)
                return rows
            return getattr(res, "num_rows", len(res))

        dt, _rows = _timed(run)
        queries[name] = round(dt, 3)

    total = round(sum(queries.values()), 3)
    return {
        "metric": "validated rows/sec (contract eval + constraint suite) "
                  "+ headline operator wall times",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(),
        "num_cpus": NUM_CPUS,
        **extra,
    }


def main_single() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass
    try:
        return run_benchmarks()
    finally:
        import ray

        ray.shutdown()


def main_scaling() -> dict:
    """Fresh-process runs at 8 and 32 CPUs; identical-output assertion +
    throughput scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SF_DIR"] = SF_DIR
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--suite-only"],
            capture_output=True, env=env, timeout=3600,
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr.decode()[-2000:])
        line = proc.stdout.decode().strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["queries"]["suite_repo_files"]
    t32 = results[32]["queries"]["suite_repo_files"]
    rows = results[32]["suite_rows"]
    thr8 = rows / t8
    thr32 = rows / t32
    eff = (thr32 / 32) / (thr8 / 8)
    same = (results[8]["suite_sha256_rollup"] == results[32]["suite_sha256_rollup"]
            and results[8]["suite_violations"] == results[32]["suite_violations"])
    return {
        "metric": "suite throughput scaling 8->32 CPUs (fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf_label(),
        "rows": rows,
        "rows_per_sec_8cpu": round(thr8, 1),
        "rows_per_sec_32cpu": round(thr32, 1),
        "wall_8cpu_s": t8,
        "wall_32cpu_s": t32,
        "speedup": round(thr32 / thr8, 2),
        "identical_output": same,
    }


def main_suite_only() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass
    try:
        from rho_contracts_ray.pipelines import run_suite

        corpus = _corpus_dir()
        t0 = time.monotonic()
        s = run_suite(corpus, batch_size=16384)
        dt = time.monotonic() - t0
        return {
            "metric": "suite", "value": round(dt, 3), "unit": "sec",
            "queries": {"suite_repo_files": round(dt, 3)},
            "sf": _sf_label(), "num_cpus": NUM_CPUS,
            "suite_rows": s["rows"],
            "suite_rows_per_sec": round(s["rows"] / dt, 1),
            "suite_sha256_rollup": s["sha256_rollup"],
            "suite_violations": s["contract_violations"],
        }
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    if "--scaling" in sys.argv:
        print(json.dumps(main_scaling()))
    elif "--suite-only" in sys.argv:
        print(json.dumps(main_suite_only()))
    else:
        print(json.dumps(main_single()))

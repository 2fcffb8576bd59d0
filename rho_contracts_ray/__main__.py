"""CLI entry point — the `ray job submit` surface.

    python -m rho_contracts_ray suite --input DIR [--out DIR] [--strict]
        [--metrics-repo DIR --run-id ID]     # record + anomaly-check run metrics
    python -m rho_contracts_ray suite --input DIR --ckpt DIR --out DIR \
        [--group-size N] [--metrics-repo DIR]  # checkpointed / resumable
                                             # (+ per-partition screening)
    python -m rho_contracts_ray gen --out DIR --rows N [--shards N] [--epoch E]
    python -m rho_contracts_ray query NAME --sf-dir DIR [--out FILE.parquet]
    python -m rho_contracts_ray query --list
    python -m rho_contracts_ray drift --a SNAP_DIR --b SNAP_DIR

On a cluster:  ray job submit -- python -m rho_contracts_ray suite --input ...
Owns its Ray session (guarded init) per the driver contract — library code
never calls ray.init().
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rho_contracts_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("suite", help="run the full validation suite")
    ps.add_argument("--input", required=True,
                    help="directory of (repo,path,commit,lang,content) — "
                         "parquet, .jsonl or .csv (format sniffed from "
                         "extensions; checkpointed --ckpt mode is "
                         "parquet-only, its per-fragment lineage needs "
                         "row-group metadata)")
    ps.add_argument("--out", default=None)
    ps.add_argument("--ckpt", default=None,
                    help="checkpoint dir: enables resumable partitioned mode")
    ps.add_argument("--group-size", type=int, default=2)
    ps.add_argument("--strict", action="store_true")
    ps.add_argument("--num-cpus", type=int, default=None)
    ps.add_argument("--metrics-repo", default=None,
                    help="record run health metrics here and z-score-"
                         "check them against the recorded history "
                         "(requires --run-id; with --ckpt, partitions "
                         "record + screen themselves instead)")
    ps.add_argument("--run-id", default=None)
    ps.add_argument("--anomaly-min-dev-bp", type=int, default=500,
                    help="basis-point deviation floor for --ckpt "
                         "partition screening; a corrupt shard's signal "
                         "dilutes by ~1/group-size, so lower this for "
                         "large groups")
    ps.add_argument("--anomaly-min-history", type=int, default=3,
                    help="minimum non-empty partition profiles before "
                         "--ckpt screening activates; lower it for jobs "
                         "with only 3-4 partitions")

    pg = sub.add_parser("gen", help="generate a deterministic synthetic corpus")
    pg.add_argument("--out", required=True)
    pg.add_argument("--rows", type=int, required=True)
    pg.add_argument("--shards", type=int, default=16)
    pg.add_argument("--epoch", type=int, default=0)
    pg.add_argument("--seed", type=int, default=42)

    pq_ = sub.add_parser(
        "query", help="run one named pipeline from the driver surface")
    pq_.add_argument("name", nargs="?", default=None)
    pq_.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                     help="directory with the standard parquet tables")
    pq_.add_argument("--out", default=None,
                     help="write the result as parquet instead of printing "
                          "a summary")
    pq_.add_argument("--list", action="store_true",
                     help="list available pipeline names and exit")
    pq_.add_argument("--num-cpus", type=int, default=None)

    pd_ = sub.add_parser(
        "drift", help="distribution drift between two corpus snapshots "
                      "(exact KS on content_len, exact TV on lang)")
    pd_.add_argument("--a", required=True, help="snapshot A parquet dir")
    pd_.add_argument("--b", required=True, help="snapshot B parquet dir")
    pd_.add_argument("--ks-threshold", type=float, default=0.1)
    pd_.add_argument("--tv-threshold", type=float, default=0.05)
    pd_.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    # argparse-level validation: a pure usage error must not pay Ray
    # startup.  Same JSON-error + exit-2 contract as the --ckpt/--run-id
    # conflict: run_suite requires metrics-repo and run-id together.
    if args.cmd == "suite" and not args.ckpt \
            and (args.metrics_repo is None) != (args.run_id is None):
        print(json.dumps({"error": "--metrics-repo and --run-id must be "
                          "passed together (both or neither) without "
                          "--ckpt; per-partition --ckpt mode takes only "
                          "--metrics-repo"}))
        return 2

    if args.cmd == "gen":
        from .sources import write_repo_files

        paths = write_repo_files(args.out, n_rows=args.rows,
                                 n_shards=args.shards, seed=args.seed,
                                 epoch=args.epoch)
        print(json.dumps({"written": len(paths), "dir": args.out}))
        return 0

    if args.cmd == "query":
        # the pipeline registry lives in the repo-root driver module
        import importlib
        import pathlib

        root = str(pathlib.Path(__file__).resolve().parent.parent)
        if root not in sys.path:
            sys.path.insert(0, root)
        entry = importlib.import_module("__ray_entry__")
        qs = entry.queries()
        if args.list or not args.name:
            print(json.dumps({"queries": sorted(qs),
                              "oracled": sorted(entry.oracle_sql())}))
            return 0
        if args.name not in qs:
            print(json.dumps({"error": f"unknown query {args.name!r}",
                              "hint": "use --list"}))
            return 2

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass

    if args.cmd == "query":
        try:
            import pyarrow as pa

            res = qs[args.name](args.sf_dir)
            if hasattr(res, "to_pandas") and not isinstance(res, pa.Table):
                parts = [b if isinstance(b, pa.Table)
                         else pa.Table.from_batches([b])
                         for b in res.iter_batches(batch_size=None,
                                                   batch_format="pyarrow")]
                t = pa.concat_tables(parts) if parts else None
            elif isinstance(res, pa.Table):
                t = res
            else:                                     # pandas DataFrame
                t = pa.Table.from_pandas(res, preserve_index=False)
            rows = t.num_rows if t is not None else 0
            schema = t.schema.names if t is not None else []
            if args.out and t is not None:
                import pyarrow.parquet as pq

                pq.write_table(t, args.out)
            print(json.dumps({"query": args.name, "rows": rows,
                              "columns": schema,
                              "out": args.out or None}))
            return 0
        finally:
            ray.shutdown()

    if args.cmd == "drift":
        try:
            from .pipelines import repo_files_drift

            t = repo_files_drift(args.a, args.b,
                                 ks_threshold=args.ks_threshold,
                                 tv_threshold=args.tv_threshold)
            print(json.dumps({"checks": t.to_pylist()}))
            return 0
        finally:
            ray.shutdown()

    try:
        if args.ckpt:
            if args.run_id:
                # per-partition mode derives its own run ids; a single
                # --run-id has no referent here
                print(json.dumps({"error": "--run-id is not supported "
                                  "with --ckpt (partitions get their own "
                                  "run ids); pass only --metrics-repo "
                                  "for per-partition anomaly screening"}))
                return 2
            from .pipelines import run_suite_checkpointed

            frags = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
            s = run_suite_checkpointed(frags, args.ckpt,
                                       args.out or os.path.join(args.ckpt, "out"),
                                       group_size=args.group_size,
                                       strict=args.strict,
                                       metrics_repo_dir=args.metrics_repo,
                                       anomaly_min_dev_bp=args.anomaly_min_dev_bp,
                                       min_history=args.anomaly_min_history)
            s.pop("records", None)
        else:
            from .pipelines import run_suite

            s = run_suite(args.input, out_dir=args.out, strict=args.strict,
                          metrics_repo_dir=args.metrics_repo,
                          run_id=args.run_id)
        print(json.dumps(s, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

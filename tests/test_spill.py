"""Object-store pressure: a raw-row bucketed exchange whose routed
blocks exceed the store must complete — spilling, not OOM — with exact
results.  Runs in a SUBPROCESS so the tiny object_store_memory does not
leak into the shared test Ray session.  This is the single-node stand-in
for the 100-TB posture claim that the exchange streams through a bounded
store instead of assuming the data fits."""

import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent("""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             object_store_memory=100_000_000, logging_level="ERROR")
    from rho_contracts_ray.stages.joins import window_seq

    # ~190 MB of incompressible rows vs a 100 MB store: the routed
    # exchange blobs cannot all be resident, so primary copies spill
    rng = np.random.RandomState(0)
    n = 12_000_000
    k = rng.randint(0, 50_000, n).astype(np.int64)
    v = rng.permutation(n).astype(np.int64)          # unique -> exact ranks
    t = pa.table({"k": pa.array(k), "v": pa.array(v)})
    parts = [t.slice(i, 250_000) for i in range(0, n, 250_000)]
    out = window_seq(rd.from_arrow(parts), "k", ["v"])

    # exact oracle: rank of v within each k (dense row_number, v unique)
    order = np.lexsort((v, k))
    starts = np.flatnonzero(np.concatenate(([True],
                                            k[order][1:] != k[order][:-1])))
    lens = np.diff(np.append(starts, n))
    want_seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lens) + 1

    got_k, got_v, got_s, rows = [], [], [], 0
    for b in out.iter_batches(batch_size=None, batch_format="pyarrow"):
        bt = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        rows += bt.num_rows
        got_k.append(bt["k"].to_numpy(zero_copy_only=False))
        got_v.append(bt["v"].to_numpy(zero_copy_only=False))
        got_s.append(bt["seq"].to_numpy(zero_copy_only=False))
    assert rows == n, rows
    gk = np.concatenate(got_k); gv = np.concatenate(got_v)
    gs = np.concatenate(got_s)
    go = np.lexsort((gv, gk))
    assert np.array_equal(gk[go], k[order])
    assert np.array_equal(gv[go], v[order])
    assert np.array_equal(gs[go], want_seq)

    # spill evidence straight from the session dir (no grpc in this
    # container, so memory_summary is unavailable)
    import glob
    import os
    sess = ray._private.worker.global_worker.node.get_session_dir_path()
    spilled = []
    for pat in ("ray_spilled_objects*/*", "*spill*/*"):
        spilled += [f for f in glob.glob(os.path.join(sess, pat))
                    if os.path.isfile(f)]
    print("SPILLED_FILES", len(spilled),
          sum(os.path.getsize(f) for f in spilled))
    print("RESULT_OK rows=", rows)
    ray.shutdown()
""")


def test_raw_row_exchange_spills_and_stays_exact(tmp_path):
    p = subprocess.run([sys.executable, "-c", _SCRIPT],
                       capture_output=True, text=True, timeout=900,
                       cwd=str(tmp_path),
                       env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
                            "HOME": "/root", "RAY_ADDRESS": "local"})
    assert p.returncode == 0, p.stderr[-4000:] + p.stdout[-2000:]
    assert "RESULT_OK" in p.stdout
    # the store is half the routed volume: spilling must have engaged
    spill_line = [ln for ln in p.stdout.splitlines()
                  if ln.startswith("SPILLED_FILES")][0]
    n_files, n_bytes = int(spill_line.split()[1]), int(spill_line.split()[2])
    assert n_files > 0 and n_bytes > 50_000_000, spill_line

"""Flagship suite + checkpoint/resume (FIXTURES F5 t_resume)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from rho_contracts_ray.pipelines import run_suite, run_suite_checkpointed
from rho_contracts_ray.sources import write_repo_files
from rho_contracts_ray.state import CheckpointManager, plan_partitions


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    files = write_repo_files(str(d), n_rows=16_000, n_shards=8, seed=42)
    return files


def test_run_suite_end_to_end(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    s = run_suite(corpus, out_dir=out)
    assert s["rows"] == 16_000
    assert s["contract_violations"] > 0          # injected violations found
    assert s["duplicate_keys"] > 0               # injected dup triples found
    assert s["fk_dangling_repo"] >= 1            # org_999/repo_999
    assert s["fk_dangling_commit"] >= 1          # DEADBEEF / abc123
    assert len(s["sha256_rollup"]) == 16
    assert s["content_len_p50"] is not None
    v = pq.read_table(os.path.join(out, "violations.parquet"))
    assert v.num_rows > 0
    assert "message" in v.column_names
    # a malformed commit produces the and/matches message
    msgs = " ".join(v["message"].to_pylist()[:500])
    assert "matches(/^[0-9a-f]{40}$/)" in msgs


def test_suite_invariant_across_bucket_counts(ray_session, corpus):
    """The uniqueness-reduce fan-out (cluster-derived) is a scheduling
    knob only: every reported output is identical at 16/32/128 buckets
    (VERDICT r2 #2)."""
    outs = [run_suite(corpus, n_uniq_buckets=n) for n in (16, 20, 32, 128)]
    for k in ("rows", "contract_violations", "duplicate_keys",
              "sha256_rollup", "fk_dangling_repo", "fk_dangling_commit",
              "violations_captured"):
        assert outs[0][k] == outs[1][k] == outs[2][k], k


def test_suite_deterministic_rollup(ray_session, corpus):
    s1 = run_suite(corpus)
    s2 = run_suite(list(reversed(corpus)))   # order must not matter
    assert s1["sha256_rollup"] == s2["sha256_rollup"]
    assert s1["rows"] == s2["rows"]
    assert s1["contract_violations"] == s2["contract_violations"]


def test_checkpoint_resume(ray_session, corpus, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # "kill" after 2 of 4 partitions
    s1 = run_suite_checkpointed(corpus, ckpt, out, group_size=2,
                                max_partitions=2)
    assert len(s1["ran"]) == 2 and len(s1["skipped"]) == 0
    # resume: must skip the 2 completed partitions and run the rest
    s2 = run_suite_checkpointed(corpus, ckpt, out, group_size=2)
    assert sorted(s2["skipped"]) == sorted(s1["ran"])
    assert len(s2["ran"]) == 2
    assert s2["rows"] == 16_000
    # lineage records carry metrics
    rec = CheckpointManager(ckpt).completed()
    assert len(rec) == 4
    for pid, r in rec.items():
        assert r["rows"] > 0 and "sha256_rollup" in r and r["wall_ms"] >= 0
    # re-resume: nothing left to do, totals unchanged
    s3 = run_suite_checkpointed(corpus, ckpt, out, group_size=2)
    assert s3["ran"] == [] and len(s3["skipped"]) == 4
    assert s3["rows"] == s2["rows"] and s3["violations"] == s2["violations"]


def test_partition_plan_stable():
    frags = [f"/x/part-{i}.parquet" for i in (3, 1, 2, 0)]
    p1 = plan_partitions(frags, 2)
    p2 = plan_partitions(list(reversed(frags)), 2)
    assert p1 == p2
    assert p1[0][0] == "p00000"


def test_torn_checkpoint_ignored(tmp_path):
    ckpt = str(tmp_path / "ck")
    m = CheckpointManager(ckpt)
    m.record("p1", {"rows": 5})
    with open(os.path.join(ckpt, "p2.json"), "w") as fh:
        fh.write('{"rows": 5')  # torn write
    done = m.completed()
    assert "p1" in done and "p2" not in done


def test_run_suite_dataset_input_and_empty(ray_session, corpus):
    import pyarrow as pa
    import ray.data as rd

    # Dataset input (not a path list): same totals as the path form
    ds = rd.read_parquet(corpus)
    s = run_suite(ds)
    s_path = run_suite(corpus)
    assert s["rows"] == s_path["rows"] == 16_000
    assert s["sha256_rollup"] == s_path["sha256_rollup"]
    assert s["duplicate_keys"] == s_path["duplicate_keys"]

    # empty input: zero rows, no crash, empty outputs
    from rho_contracts_ray.sources.repo_files import REPO_FILES_SCHEMA

    empty = rd.from_arrow(REPO_FILES_SCHEMA.empty_table())
    se = run_suite(empty)
    assert se["rows"] == 0
    assert se["contract_violations"] == 0
    assert se["duplicate_keys"] == 0

def test_cli_query_subcommand(tmp_path):
    """`python -m rho_contracts_ray query` lists and runs driver pipelines
    in a fresh process (its own Ray session)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "rho_contracts_ray", "query", "--list"],
        capture_output=True, env=env, timeout=120, cwd=str(tmp_path))
    d = json.loads(r.stdout.decode().strip().splitlines()[-1])
    assert "distinct_event_types" in d["queries"]
    assert set(d["oracled"]) <= set(d["queries"])
    out = tmp_path / "res.parquet"
    r = subprocess.run(
        [sys.executable, "-m", "rho_contracts_ray", "query",
         "distinct_event_types", "--sf-dir", "/root/testdata/sf0.001",
         "--num-cpus", "2", "--out", str(out)],
        capture_output=True, env=env, timeout=300, cwd=str(tmp_path))
    d = json.loads(r.stdout.decode().strip().splitlines()[-1])
    assert d["rows"] > 0
    import pyarrow.parquet as pq
    assert pq.read_table(out).num_rows == d["rows"]
    # unknown name -> error json, exit 2
    r = subprocess.run(
        [sys.executable, "-m", "rho_contracts_ray", "query", "nope"],
        capture_output=True, env=env, timeout=120, cwd=str(tmp_path))
    assert r.returncode == 2


def test_cli_metrics_repo_pairing_error(tmp_path):
    """--metrics-repo without --run-id (non-ckpt path) must fail with the
    same JSON error + exit-2 contract as the --ckpt/--run-id conflict,
    not an uncaught ValueError traceback (r4 advisor finding)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "rho_contracts_ray", "suite",
         "--input", "/root/testdata/sf0.001",
         "--metrics-repo", str(tmp_path / "mrepo"), "--num-cpus", "2"],
        capture_output=True, env=env, timeout=180, cwd=str(tmp_path))
    assert r.returncode == 2
    d = json.loads(r.stdout.decode().strip().splitlines()[-1])
    assert "error" in d and "--run-id" in d["error"]
    assert b"Traceback" not in r.stderr


def test_suite_reads_jsonl_and_csv(ray_session, corpus, tmp_path):
    """read_table format dispatch: the SAME corpus exported as .jsonl and
    .csv yields identical suite totals to the parquet run (sha rollup is
    the whole-content invariant, so byte-level drift would show)."""
    import pyarrow as pa
    import pyarrow.csv as pacsv

    from rho_contracts_ray.sources import read_table

    t = pa.concat_tables([pq.read_table(f) for f in corpus])
    jdir, cdir = tmp_path / "jsonl", tmp_path / "csv"
    jdir.mkdir(), cdir.mkdir()
    with open(jdir / "corpus.jsonl", "w") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row) + "\n")
    pacsv.write_csv(t, str(cdir / "corpus.csv"))

    want = run_suite(corpus)
    for d in (str(jdir), str(cdir)):
        s = run_suite(d)
        assert s["rows"] == want["rows"]
        assert s["contract_violations"] == want["contract_violations"]
        assert s["duplicate_keys"] == want["duplicate_keys"]
        assert s["fk_dangling_repo"] == want["fk_dangling_repo"]
        assert sorted(s["sha256_rollup"]) == sorted(want["sha256_rollup"])

    # mixed-format directory refuses rather than guessing
    (jdir / "stray.csv").write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="cannot infer format"):
        read_table(str(jdir))


def test_checkpoint_stale_records_reprocessed(ray_session, tmp_path):
    """A reused ckpt_dir whose recorded fragments no longer match the
    current plan must RE-PROCESS, not silently skip new data while
    summing stale totals (code-review regression)."""
    from rho_contracts_ray.state.checkpoint import run_partitioned

    calls = []

    def fn(pid, files):
        calls.append((pid, tuple(files)))
        return {"rows": len(files) * 10, "violations": 0}

    ck = str(tmp_path / "ck")
    s1 = run_partitioned(["a", "b"], fn, ck, group_size=1)
    assert s1["rows"] == 20 and len(calls) == 2
    # same dir, DIFFERENT fragment set: b's record matches its new pid
    # only if the plan aligns; c is new
    calls.clear()
    s2 = run_partitioned(["b", "c"], fn, ck, group_size=1)
    # plan: p00000=[b], p00001=[c]; old p00000=[a] is stale -> re-run
    assert ("p00000", ("b",)) in calls and ("p00001", ("c",)) in calls
    assert s2["rows"] == 20                 # b + c only, no stale 'a'
    assert s2.get("reprocessed_stale") == ["p00000", "p00001"]

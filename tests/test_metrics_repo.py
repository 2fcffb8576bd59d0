"""Metrics repository + anomaly detection (constraints/metrics_repo.py):
atomic per-run records, history loading, z-score anomaly flags, and the
end-to-end Deequ loop with suggest_constraints profiles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from rho_contracts_ray.constraints.metrics_repo import (
    ANOMALY_SCHEMA, MetricsRepository, anomaly_check, record_and_check)
from rho_contracts_ray.constraints.suggest import suggest_constraints


def _profile(comp, mn):
    return pa.table({"column": pa.array(["value"], pa.string()),
                     "completeness_bp": pa.array([comp], pa.int64()),
                     "min_num": pa.array([mn], pa.float64())})


def test_record_history_roundtrip(tmp_path):
    repo = MetricsRepository(str(tmp_path / "runs"))
    assert repo.run_ids() == []
    repo.record("2024-01-01", _profile(10000, 0.0))
    repo.record("2024-01-02", _profile(9990, 0.0))
    assert repo.run_ids() == ["2024-01-01", "2024-01-02"]
    h = repo.history()
    assert h.num_rows == 2
    assert set(h["run_id"].to_pylist()) == {"2024-01-01", "2024-01-02"}
    # re-record is idempotent-by-overwrite, not a duplicate
    repo.record("2024-01-02", _profile(9991, 0.0))
    assert repo.history().num_rows == 2
    assert repo.history(exclude="2024-01-02").num_rows == 1


def test_record_rejects_path_escaping_run_id(tmp_path):
    repo = MetricsRepository(str(tmp_path / "runs"))
    with pytest.raises(ValueError, match="run_id"):
        repo.record("../evil", _profile(1, 0.0))


def test_anomaly_zscore_and_zero_variance(tmp_path):
    repo = MetricsRepository(str(tmp_path / "runs"))
    for i, comp in enumerate([10000, 9990, 10000, 9995]):
        repo.record(f"r{i}", _profile(comp, 0.0))
    hist = repo.history()
    # in-family value: no flag
    rep = anomaly_check(hist, _profile(9996, 0.0),
                        ["completeness_bp", "min_num"])
    assert rep.schema.equals(ANOMALY_SCHEMA)
    rows = {r["metric"]: r for r in rep.to_pylist()}
    assert rows["completeness_bp"]["anomaly"] is False
    assert rows["completeness_bp"]["n_history"] == 4
    # way-out value: flags with a large |z|
    rep2 = anomaly_check(hist, _profile(5000, 0.0), ["completeness_bp"])
    r2 = rep2.to_pylist()[0]
    assert r2["anomaly"] is True and abs(r2["z"]) > 3
    # min_num history is constant 0.0 -> zero variance: ANY change flags
    rep3 = anomaly_check(hist, _profile(10000, -1.0), ["min_num"])
    r3 = rep3.to_pylist()[0]
    assert r3["anomaly"] is True and r3["z"] is None
    rep4 = anomaly_check(hist, _profile(10000, 0.0), ["min_num"])
    assert rep4.to_pylist()[0]["anomaly"] is False


def test_min_history_gate(tmp_path):
    repo = MetricsRepository(str(tmp_path / "runs"))
    repo.record("only", _profile(10000, 0.0))
    rep = anomaly_check(repo.history(), _profile(0, 0.0),
                        ["completeness_bp"])
    r = rep.to_pylist()[0]
    assert r["anomaly"] is False and r["n_history"] == 1


def test_unknown_metric_raises(tmp_path):
    with pytest.raises(ValueError, match="not in"):
        anomaly_check(_profile(1, 0.0), _profile(1, 0.0), ["nope"])


def test_deequ_loop_with_suggest_profiles(ray_session, tmp_path):
    """End to end: profile real snapshots with suggest_constraints,
    record each, and catch a planted null-rate regression."""
    repo = MetricsRepository(str(tmp_path / "runs"))
    rng = np.random.default_rng(0)

    def snapshot(null_every):
        vals = rng.normal(50, 5, 400)
        arr = [None if null_every and i % null_every == 0 else float(v)
               for i, v in enumerate(vals)]
        t = pa.table({"value": pa.array(arr, pa.float64())})
        return suggest_constraints(ray.data.from_arrow(t))

    reports = []
    for day, null_every in [("d1", 100), ("d2", 100), ("d3", 100),
                            ("d4", 100), ("d5", 3)]:   # d5 regresses
        prof = snapshot(null_every)
        reports.append(record_and_check(
            repo, day, prof, ["completeness_bp"], z_thresh=3.0))
    healthy = [r.to_pylist()[0]["anomaly"] for r in reports[:4]]
    assert healthy == [False, False, False, False]
    bad = reports[4].to_pylist()[0]
    assert bad["anomaly"] is True
    # the flagged run is still on file for forensics
    assert "d5" in repo.run_ids()


def test_run_suite_records_and_flags(ray_session, tmp_path):
    """Flagship-suite integration: same corpus -> no anomalies; a
    half-size next snapshot flags its row count (and quantile shifts)
    against the recorded history; mismatched args rejected."""
    from rho_contracts_ray.pipelines import run_suite
    from rho_contracts_ray.sources import write_repo_files

    corpus = str(tmp_path / "corpus")
    write_repo_files(corpus, n_rows=2000, n_shards=4)
    repo_dir = str(tmp_path / "runs")

    with pytest.raises(ValueError, match="together"):
        run_suite(corpus, metrics_repo_dir=repo_dir)

    summaries = [run_suite(corpus, metrics_repo_dir=repo_dir,
                           run_id=f"r{i}") for i in range(3)]
    assert summaries[0]["metric_anomalies"] == 0   # no history yet
    assert summaries[1]["metric_anomalies"] == 0   # identical run
    assert summaries[2]["metric_anomalies"] == 0

    small = str(tmp_path / "corpus_small")
    write_repo_files(small, n_rows=1000, n_shards=4)
    s_bad = run_suite(small, metrics_repo_dir=repo_dir, run_id="r3")
    flagged = {(r["column"], r["metric"])
               for r in s_bad["metric_anomaly_report"]}
    assert ("__run__", "rows") in flagged
    assert s_bad["metric_anomalies"] >= 1
    # the flagged run is still recorded for forensics
    from rho_contracts_ray.constraints.metrics_repo import MetricsRepository
    assert "r3" in MetricsRepository(repo_dir).run_ids()


def test_partial_history_checks_per_metric(tmp_path):
    """A history recorded by an OLDER profile shape (no 'min_num'
    column) must not disable checking for metrics it DOES have."""
    repo = MetricsRepository(str(tmp_path / "runs"))
    old_shape = pa.table({
        "column": pa.array(["value"], pa.string()),
        "completeness_bp": pa.array([10000], pa.int64())})
    for i in range(3):
        repo.record(f"r{i}", old_shape)
    rep = anomaly_check(repo.history(), _profile(5000, -9.0),
                        ["completeness_bp", "min_num"])
    rows = {r["metric"]: r for r in rep.to_pylist()}
    # the metric with full history still flags the regression
    assert rows["completeness_bp"]["anomaly"] is True
    assert rows["completeness_bp"]["n_history"] == 3
    # the metric absent from history reports an empty baseline, no flag
    assert rows["min_num"]["n_history"] == 0
    assert rows["min_num"]["anomaly"] is False


def test_min_history_zero_rejected(tmp_path):
    with pytest.raises(ValueError, match="min_history"):
        anomaly_check(_profile(1, 0.0), _profile(1, 0.0),
                      ["completeness_bp"], min_history=0)


def test_run_suite_validates_before_the_pass(ray_session, tmp_path):
    """A bad run_id fails at entry, not after the full scan."""
    from rho_contracts_ray.pipelines import run_suite

    with pytest.raises(ValueError, match="run_id"):
        run_suite(str(tmp_path / "nonexistent"),
                  metrics_repo_dir=str(tmp_path / "runs"),
                  run_id="has space")


def test_weekly_profile_anomalies_shapes(ray_session):
    """Planted spike week flags; empty input returns the typed empty."""
    import pyarrow as pa

    from rho_contracts_ray.constraints.metrics_repo import (
        weekly_profile_anomalies)

    # 8 calm-but-jittery weeks (10-12 events; jitter keeps the others'
    # variance nonzero — a spike against a CONSTANT background gets a
    # null leave-one-out z because the other weeks have zero variance)
    # + one 100-event spike week
    ts, et = [], []
    base = 1_700_000_000_000_000   # us epoch, arbitrary anchor
    week_us = 7 * 24 * 3600 * 1_000_000
    for w in range(9):
        n = 100 if w == 4 else 10 + (w % 3)
        for i in range(n):
            ts.append(base + w * week_us + i)
            et.append("purchase" if i % 2 == 0 else "click")
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": pa.array(et, pa.string())})
    out = weekly_profile_anomalies(ray.data.from_arrow(t).repartition(3))
    rows = out.to_pylist()
    assert len(rows) == 9
    zs = [r["z_n_e6"] for r in rows]
    spike = max(r for r in zs if r is not None)
    assert rows[zs.index(spike)]["n_events"] == 100
    assert spike > 2_000_000        # z > 2 on the spike week

    empty = weekly_profile_anomalies(ray.data.from_arrow(pa.table({
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string())})))
    assert empty.num_rows == 0
    assert empty.column_names == ["week", "n_events", "n_match",
                                  "z_n_e6", "z_match_e6"]


def test_checkpointed_partition_screening(ray_session, tmp_path):
    """A corrupt shard surfaces as the partition whose violation rate
    deviates; resume does not duplicate records."""
    import glob

    import pyarrow.parquet as pq

    from rho_contracts_ray.constraints.metrics_repo import MetricsRepository
    from rho_contracts_ray.pipelines import run_suite_checkpointed
    from rho_contracts_ray.sources import write_repo_files

    corpus = str(tmp_path / "corpus")
    frags = write_repo_files(corpus, n_rows=2400, n_shards=12)
    # corrupt ONE shard: null out the lang column -> violation spike
    t = pq.read_table(frags[7])
    t = t.set_column(t.schema.get_field_index("lang"), "lang",
                     pa.nulls(t.num_rows, pa.string()))
    pq.write_table(t, frags[7])

    repo_dir = str(tmp_path / "runs")
    s = run_suite_checkpointed(sorted(glob.glob(corpus + "/*.parquet")),
                               str(tmp_path / "ckpt"),
                               str(tmp_path / "out"), group_size=2,
                               metrics_repo_dir=repo_dir)
    anoms = s["partition_anomalies"]
    # ONLY the corrupt shard's partition flags (the deviation floor
    # keeps healthy partitions' natural variation quiet); run ids are
    # job-namespaced so shared repo dirs cannot collide across jobs
    assert len(anoms) == 1
    (rid,) = anoms
    assert rid.startswith("part-") and rid.endswith("-p00003")
    assert any(m == "violation_bp" for _, m, _v in anoms[rid])
    assert s["partition_screening"] == "active"
    n_recorded = len(MetricsRepository(repo_dir).run_ids())
    assert n_recorded == 6               # 12 shards / group_size 2
    assert all(r.startswith("part-") for r in
               MetricsRepository(repo_dir).run_ids())

    # resume: everything skipped, records not duplicated, same screen
    s2 = run_suite_checkpointed(sorted(glob.glob(corpus + "/*.parquet")),
                                str(tmp_path / "ckpt"),
                                str(tmp_path / "out"), group_size=2,
                                metrics_repo_dir=repo_dir)
    assert len(MetricsRepository(repo_dir).run_ids()) == 6
    assert s2["partition_anomalies"].keys() == anoms.keys()


def test_checkpointed_screening_min_history_tunable(ray_session, tmp_path):
    """A 3-partition job reports 'inactive' screening under the default
    min_history=3 but activates when the caller lowers the floor (r4
    advisor finding: the floor was hardcoded)."""
    import glob

    from rho_contracts_ray.pipelines import run_suite_checkpointed
    from rho_contracts_ray.sources import write_repo_files

    corpus = str(tmp_path / "corpus")
    write_repo_files(corpus, n_rows=900, n_shards=6)
    frags = sorted(glob.glob(corpus + "/*.parquet"))

    s = run_suite_checkpointed(frags, str(tmp_path / "ckpt_a"),
                               str(tmp_path / "out_a"), group_size=2,
                               metrics_repo_dir=str(tmp_path / "runs_a"))
    assert s["partition_screening"].startswith("inactive")

    s2 = run_suite_checkpointed(frags, str(tmp_path / "ckpt_b"),
                                str(tmp_path / "out_b"), group_size=2,
                                metrics_repo_dir=str(tmp_path / "runs_b"),
                                min_history=2)
    assert s2["partition_screening"] == "active"


def test_screen_runs_include_and_shared_dir(tmp_path):
    """A shared repo dir holding foreign-shape records must neither
    crash the screen nor pollute the baseline when `include` scopes it."""
    from rho_contracts_ray.constraints.metrics_repo import (
        MetricsRepository, screen_runs)

    repo = MetricsRepository(str(tmp_path / "runs"))
    # foreign record with a DIFFERENT profile shape
    repo.record("other-job", pa.table({
        "column": pa.array(["x"], pa.string()),
        "rows": pa.array([1], pa.int64())}))
    for i, bp in enumerate([100, 110, 105, 9000]):
        repo.record(f"part-p{i}", pa.table({
            "column": pa.array(["__partition__"], pa.string()),
            "violation_bp": pa.array([bp], pa.int64())}))
    include = [f"part-p{i}" for i in range(4)]
    out = screen_runs(repo, ["violation_bp"], min_history=3,
                      min_dev=500.0, include=include)
    assert list(out) == ["part-p3"]
    # without include the foreign record would raise on missing metrics
    with pytest.raises(ValueError, match="not in"):
        screen_runs(repo, ["violation_bp"], min_history=3)

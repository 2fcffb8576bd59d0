"""Snapshot drift for the repo-files corpus: the north-star "KS-style
distribution-drift checks on content-length and lang frequency between
snapshots".  The exact statistics are reproduced bit-for-bit by a DuckDB
oracle (window-function ECDF for KS, frequency tables for TV)."""

import duckdb
import pytest
import ray.data as rd

from rho_contracts_ray.pipelines import repo_files_drift
from rho_contracts_ray.sources.repo_files import write_repo_files


@pytest.fixture(scope="module")
def snaps(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("drift_snaps")
    a = str(base / "epoch0")
    b = str(base / "epoch2")
    a2 = str(base / "epoch0_reseeded")
    write_repo_files(a, n_rows=4000, n_shards=4, seed=42, epoch=0)
    write_repo_files(b, n_rows=4000, n_shards=4, seed=42, epoch=2)
    # same epoch, different shard seeds: same distribution, no drift
    write_repo_files(a2, n_rows=4000, n_shards=4, seed=4242, epoch=0)
    return a, b, a2


def _oracle(a: str, b: str):
    """Exact two-sample KS on length(content) + exact TV on lang."""
    con = duckdb.connect()
    ks = con.execute(f"""
        WITH u AS (
          SELECT length(content) AS v, 1 AS ca, 0 AS cb
          FROM read_parquet('{a}/*.parquet') WHERE content IS NOT NULL
          UNION ALL
          SELECT length(content), 0, 1
          FROM read_parquet('{b}/*.parquet') WHERE content IS NOT NULL
        ), c AS (
          SELECT v, sum(ca) AS ca, sum(cb) AS cb FROM u GROUP BY v
        ), e AS (
          SELECT sum(ca) OVER (ORDER BY v) * 1.0 / (SELECT sum(ca) FROM c)
                   AS fa,
                 sum(cb) OVER (ORDER BY v) * 1.0 / (SELECT sum(cb) FROM c)
                   AS fb
          FROM c
        )
        SELECT max(abs(fa - fb)) FROM e
    """).fetchone()[0]
    tv = con.execute(f"""
        WITH u AS (
          SELECT lang, 1 AS ca, 0 AS cb
          FROM read_parquet('{a}/*.parquet') WHERE lang IS NOT NULL
          UNION ALL
          SELECT lang, 0, 1
          FROM read_parquet('{b}/*.parquet') WHERE lang IS NOT NULL
        ), c AS (
          SELECT lang, sum(ca) AS ca, sum(cb) AS cb FROM u GROUP BY lang
        )
        SELECT 0.5 * sum(abs(ca * 1.0 / (SELECT sum(ca) FROM c)
                             - cb * 1.0 / (SELECT sum(cb) FROM c)))
        FROM c
    """).fetchone()[0]
    con.close()
    return float(ks), float(tv)


def test_drift_detected_between_epochs(snaps):
    a, b, _ = snaps
    rep = repo_files_drift(a, b).to_pylist()
    by_col = {r["column"]: r for r in rep}
    ks, tv = _oracle(a, b)
    # epoch 2 rolls lang frequencies and shifts the length log-mean by
    # +0.5 — both checks must fire
    assert by_col["content_len"]["drifted"]
    assert by_col["lang"]["drifted"]
    assert by_col["content_len"]["statistic"] == pytest.approx(ks, abs=0)
    assert by_col["lang"]["statistic"] == pytest.approx(tv, abs=1e-12)
    assert by_col["content_len"]["kind"] == "numeric-ks"
    assert by_col["lang"]["kind"] == "categorical-tv"


def test_no_drift_same_distribution(snaps):
    a, _, a2 = snaps
    rep = {r["column"]: r for r in repo_files_drift(a, a2).to_pylist()}
    ks, tv = _oracle(a, a2)
    assert not rep["content_len"]["drifted"]
    assert not rep["lang"]["drifted"]
    assert rep["content_len"]["statistic"] == pytest.approx(ks, abs=0)
    assert rep["lang"]["statistic"] == pytest.approx(tv, abs=1e-12)


def test_null_content_excluded_and_counts(snaps):
    a, b, _ = snaps
    rep = {r["column"]: r for r in repo_files_drift(a, b).to_pylist()}
    con = duckdb.connect()
    na = con.execute(f"SELECT count(content) FROM "
                     f"read_parquet('{a}/*.parquet')").fetchone()[0]
    nb = con.execute(f"SELECT count(content) FROM "
                     f"read_parquet('{b}/*.parquet')").fetchone()[0]
    la = con.execute(f"SELECT count(lang) FROM "
                     f"read_parquet('{a}/*.parquet')").fetchone()[0]
    con.close()
    # the generator injects ~0.5% null content: count(content) < 4000
    assert na < 4000
    assert rep["content_len"]["n_a"] == na
    assert rep["content_len"]["n_b"] == nb
    assert rep["lang"]["n_a"] == la


def test_drift_counts_empty_inputs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rho_contracts_ray.pipelines.snapshot_drift import drift_counts

    empty = pa.table({"lang": pa.array([], pa.string()),
                      "content": pa.array([], pa.large_string())})
    p = tmp_path / "empty.parquet"
    pq.write_table(empty, p)
    t = drift_counts(rd.read_parquet(str(p)), rd.read_parquet(str(p)))
    assert t.num_rows == 0

"""Dataset-level constraints vs exact duckdb/pyarrow oracles (FIXTURES F5)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from rho_contracts_ray.constraints import (
    categorical_drift, column_stats_table, content_rollup_table,
    fk_violations_table, ks_statistic, numeric_drift_from_stats,
    unique_violations_table,
)
from rho_contracts_ray.constraints.stats import StatsPartialStage, _merge_partials
from rho_contracts_ray.functions.sketches import HyperLogLog, TDigest
from rho_contracts_ray.sources import (
    commits_dim_table, make_repo_files_table, repos_dim_table,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders():
    import pyarrow.parquet as pq
    return pq.read_table(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem():
    import pyarrow.parquet as pq
    return pq.read_table(f"{SF}/lineitem.parquet")


def test_tdigest_quantiles_close():
    rng = np.random.default_rng(0)
    v = rng.normal(100, 15, 200_000)
    d = TDigest()
    # feed in chunks then merge another digest, as batches would
    d2 = TDigest()
    d.add(v[:120_000])
    d2.add(v[120_000:])
    d.merge(d2)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(v, q)
        approx = d.quantile(q)
        assert abs(approx - exact) < 0.6, (q, exact, approx)
    assert d.count == v.size
    assert d.quantile(0) == v.min() and d.quantile(1) == v.max()


def test_hll_estimate_within_bounds():
    from rho_contracts_ray.functions.hashing import stable_hash64
    n = 50_000
    vals = pa.array([f"key_{i}" for i in range(n)])
    h = HyperLogLog()
    h.add_hashes(stable_hash64(vals))
    est = h.estimate()
    assert abs(est - n) / n < 0.03, est
    # mergeability: two halves == whole
    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_hashes(stable_hash64(vals.slice(0, n // 2)))
    h2.add_hashes(stable_hash64(vals.slice(n // 2)))
    h1.merge(h2)
    assert h1.estimate() == pytest.approx(est, rel=1e-9)


def test_unique_violations_vs_duckdb(orders):
    mine = unique_violations_table(orders, ["o_custkey"])
    con = duckdb.connect()
    ref = con.execute(
        f"select o_custkey, count(*) cnt from read_parquet('{SF}/orders.parquet') "
        "group by 1 having count(*) >= 2 order by 1"
    ).fetch_arrow_table()
    mine = mine.sort_by("o_custkey")
    assert mine.num_rows == ref.num_rows
    assert mine["o_custkey"].to_pylist() == ref["o_custkey"].to_pylist()
    assert mine["cnt"].to_pylist() == ref["cnt"].to_pylist()


def test_unique_on_synthetic_dups():
    t = make_repo_files_table(20_000, seed=42)
    v = unique_violations_table(t, ["repo", "path", "commit"])
    assert v.num_rows > 0  # injected duplicates found
    # hot repo concentrates them (skew fixture)
    repos = v["repo"].to_pylist()
    assert any(r == "org_000/repo_000" for r in repos)


def test_fk_violations_synthetic():
    t = make_repo_files_table(20_000, seed=42)
    dims = repos_dim_table()
    v = fk_violations_table(t, ["repo"], dims, ["repo"])
    keys = v["repo"].to_pylist()
    assert "org_999/repo_999" in keys          # injected dangling key
    assert None not in keys                     # nulls are not FK violations
    cdim = commits_dim_table()
    v2 = fk_violations_table(t, ["commit"], cdim, ["commit"])
    assert "DEADBEEF" in v2["commit"].to_pylist()


def test_fk_no_violations(lineitem, orders):
    v = fk_violations_table(lineitem, ["l_orderkey"], orders, ["o_orderkey"])
    assert v.num_rows == 0


def test_fk_shuffle_strategy_matches_broadcast(ray_session):
    """Both-sides-large anti-join == broadcast membership test, on string
    keys (combine-key routing) and int keys, with planted dangling keys
    and null child keys."""
    import ray.data as rd

    from rho_contracts_ray.constraints.foreign_key import fk_violations

    t = make_repo_files_table(20_000, seed=42)
    dims = repos_dim_table()

    def run(strategy):
        out = fk_violations(rd.from_arrow(t).repartition(6), ["repo"],
                            rd.from_arrow(dims), ["repo"],
                            strategy=strategy)
        df = out.to_pandas().sort_values("repo").reset_index(drop=True)
        return df

    b, s = run("broadcast"), run("shuffle")
    assert b.equals(s)
    assert "org_999/repo_999" in set(s["repo"])

    # int keys, dangling values planted on the child side
    child = pa.table({"k": pa.array([1, 2, 2, 3, 99, 99, None], pa.int64())})
    dim = pa.table({"k": pa.array([1, 2, 3, None], pa.int64())})
    got = fk_violations(rd.from_arrow(child), ["k"], rd.from_arrow(dim),
                        ["k"], strategy="shuffle").to_pandas()
    assert got.set_index("k")["cnt"].to_dict() == {99: 2}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        fk_violations(rd.from_arrow(child), ["k"], rd.from_arrow(dim),
                      ["k"], strategy="bogus")


def test_column_stats_vs_duckdb(lineitem):
    stats = column_stats_table(lineitem, ["l_quantity", "l_extendedprice",
                                          "l_returnflag"])
    con = duckdb.connect()
    q = con.execute(
        f"select count(l_quantity), min(l_quantity), max(l_quantity), "
        f"avg(l_quantity), stddev_pop(l_quantity), "
        f"count(distinct l_quantity), median(l_quantity) "
        f"from read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()
    s = stats["l_quantity"]
    assert s.count == q[0]
    assert s.vmin == q[1] and s.vmax == q[2]
    assert s.mean == pytest.approx(q[3], rel=1e-12)
    assert s.std == pytest.approx(q[4], rel=1e-9)
    assert s.approx_distinct() == pytest.approx(q[5], rel=0.05)
    assert s.quantile(0.5) == pytest.approx(q[6], rel=0.02)
    # string column min/max
    rf = stats["l_returnflag"]
    assert rf.smin == "A" and rf.smax == "R"


def test_stats_partials_merge_equals_whole(lineitem):
    whole = column_stats_table(lineitem, ["l_quantity"])["l_quantity"]
    stage = StatsPartialStage(["l_quantity"])
    parts = pa.concat_tables([
        stage(lineitem.slice(0, 20_000)),
        stage(lineitem.slice(20_000, 20_000)),
        stage(lineitem.slice(40_000)),
    ])
    merged = _merge_partials(parts)["l_quantity"]
    assert merged.count == whole.count
    assert merged.vsum == pytest.approx(whole.vsum)
    assert merged.quantile(0.5) == pytest.approx(whole.quantile(0.5), rel=0.02)


def test_drift_detects_shift():
    a = make_repo_files_table(30_000, seed=42, epoch=0, violation_rate=0)
    b = make_repo_files_table(30_000, seed=42, epoch=2, violation_rate=0)
    same = make_repo_files_table(30_000, seed=43, epoch=0, violation_rate=0)

    def len_stats(t):
        import pyarrow.compute as pc
        lens = pc.utf8_length(t["content"].combine_chunks())
        return column_stats_table(pa.table({"n": lens}), ["n"])["n"]

    sa, sb, ssame = len_stats(a), len_stats(b), len_stats(same)
    drift_ab = numeric_drift_from_stats(sa, sb, "n")
    drift_same = numeric_drift_from_stats(sa, ssame, "n")
    assert drift_ab.drifted and drift_ab.statistic > 0.1
    assert not drift_same.drifted and drift_same.statistic < 0.05

    cat = categorical_drift(a, b, "lang")
    cat_same = categorical_drift(a, same, "lang")
    assert cat.drifted
    assert not cat_same.drifted


def test_content_rollup_order_independent():
    t = make_repo_files_table(5_000, seed=1, violation_rate=0)
    r1 = content_rollup_table(t, "content")
    # permute rows — rollup must not change
    idx = np.random.default_rng(7).permutation(t.num_rows)
    t2 = t.take(pa.array(idx))
    r2 = content_rollup_table(t2, "content")
    assert r1 == r2
    # and any change must change it
    t3 = t.set_column(4, "content", pa.array(
        ["X"] + t["content"].to_pylist()[1:], type=pa.large_string()))
    assert content_rollup_table(t3, "content") != r1


def test_sha256_vs_duckdb():
    from rho_contracts_ray.functions.hashing import sha256_hex_array
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    mine = sha256_hex_array(docs["text"]).to_pylist()
    con = duckdb.connect()
    ref = con.execute(
        f"select sha256(text) from read_parquet('{SF}/documents.parquet') order by doc_id"
    ).fetchall()
    docs_sorted = docs.sort_by("doc_id")
    mine_sorted = sha256_hex_array(docs_sorted["text"]).to_pylist()
    assert mine_sorted == [r[0] for r in ref]


def test_numeric_and_categorical_drift_on_datasets(ray_session):
    """The Dataset-flavored drift APIs (streaming sketch passes)."""
    import ray.data as rd

    from rho_contracts_ray.constraints import categorical_drift, numeric_drift
    from rho_contracts_ray.sources import make_repo_files_table

    a = rd.from_arrow(make_repo_files_table(20_000, seed=42, epoch=0,
                                            violation_rate=0))
    b = rd.from_arrow(make_repo_files_table(20_000, seed=42, epoch=2,
                                            violation_rate=0))

    def with_len(batch):
        import pyarrow as _pa
        import pyarrow.compute as _pc
        return _pa.table({"n": _pc.cast(_pc.utf8_length(
            batch["content"].combine_chunks()
            if isinstance(batch["content"], _pa.ChunkedArray)
            else batch["content"]), _pa.int64())})

    la = a.map_batches(with_len, batch_format="pyarrow")
    lb = b.map_batches(with_len, batch_format="pyarrow")
    r = numeric_drift(la, lb, "n")
    assert r.drifted and r.statistic > 0.1
    c = categorical_drift(
        rd.from_arrow(make_repo_files_table(20_000, seed=42, epoch=0,
                                            violation_rate=0)),
        rd.from_arrow(make_repo_files_table(20_000, seed=42, epoch=2,
                                            violation_rate=0)), "lang")
    assert c.drifted


def test_bloom_filter_one_sided_error():
    from rho_contracts_ray.functions.hashing import stable_hash64
    from rho_contracts_ray.functions.sketches import BloomFilter

    n = 40_000
    members = stable_hash64(pa.array([f"in_{i}" for i in range(n)]))
    others = stable_hash64(pa.array([f"out_{i}" for i in range(n)]))
    bf = BloomFilter(n, fpr=0.01)
    bf.add_hashes(members)
    # no false negatives, ever
    assert bf.contains_hashes(members).all()
    # false-positive rate near the sizing target (pow2 rounding of nbits
    # can only LOWER it; allow 3x headroom for hash quirks)
    fpr = bf.contains_hashes(others).mean()
    assert fpr <= 0.03, fpr
    # mergeability: union of two filters == filter of the union
    b1, b2 = BloomFilter(n, fpr=0.01), BloomFilter(n, fpr=0.01)
    b1.add_hashes(members[: n // 2])
    b2.add_hashes(members[n // 2:])
    b1.merge(b2)
    assert np.array_equal(b1.bits, bf.bits)
    # empty filter rejects everything
    assert not BloomFilter(10).contains_hashes(members).any()


def test_column_stats_nan_excluded_from_mean(ray_session):
    """A NaN value must not deflate the mean/std (code-review
    regression: count included NaN while vsum excluded it)."""
    import ray.data as rd

    from rho_contracts_ray.constraints import column_stats

    t = pa.table({"v": pa.array([1.0, float("nan"), 3.0, None])})
    s = column_stats(rd.from_arrow(t), ["v"])["v"]
    assert s.count == 3              # SQL count(col): non-null incl. NaN
    assert s.mean == 2.0             # finite mean: (1+3)/2
    assert abs(s.std - 1.0) < 1e-12


def test_stats_summary_subpercent_labels(ray_session):
    import ray.data as rd

    from rho_contracts_ray.constraints import column_stats

    s = column_stats(rd.from_arrow(pa.table({"v": pa.array([1.0, 2.0])})),
                     ["v"])["v"]
    out = s.summary(quantiles=(0.99, 0.999))
    assert "p99" in out and "p99_9" in out    # no silent collision


def test_categorical_drift_null_vs_literal_backslash_n(ray_session):
    """50% null -> 50% literal '\\N' must register as drift, not merge
    into one category (code-review regression)."""
    import ray.data as rd

    from rho_contracts_ray.constraints import categorical_drift

    a = rd.from_arrow(pa.table({"c": pa.array(["x", None] * 10)}))
    b = rd.from_arrow(pa.table({"c": pa.array(["x", "\\N"] * 10)}))
    rep = categorical_drift(a, b, "c", threshold=0.05)
    assert rep.statistic >= 0.49 and rep.drifted


def test_validate_rejects_missing_id_cols(ray_session):
    import pytest
    import ray.data as rd

    from rho_contracts_ray import c, validate

    ds = rd.from_arrow(pa.table({"a": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="id_cols"):
        validate(ds, c.object({"a": c.integer}), id_cols=["a", "typo"])

"""Range-partitioned parquet sink (sources/io.write_range_partitioned)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from rho_contracts_ray.sources.io import write_range_partitioned


def _read_part(out_dir, k):
    files = glob.glob(os.path.join(out_dir, f"part={k}", "*.parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_range_writer_disjoint_complete(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    vals = [None if i % 37 == 0 else float(x)
            for i, x in enumerate(rng.normal(size=5000))]
    t = pa.table({"id": pa.array(range(5000), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    out = str(tmp_path / "ranged")
    fences = write_range_partitioned(
        rd.from_arrow(t).repartition(6), "v", out, 4)
    assert 1 <= len(fences) <= 3

    seen = 0
    prev_max = -np.inf
    for k in range(4):
        part = _read_part(out, k)
        if part is None:
            continue
        seen += part.num_rows
        pv = part["v"].to_numpy(zero_copy_only=False)
        assert not np.isnan(pv).any()
        # ranges are contiguous and disjoint: [f_{k-1}, f_k)
        assert pv.min() >= prev_max or prev_max == -np.inf
        if k < len(fences):
            assert pv.max() < fences[k]
        if k > 0 and k - 1 < len(fences):
            assert pv.min() >= fences[k - 1]
        prev_max = pv.max()
    nulls = _read_part(out, 4)
    n_null = sum(v is None for v in vals)
    assert nulls.num_rows == n_null
    assert nulls["v"].null_count == n_null
    assert seen + nulls.num_rows == 5000


def test_range_writer_sample_is_actually_small(ray_session, tmp_path):
    """Regression: the signed-shift keep test sampled ~50% of the column
    regardless of sample_target (code-review finding)."""
    import rho_contracts_ray.sources.io as iomod

    t = pa.table({"v": pa.array(np.arange(50_000, dtype=np.float64))})
    ds = rd.from_arrow(t).repartition(4)
    captured = {}
    orig = np.sort

    def spy(arr, *a, **k):
        captured.setdefault("n", len(arr))
        return orig(arr, *a, **k)

    np.sort = spy
    try:
        iomod.write_range_partitioned(ds, "v", str(tmp_path / "s"), 4,
                                      sample_target=500)
    finally:
        np.sort = orig
    # binomial(50k, 0.01): ~500 expected; 2500 would mean the sign bug
    assert captured["n"] < 2500


def test_range_writer_string_key_with_nulls(ray_session, tmp_path):
    """Regression: object-dtype searchsorted crashed on None entries."""
    vals = [None if i % 11 == 0 else f"k{i:05d}" for i in range(2000)]
    t = pa.table({"s": pa.array(vals, pa.string())})
    out = str(tmp_path / "strkey")
    write_range_partitioned(rd.from_arrow(t).repartition(3), "s", out, 3)
    n_null = sum(v is None for v in vals)
    nulls = _read_part(out, 3)
    assert nulls.num_rows == n_null
    total = sum(_read_part(out, k).num_rows
                for k in range(4) if _read_part(out, k) is not None)
    assert total == 2000


def test_range_writer_deterministic_fences(ray_session, tmp_path):
    t = pa.table({"v": pa.array(np.arange(2000, dtype=np.float64))})
    f1 = write_range_partitioned(rd.from_arrow(t).repartition(3), "v",
                                 str(tmp_path / "a"), 3)
    f2 = write_range_partitioned(rd.from_arrow(t).repartition(9), "v",
                                 str(tmp_path / "b"), 3)
    assert np.array_equal(f1, f2)   # partitioning-shape invariant


def test_hash_shards_complete_deterministic(ray_session, tmp_path):
    from rho_contracts_ray.sources.io import write_hash_shards

    t = pa.table({"id": pa.array(range(2000), pa.int64()),
                  "v": pa.array([float(i) * 0.5 for i in range(2000)])})
    outs = []
    for i, parts in enumerate((1, 7)):
        out = str(tmp_path / f"shards{i}")
        man = write_hash_shards(rd.from_arrow(t).repartition(parts),
                                "id", out, 8, resume=False)
        assert int(pa.compute.sum(man["rows"]).as_py()) == 2000
        per_shard = {}
        for k in man["shard"].to_pylist():
            f = os.path.join(out, f"shard={k}", "data.parquet")
            per_shard[k] = sorted(pq.read_table(f)["id"].to_pylist())
        outs.append(per_shard)
        # manifest matches files
        for k, r in zip(man["shard"].to_pylist(),
                        man["rows"].to_pylist()):
            assert len(per_shard[k]) == r
    # same shard membership regardless of input partitioning
    assert outs[0] == outs[1]
    # every row lands exactly once
    all_ids = sorted(i for s in outs[0].values() for i in s)
    assert all_ids == list(range(2000))


def test_hash_shards_resume_skips(ray_session, tmp_path):
    from rho_contracts_ray.sources.io import write_hash_shards

    t = pa.table({"id": pa.array(range(500), pa.int64())})
    out = str(tmp_path / "resume")
    man1 = write_hash_shards(rd.from_arrow(t), "id", out, 4,
                             resume=False)
    # simulate a crash that lost one shard
    victim = int(man1["shard"][0].as_py())
    os.remove(os.path.join(out, f"shard={victim}", "data.parquet"))
    before = {k: os.path.getmtime(
        os.path.join(out, f"shard={k}", "data.parquet"))
        for k in man1["shard"].to_pylist() if k != victim}
    man2 = write_hash_shards(rd.from_arrow(t), "id", out, 4)
    # full manifest restored, surviving shards untouched
    assert man2.equals(man1)
    for k, mt in before.items():
        assert os.path.getmtime(
            os.path.join(out, f"shard={k}", "data.parquet")) == mt

"""Arrow IPC / Feather ingestion (sources/io.read_table format='arrow')
— Ray 2.49 has no IPC reader, so the engine builds one with record-batch-
level parallel reads off memory maps."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import ipc as paipc

from rho_contracts_ray.sources.io import read_table


def _write_ipc(path, t, rows_per_batch=100):
    with paipc.new_file(str(path), t.schema) as w:
        for i in range(0, t.num_rows, rows_per_batch):
            w.write_table(t.slice(i, rows_per_batch))


def _arrow_dir(tmp_path, t):
    d = tmp_path / "arrow"
    d.mkdir()
    half = t.num_rows // 2
    _write_ipc(d / "a.arrow", t.slice(0, half))
    _write_ipc(d / "b.feather", t.slice(half))
    return str(d)


def test_arrow_roundtrip_and_pruning(ray_session, tmp_path):
    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    d = _arrow_dir(tmp_path, t)
    ds = read_table(d)                       # sniffed from .arrow/.feather
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = t.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got.equals(ref[got.columns])
    # column pruning applied in-task
    pruned = read_table(d, columns=["event_id", "value"])
    assert set(pruned.schema().names) == {"event_id", "value"}
    assert pruned.count() == t.num_rows
    # record-batch fan-out actually happened (>1 block per file)
    assert ds.materialize().num_blocks() > 2


def test_arrow_many_batches_share_one_reader_per_task(ray_session, tmp_path,
                                                      monkeypatch):
    """When the block cap packs many record batches of the same file into
    one task, the grouped reader (one memory map + footer parse per file
    per task — the r4 advisor fd-churn fix) must still return every batch
    exactly once, in correct content."""
    import os

    import ray

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    d = tmp_path / "many"
    d.mkdir()
    _write_ipc(d / "x.arrow", t, rows_per_batch=10)   # 100 batches
    # the cap sizes from the cluster CPU count (fallback cpu_count);
    # pin both so the test gets exactly 4 blocks
    monkeypatch.setattr(ray, "cluster_resources", lambda: {})
    monkeypatch.setattr(os, "cpu_count", lambda: 1)   # cap -> 4 blocks
    ds = read_table(str(d))
    m = ds.materialize()
    assert m.num_blocks() <= 4                        # grouping engaged
    got = m.to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = t.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got.equals(ref[got.columns])


def test_arrow_zero_batch_file_keeps_schema(ray_session, tmp_path):
    t = pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.string())})
    p = tmp_path / "empty.arrow"
    with paipc.new_file(str(p), t.schema):
        pass                                  # footer only, zero batches
    ds = read_table(str(p))
    assert ds.schema().names == ["a", "b"]
    assert ds.count() == 0
    pruned = read_table(str(p), columns=["b"])
    assert pruned.schema().names == ["b"]


def test_arrow_suite_end_to_end(ray_session, tmp_path):
    """The flagship suite accepts an .arrow corpus directly and agrees
    with the parquet run on the same rows."""
    from rho_contracts_ray.pipelines import run_suite
    from rho_contracts_ray.sources import write_repo_files

    corpus = str(tmp_path / "pq")
    write_repo_files(corpus, n_rows=1000, n_shards=2)
    ref = run_suite(corpus)

    d = tmp_path / "ipc"
    d.mkdir()
    import glob
    import os
    for i, f in enumerate(sorted(glob.glob(os.path.join(corpus,
                                                        "*.parquet")))):
        _write_ipc(d / f"part-{i}.arrow", pq.read_table(f))
    got = run_suite(read_table(str(d)))
    for k in ("rows", "contract_violations", "duplicate_keys",
              "sha256_rollup"):
        assert got[k] == ref[k], k

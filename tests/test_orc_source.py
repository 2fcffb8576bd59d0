"""ORC ingestion (sources/io.read_table format='orc') — Ray 2.49 has no
read_orc, so the engine builds one with stripe-level parallel reads."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import orc as paorc

from rho_contracts_ray.sources.io import read_table


def _orc_dir(tmp_path, t):
    d = tmp_path / "orc"
    d.mkdir()
    half = t.num_rows // 2
    # small stripes force multi-stripe files -> real stripe fan-out
    paorc.write_table(t.slice(0, half), str(d / "a.orc"),
                      stripe_size=4096)
    paorc.write_table(t.slice(half), str(d / "b.orc"), stripe_size=4096)
    return str(d)


def test_orc_roundtrip_and_pruning(ray_session, tmp_path):
    base = pq.read_table("/root/testdata/sf0.001/events.parquet")
    # replicate past the writer's 1024-row stripe batch so each file
    # holds many stripes (event_id made unique again for the sort key)
    t = pa.concat_tables([base] * 8)
    t = t.set_column(0, "event_id",
                     pa.array(range(t.num_rows), pa.int64()))
    d = _orc_dir(tmp_path, t)
    ds = read_table(d)                       # sniffed from .orc
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = t.to_pandas().sort_values("event_id").reset_index(drop=True)
    # ORC stores timestamps at ns resolution (parquet side was us) —
    # values identical, dtype unit differs
    got["ts"] = got["ts"].astype("datetime64[ns]")
    ref["ts"] = ref["ts"].astype("datetime64[ns]")
    assert got.equals(ref[got.columns])
    # column pruning pushed into the stripe read
    pruned = read_table(d, columns=["event_id", "value"])
    assert set(pruned.schema().names) == {"event_id", "value"}
    assert pruned.count() == t.num_rows
    # stripe fan-out actually happened (more than one block per file)
    assert ds.materialize().num_blocks() > 2


def test_orc_mixed_dir_refuses(tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    t = pa.table({"x": [1]})
    paorc.write_table(t, str(d / "a.orc"))
    pq.write_table(t, str(d / "b.parquet"))
    try:
        read_table(str(d))
        raise AssertionError("expected ValueError on mixed dir")
    except ValueError:
        pass

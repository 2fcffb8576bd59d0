"""Empty-input safety for the newest driver queries: every query must
return its typed zero-row output (never crash, never lose the schema)
when the underlying table has no rows."""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([], pa.int64()),
        "o_custkey": pa.array([], pa.int64()),
        "o_orderstatus": pa.array([], pa.string()),
        "o_totalprice": pa.array([], pa.float64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
        "o_orderpriority": pa.array([], pa.string())}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string())}),
        os.path.join(d, "events.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}),
        os.path.join(d, "documents.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([], pa.int64()),
        "l_partkey": pa.array([], pa.int64()),
        "l_suppkey": pa.array([], pa.int64()),
        "l_quantity": pa.array([], pa.float64()),
        "l_extendedprice": pa.array([], pa.float64()),
        "l_discount": pa.array([], pa.float64()),
        "l_returnflag": pa.array([], pa.string()),
        "l_shipdate": pa.array([], pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))
    return str(d)


def _as_table(res):
    if isinstance(res, pa.Table):
        return res
    parts = [b for b in res.iter_batches(batch_size=None,
                                         batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else pa.table({})


@pytest.mark.parametrize("name,cols", [
    ("ztest_longdoc_sources",
     ["source_a", "source_b", "n_a", "n_b", "p_a", "p_b", "z"]),
    ("rfm_segments_customers", ["r_q", "f_q", "m_q", "n_customers"]),
    ("bounce_rate_events", ["n_sessions", "n_bounce", "bounce_rate"]),
    ("basket_lift_parts", ["part_a", "part_b", "n_ab", "support", "lift"]),
])
def test_new_queries_empty_input(name, cols, empty_sf, ray_session):
    import __ray_entry__ as e

    t = _as_table(e.queries()[name](empty_sf))
    # the schema must survive empty input UNCONDITIONALLY (the failure
    # mode is a schemaless pa.table({}) leaking out)
    assert set(cols) <= set(t.column_names), (name, t.column_names)
    # single-summary-row queries legitimately emit one all-zero row;
    # everything else must be zero rows
    if t.num_rows:
        assert name == "bounce_rate_events"
        assert t["n_sessions"][0].as_py() == 0

"""TPC-H composite robustness: zero-row inputs must produce schema-stable
empty (or zero-valued scalar) results, and results must be invariant to
the input's block layout.  Value correctness vs DuckDB is covered by
tests/test_entry_oracle.py (q7..q22 entries)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rho_contracts_ray.pipelines import tpch

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Every table with its real schema and zero rows."""
    d = tmp_path_factory.mktemp("tpch_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    return str(d)


@pytest.mark.parametrize("fn,scalar", [
    (tpch.q7_nation_volume, False),
    (tpch.q8_market_share, False),
    (tpch.q9_profit, False),
    (tpch.q13_customer_distribution, False),
    (tpch.q15_top_supplier, False),
    (tpch.q16_supplier_cnt, False),
    (tpch.q17_small_qty_revenue, True),
    (tpch.q19_banded_revenue, True),
    (tpch.q22_dormant_customers, False),
    (tpch.q2_min_cost_supplier, False),
    (tpch.q11_important_parts, False),
    (tpch.q12_priority_shipping, False),
    (tpch.q20_dominant_suppliers, False),
    (tpch.q21_waiting_suppliers, False),
])
def test_empty_inputs(fn, scalar, empty_sf, ray_session):
    out = fn(empty_sf)
    assert isinstance(out, pa.Table)
    if scalar:
        assert out.num_rows == 1     # single zero-valued aggregate row
    else:
        assert out.num_rows == 0
    assert out.num_columns >= 1      # schema survives emptiness


def test_q7_block_layout_invariance(ray_session, tmp_path):
    """Same rows split across many small parquet row groups -> identical
    result (the exchange must not depend on batch boundaries)."""
    import ray.data as rd

    base = tpch.q7_nation_volume(SF)

    d = tmp_path / "resharded"
    d.mkdir()
    for t in TABLES:
        tab = pq.read_table(f"{SF}/{t}.parquet")
        pq.write_table(tab, d / f"{t}.parquet",
                       row_group_size=max(1, tab.num_rows // 7))
    again = tpch.q7_nation_volume(str(d))
    assert base.equals(again)


def test_q21_block_layout_invariance(ray_session, tmp_path):
    """q21's per-order exists/not-exists logic must see identical results
    whatever the block boundaries — partial (orderkey, suppkey, max) rows
    recombine inside the exchange."""
    base = tpch.q21_waiting_suppliers(SF)

    d = tmp_path / "resharded21"
    d.mkdir()
    for t in TABLES:
        tab = pq.read_table(f"{SF}/{t}.parquet")
        pq.write_table(tab, d / f"{t}.parquet",
                       row_group_size=max(1, tab.num_rows // 7))
    again = tpch.q21_waiting_suppliers(str(d))
    assert base.equals(again)


def test_q13_counts_are_exact(ray_session):
    """q13 at sf0.001 vs a local pyarrow recount (integer arithmetic —
    exact regardless of partials/exchange order)."""
    import collections

    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_orderpriority"])
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
    cnt = collections.Counter()
    for k, p in zip(orders["o_custkey"].to_pylist(),
                    orders["o_orderpriority"].to_pylist()):
        if p != "1-URGENT":
            cnt[k] += 1
    per_cust = [cnt.get(k, 0) for k in cust["c_custkey"].to_pylist()]
    want = collections.Counter(per_cust)

    got = tpch.q13_customer_distribution(SF)
    got_map = dict(zip(got["c_count"].to_pylist(),
                       got["custdist"].to_pylist()))
    assert got_map == dict(want)

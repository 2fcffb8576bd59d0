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


def _write(d, name, table):
    pq.write_table(table, d / f"{name}.parquet")


def test_q2_keeps_min_cost_ties(ray_session, tmp_path):
    """Two suppliers at the exactly-equal minimum cost for a part must BOTH
    survive the correlated-min filter (TPC-H Q2 returns all tied rows)."""
    import numpy as np

    d = tmp_path / "q2tie"
    d.mkdir()
    _write(d, "region", pa.table({"r_regionkey": pa.array([0], pa.int64()),
                                  "r_name": ["EUROPE"]}))
    _write(d, "nation", pa.table({"n_nationkey": pa.array([0], pa.int64()),
                                  "n_name": ["N0"],
                                  "n_regionkey": pa.array([0], pa.int64())}))
    _write(d, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([0, 0, 0], pa.int64()),
        "s_name": ["S1", "S2", "S3"],
        "s_acctbal": pa.array([10.0, 20.0, 30.0])}))
    _write(d, "part", pa.table({
        "p_partkey": pa.array([10], pa.int64()),
        "p_type": ["ECONOMY"], "p_size": pa.array([5], pa.int64())}))
    # supp 1 and 2 tie at unit cost 2.0; supp 3 costs 3.0
    _write(d, "lineitem", pa.table({
        "l_partkey": pa.array([10, 10, 10], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([4.0, 8.0, 9.0]),
        "l_quantity": pa.array([2.0, 4.0, 3.0])}))

    out = tpch.q2_min_cost_supplier(str(d))
    assert sorted(out["s_name"].to_pylist()) == ["S1", "S2"]
    assert np.allclose(out["cost"].to_pylist(), [2.0, 2.0])


def test_q21_unique_latest_shipper_semantics(ray_session, tmp_path):
    """Order 1: supplier 1 is the unique latest of two -> counts.  Order 2:
    both suppliers tie at the final date -> nobody counts.  Order 3: single
    supplier -> excluded.  Order 4: non-'F' status -> excluded."""
    d = tmp_path / "q21sem"
    d.mkdir()

    def ts(day):
        import numpy as np
        return np.datetime64(day, "us")

    _write(d, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderstatus": ["F", "F", "F", "O"]}))
    _write(d, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 1, 2, 1], pa.int64()),
        "l_shipdate": pa.array([ts("2020-01-05"), ts("2020-01-03"),
                                ts("2020-01-05"), ts("2020-01-05"),
                                ts("2020-01-09"), ts("2020-01-09"),
                                ts("2020-01-02")], pa.timestamp("us"))}))
    _write(d, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": ["S1", "S2"]}))

    out = tpch.q21_waiting_suppliers(str(d))
    assert out.to_pylist() == [{"s_name": "S1", "numwait": 1}]


def test_q21_property_random_corpora(ray_session, tmp_path):
    """Differential: q21's unique-latest-shipper logic vs DuckDB on
    random micro-corpora — tie-dates, single-supplier orders, random
    status mixes, orders with no lineitems, suppliers spanning many
    orders."""
    import duckdb
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()
    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(
        n_li=st.integers(min_value=0, max_value=400),
        n_orders=st.integers(min_value=1, max_value=60),
        n_supp=st.integers(min_value=1, max_value=8),
        n_days=st.sampled_from([2, 30]),       # 2 => massive date ties
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n_li, n_orders, n_supp, n_days, seed):
        rng = np.random.RandomState(seed)
        d = tmp_path / f"q21prop{counter[0]}"
        counter[0] += 1
        d.mkdir()
        base = np.datetime64("2020-01-01", "us")
        li = pa.table({
            "l_orderkey": pa.array(
                rng.randint(1, n_orders + 1, n_li).astype(np.int64)),
            "l_suppkey": pa.array(
                rng.randint(1, n_supp + 1, n_li).astype(np.int64)),
            "l_shipdate": pa.array(
                base + rng.randint(0, n_days, n_li)
                .astype("timedelta64[D]").astype("timedelta64[us]")),
        })
        orders = pa.table({
            "o_orderkey": pa.array(np.arange(1, n_orders + 1, dtype=np.int64)),
            "o_orderstatus": pa.array(
                rng.choice(["F", "O", "P"], n_orders)),
        })
        supp = pa.table({
            "s_suppkey": pa.array(np.arange(1, n_supp + 1, dtype=np.int64)),
            "s_name": pa.array([f"S{i}" for i in range(1, n_supp + 1)]),
        })
        for name, t in (("lineitem", li), ("orders", orders),
                        ("supplier", supp)):
            pq.write_table(t, d / f"{name}.parquet")

        got = tpch.q21_waiting_suppliers(str(d)).to_pylist()

        con.register("lineitem", li)
        con.register("orders", orders)
        con.register("supplier", supp)
        want = con.execute(
            "WITH f AS (SELECT o_orderkey FROM orders "
            "WHERE o_orderstatus = 'F'), "
            "p AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS md "
            "FROM lineitem JOIN f ON l_orderkey = o_orderkey "
            "GROUP BY 1, 2), "
            "s AS (SELECT l_orderkey, max(md) AS omax, count(*) AS nsupp "
            "FROM p GROUP BY 1), "
            "c AS (SELECT p.l_orderkey, count(*) AS at_max FROM p "
            "JOIN s USING (l_orderkey) WHERE p.md = s.omax GROUP BY 1), "
            "w AS (SELECT p.l_orderkey, p.l_suppkey FROM p "
            "JOIN s USING (l_orderkey) JOIN c USING (l_orderkey) "
            "WHERE s.nsupp >= 2 AND p.md = s.omax AND c.at_max = 1) "
            "SELECT s_name, count(*)::BIGINT AS numwait "
            "FROM w JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
        ).arrow().to_pylist()
        assert got == want

    check()


def test_q2_property_random_corpora(ray_session, tmp_path):
    """Differential: q2's per-part correlated minimum (with ties kept)
    vs DuckDB on random micro-corpora — duplicate (part, supp) lineitems,
    cost ties across suppliers, parts outside the selection, suppliers
    outside the region."""
    import duckdb
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()
    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(
        n_li=st.integers(min_value=0, max_value=300),
        n_parts=st.integers(min_value=1, max_value=20),
        n_supp=st.integers(min_value=1, max_value=10),
        price_spread=st.sampled_from([2, 50]),   # 2 => many cost ties
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n_li, n_parts, n_supp, price_spread, seed):
        rng = np.random.RandomState(seed)
        d = tmp_path / f"q2prop{counter[0]}"
        counter[0] += 1
        d.mkdir()
        part = pa.table({
            "p_partkey": pa.array(np.arange(1, n_parts + 1,
                                            dtype=np.int64)),
            "p_type": pa.array(rng.choice(["ECONOMY", "LARGE"], n_parts)),
            "p_size": pa.array(rng.randint(1, 21, n_parts)
                               .astype(np.int64)),
        })
        nat = rng.randint(0, 4, n_supp).astype(np.int64)
        supp = pa.table({
            "s_suppkey": pa.array(np.arange(1, n_supp + 1,
                                            dtype=np.int64)),
            "s_nationkey": pa.array(nat),
            "s_name": pa.array([f"S{i}" for i in range(1, n_supp + 1)]),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-100, 100, n_supp), 2)),
        })
        nation = pa.table({
            "n_nationkey": pa.array(np.arange(4, dtype=np.int64)),
            "n_name": pa.array([f"N{i}" for i in range(4)]),
            "n_regionkey": pa.array(np.array([0, 0, 1, 1], np.int64)),
        })
        region = pa.table({
            "r_regionkey": pa.array(np.array([0, 1], np.int64)),
            "r_name": pa.array(["EUROPE", "ASIA"]),
        })
        qty = rng.randint(1, 5, n_li).astype(np.float64)
        li = pa.table({
            "l_partkey": pa.array(rng.randint(1, n_parts + 1, n_li)
                                  .astype(np.int64)),
            "l_suppkey": pa.array(rng.randint(1, n_supp + 1, n_li)
                                  .astype(np.int64)),
            "l_extendedprice": pa.array(
                qty * rng.randint(1, price_spread + 1, n_li)),
            "l_quantity": pa.array(qty),
        })
        for name, t in (("part", part), ("supplier", supp),
                        ("nation", nation), ("region", region),
                        ("lineitem", li)):
            pq.write_table(t, d / f"{name}.parquet")

        got = tpch.q2_min_cost_supplier(str(d)).to_pylist()

        for name, t in (("part", part), ("supplier", supp),
                        ("nation", nation), ("region", region),
                        ("lineitem", li)):
            con.register(name, t)
        want = con.execute(
            "WITH cost AS (SELECT l_partkey, l_suppkey, "
            "min(l_extendedprice / l_quantity) AS cost "
            "FROM lineitem GROUP BY 1, 2), "
            "sel AS (SELECT p_partkey FROM part "
            "WHERE p_type = 'ECONOMY' AND p_size <= 10), "
            "rs AS (SELECT s_suppkey, s_acctbal, s_name, n_name "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE'), "
            "c2 AS (SELECT cost.l_partkey AS p_partkey, cost.cost, "
            "rs.s_acctbal, rs.s_name, rs.n_name "
            "FROM cost JOIN sel ON cost.l_partkey = sel.p_partkey "
            "JOIN rs ON cost.l_suppkey = rs.s_suppkey) "
            "SELECT s_acctbal, s_name, n_name, p_partkey, cost FROM c2 "
            "WHERE cost = (SELECT min(cost) FROM c2 x "
            "WHERE x.p_partkey = c2.p_partkey) "
            "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey "
            "LIMIT 100"
        ).arrow().to_pylist()
        assert got == want

    check()


def test_q7_q9_exchange_path_matches_broadcast(ray_session, monkeypatch):
    """The adaptive small-side broadcast must be a pure plan change:
    forcing the bucketed-exchange fallback (threshold 0) yields
    byte-identical tables."""
    from rho_contracts_ray.pipelines.tpch import (
        q7_nation_volume, q9_profit, q12_priority_shipping,
        q21_waiting_suppliers)

    sf = "/root/testdata/sf0.001"

    def all_four():
        return {"q7": q7_nation_volume(sf), "q9": q9_profit(sf),
                "q12": q12_priority_shipping(sf),
                "q21": q21_waiting_suppliers(sf)}

    bcast = all_four()
    monkeypatch.setenv("RHO_TPCH_BCAST_ROWS", "0")
    exch = all_four()
    for k in bcast:
        assert bcast[k].equals(exch[k]), k

"""Changeset apply (stages/upsert.py): MERGE semantics — delete, update,
insert, update-of-missing-key-as-insert — plus schema validation and the
sf0.01 oracle parity through the driver query."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rho_contracts_ray.stages.upsert import apply_changeset


def _base():
    return rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"], pa.string())})).repartition(2)


def _apply(changes, **kw):
    ch = rd.from_arrow(pa.table({
        "k": pa.array([c[0] for c in changes], pa.int64()),
        "v": pa.array([c[1] for c in changes], pa.string()),
        "op": pa.array([c[2] for c in changes], pa.string())}))
    out = apply_changeset(_base(), ch, "k", **kw).to_pandas()
    return dict(zip(out["k"], out["v"]))


def test_delete_update_insert(ray_session):
    got = _apply([(2, "b", "D"), (3, "C", "U"), (9, "i", "I")])
    assert got == {1: "a", 3: "C", 4: "d", 9: "i"}


def test_update_missing_key_inserts(ray_session):
    assert _apply([(7, "x", "U")]) == {1: "a", 2: "b", 3: "c", 4: "d",
                                       7: "x"}


def test_delete_missing_key_noop(ray_session):
    assert _apply([(7, "x", "D")]) == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_empty_changeset(ray_session):
    ch = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.string()),
                                 "op": pa.array([], pa.string())}))
    out = apply_changeset(_base(), ch, "k")
    assert out.count() == 4
    assert out.schema().names == ["k", "v"]


def test_missing_columns_raise(ray_session):
    ch = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                 "op": pa.array(["D"], pa.string())}))
    with pytest.raises(Exception, match="lacks base columns"):
        apply_changeset(_base(), ch, "k").materialize()


def test_bad_key_raises(ray_session):
    with pytest.raises(ValueError, match="not in base"):
        apply_changeset(_base(), _base(), "nope")


def test_driver_query_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.01"
    got = entrymod.queries()["upsert_orders"](sf).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf}/orders.parquet')")
    want = con.sql(entrymod.oracle_sql()["upsert_orders"]).df() \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])


def test_apply_changeset_rejects_bad_ops(ray_session):
    import pytest

    from rho_contracts_ray.stages.upsert import apply_changeset

    base = pa.table({"k": pa.array([1], pa.int64()),
                     "v": pa.array([1.0])})
    for bad in ("d", None):
        ch = pa.table({"k": pa.array([1], pa.int64()),
                       "v": pa.array([2.0]),
                       "op": pa.array([bad], pa.string())})
        with pytest.raises(Exception, match="op"):
            apply_changeset(rd.from_arrow(base), rd.from_arrow(ch),
                            "k").materialize()

"""Constraint suggestion (constraints/suggest.py): profile stats, domain
capping, the suggestion string, and the Deequ-style roundtrip — the
suggested contract validates the profiled snapshot violation-free and
catches planted regressions on the next one.  (Bit-exact SQL-oracle
parity for the full profile runs in tests/test_entry_oracle.py via the
`suggest_constraints_*` driver queries.)"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from rho_contracts_ray.constraints.suggest import (
    PROFILE_SCHEMA, suggest_constraints, suggested_contract)


def _ds(table: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(table).repartition(blocks)


@pytest.fixture
def sample():
    return pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "price": pa.array([1.5, 2.0, None, 4.0, 0.0, 9.25], pa.float64()),
        "whole": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
        "flag": pa.array(["A", "B", "A", None, "B", "A"], pa.string()),
        "wide": pa.array([f"v{i}" for i in range(6)], pa.string()),
        "ts": pa.array([1_000_000 * i for i in range(6)],
                       pa.timestamp("us")),
    })


def test_profile_stats_and_suggestions(ray_session, sample):
    prof = suggest_constraints(_ds(sample), domain_cap=3)
    assert prof.schema.equals(PROFILE_SCHEMA)
    rows = {r["column"]: r for r in prof.to_pylist()}
    assert list(rows) == sorted(rows)   # sorted by column name

    k = rows["k"]
    assert (k["dtype"], k["n_rows"], k["n_null"]) == ("int64", 6, 0)
    assert (k["min_num"], k["max_num"]) == (1.0, 6.0)
    assert k["completeness_bp"] == 10000
    assert k["suggestions"] == "hasType:int64; complete; nonNegative"

    price = rows["price"]
    assert price["n_null"] == 1
    assert price["completeness_bp"] == (5 * 10000) // 6
    assert price["all_int"] == 0
    assert "complete" not in price["suggestions"]
    assert "integerValued" not in price["suggestions"]

    whole = rows["whole"]
    assert whole["all_int"] == 1
    assert whole["suggestions"] == \
        "hasType:double; complete; nonNegative; integerValued"

    flag = rows["flag"]
    assert flag["domain"] == "A|B"
    assert flag["n_distinct_capped"] == 2
    assert flag["min_str"] == "A" and flag["max_str"] == "B"
    assert flag["suggestions"] == "hasType:string; inSet:A|B"

    wide = rows["wide"]                 # 6 distinct > cap 3
    assert wide["domain"] is None and wide["n_distinct_capped"] is None
    assert "inSet" not in wide["suggestions"]

    ts = rows["ts"]
    assert ts["dtype"] == "timestamp"
    assert ts["min_num"] == 0.0 and ts["max_num"] == 5_000_000.0
    assert ts["suggestions"] == "hasType:timestamp; complete"


def test_domain_cap_sticky_across_batches(ray_session):
    # each 1-row batch is under the cap; only the MERGED domain exceeds
    # it — the union must still overflow to null
    t = pa.table({"s": pa.array([f"x{i}" for i in range(8)], pa.string())})
    prof = suggest_constraints(_ds(t, blocks=8), domain_cap=3)
    r = prof.to_pylist()[0]
    assert r["domain"] is None


def test_empty_input_emits_schema_rows(ray_session):
    t = pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.string())})
    # no repartition: an all-to-all op on an EMPTY dataset drops the
    # schema entirely (suggest then raises — covered below)
    prof = suggest_constraints(ray.data.from_arrow(t))
    rows = {r["column"]: r for r in prof.to_pylist()}
    assert set(rows) == {"a", "b"}
    a = rows["a"]
    assert a["n_rows"] == 0 and a["completeness_bp"] is None
    assert a["min_num"] is None and a["all_int"] is None
    assert a["suggestions"] == "hasType:int64"
    assert rows["b"]["suggestions"] == "hasType:string"


def test_unknown_column_raises(ray_session, sample):
    with pytest.raises(ValueError, match="not in"):
        suggest_constraints(_ds(sample), ["k", "nope"])


def test_schemaless_empty_input_raises(ray_session):
    t = pa.table({"a": pa.array([], pa.int64())})
    with pytest.raises(ValueError, match="no schema"):
        suggest_constraints(ray.data.from_arrow(t).repartition(2))


def test_suggested_contract_roundtrip(ray_session, sample):
    """The Deequ loop: infer on snapshot A -> zero violations on A;
    planted regressions in snapshot B are each caught."""
    from rho_contracts_ray import validate

    prof = suggest_constraints(_ds(sample), domain_cap=3)
    con = suggested_contract(prof)
    rep = validate(_ds(sample), con, name="sample")
    assert rep.summary()["violations"] == 0

    bad = sample.to_pydict()
    bad["k"][0] = None            # breaks `complete`
    bad["whole"][1] = 2.5         # breaks `integerValued`
    bad["flag"][2] = "Z"          # breaks `inSet:A|B`
    bad["price"][3] = -1.0        # breaks `nonNegative`
    snapshot_b = pa.Table.from_pydict(bad, schema=sample.schema)
    rep_b = validate(_ds(snapshot_b), con, name="sample")
    assert rep_b.summary()["violations"] == 4


def test_profile_matches_single_block(ray_session, sample):
    """Partial merge is exact: 1-block and 6-block runs agree."""
    one = suggest_constraints(_ds(sample, blocks=1), domain_cap=3)
    six = suggest_constraints(_ds(sample, blocks=6), domain_cap=3)
    assert one.equals(six)


def test_or_branch_coverage(ray_session):
    """First-match vs any-match branch counts, null rejection, and the
    non-or guard (validate.or_branch_coverage)."""
    import pyarrow as pa

    from rho_contracts_ray import c
    from rho_contracts_ray.validate import or_branch_coverage

    t = pa.table({"v": pa.array(["a", "ab", "b", None, "a"], pa.string())})
    con = c.or_(c.value("a"), c.matches("a"), c.string)
    out = or_branch_coverage(ray.data.from_arrow(t).repartition(2),
                             con, "v").to_pylist()
    rows = {r["branch"]: r for r in out}
    assert rows[-1]["branch_str"] == "<no branch>"
    assert rows[-1]["n_first"] == 1            # the null
    assert (rows[0]["n_first"], rows[0]["n_any"]) == (2, 2)   # 'a' x2
    assert (rows[1]["n_first"], rows[1]["n_any"]) == (1, 3)   # 'ab'
    assert (rows[2]["n_first"], rows[2]["n_any"]) == (1, 4)   # 'b'

    with pytest.raises(ValueError, match="or_"):
        or_branch_coverage(ray.data.from_arrow(t), c.string, "v")

    empty = or_branch_coverage(ray.data.from_arrow(
        pa.table({"v": pa.array([], pa.string())})), con, "v")
    assert empty["n_first"].to_pylist() == [0, 0, 0, 0]


def test_field_violation_breakdown(ray_session):
    """Per-field counts + the <row> total equal to validate()'s count."""
    import pyarrow as pa

    from rho_contracts_ray import c, validate
    from rho_contracts_ray.validate import field_violation_breakdown

    t = pa.table({
        "a": pa.array([1, None, 3, 2.5], pa.float64()),
        "b": pa.array(["x", "y", None, "x"], pa.string()),
    })
    con = c.object({"a": c.integer, "b": c.string})
    ds = ray.data.from_arrow(t).repartition(2)
    out = {r["field"]: r for r in
           field_violation_breakdown(ds, con).to_pylist()}
    assert out["a"]["n_violations"] == 2      # null + 2.5
    assert out["b"]["n_violations"] == 1      # null
    assert out["a"]["n_rows"] == 4
    rep = validate(ray.data.from_arrow(t), con, name="t")
    assert out["<row>"]["n_violations"] == rep.summary()["violations"] == 3
    assert out["<row>"]["contract_str"] == con.to_string()

    # missing declared column: optional passes, required fails all rows
    t2 = pa.table({"a": pa.array([1.0, 2.0], pa.float64())})
    con2 = c.object({"a": c.number, "b": c.string,
                     "o": c.optional(c.string)})
    out2 = {r["field"]: r for r in field_violation_breakdown(
        ray.data.from_arrow(t2), con2).to_pylist()}
    assert out2["b"]["n_violations"] == 2
    assert out2["o"]["n_violations"] == 0

    with pytest.raises(ValueError, match="object"):
        field_violation_breakdown(ds, c.string)


def test_or_branch_coverage_column_check(ray_session):
    import pyarrow as pa

    from rho_contracts_ray import c
    from rho_contracts_ray.validate import or_branch_coverage

    t = pa.table({"v": pa.array(["a"], pa.string())})
    con = c.or_(c.value("a"), c.string)
    with pytest.raises(ValueError, match="typo"):
        or_branch_coverage(ray.data.from_arrow(t), con, "typo")


def test_profile_drift(ray_session, sample):
    """Rule-level drift: added/removed columns, dtype and rule changes;
    identical profiles drift empty."""
    from rho_contracts_ray.constraints.suggest import (profile_drift,
                                                       suggest_constraints)

    p1 = suggest_constraints(_ds(sample), domain_cap=3)
    assert profile_drift(p1, p1).num_rows == 0

    bad = sample.to_pydict()
    bad["k"][0] = None                 # k loses `complete`
    bad["flag"][0] = "C"               # flag domain grows A|B -> A|B|C
    t2 = pa.Table.from_pydict(bad, schema=sample.schema) \
        .drop_columns(["ts"])          # ts removed
    t2 = t2.append_column("new", pa.array([1.0] * 6, pa.float64()))
    p2 = suggest_constraints(_ds(t2), domain_cap=3)
    d = {(r["column"], r["change"]): r
         for r in profile_drift(p1, p2).to_pylist()}
    assert ("ts", "removed") in d
    assert ("new", "added") in d
    assert "complete" in d[("k", "rules")]["before"]
    assert "complete" not in d[("k", "rules")]["after"]
    assert d[("flag", "rules")]["after"].endswith("inSet:A|B|C")

    import pytest as _pytest
    with _pytest.raises(ValueError, match="lacks"):
        profile_drift(p1, pa.table({"column": pa.array(["x"])}))


def test_suggest_grouped(ray_session):
    """Per-group rules the global profile misses; null group; cap;
    high-cardinality guard."""
    from rho_contracts_ray.constraints.suggest import (
        suggest_constraints_grouped)

    t = pa.table({
        "g": pa.array(["a", "a", "b", "b", None], pa.string()),
        "x": pa.array([1.0, 2.0, None, 4.0, 5.0], pa.float64()),
        "s": pa.array(["p", "q", "p", "p", "r"], pa.string()),
    })
    out = suggest_constraints_grouped(_ds(t, 2), "g", domain_cap=3)
    rows = {(r["grp"], r["column"]): r for r in out.to_pylist()}
    # x complete in group a, nullable in group b — invisible globally
    assert "complete" in rows[("a", "x")]["suggestions"]
    assert "complete" not in rows[("b", "x")]["suggestions"]
    assert rows[("b", "x")]["completeness_bp"] == 5000
    assert rows[("a", "s")]["domain"] == "p|q"
    assert rows[("b", "s")]["domain"] == "p"
    assert rows[(None, "s")]["domain"] == "r"        # null group kept

    big = pa.table({
        "g": pa.array([str(i) for i in range(50)], pa.string()),
        "x": pa.array([1.0] * 50, pa.float64()),
    })
    ok = suggest_constraints_grouped(_ds(big, 2), "g")
    assert ok.num_rows == 50

    with pytest.raises(ValueError, match="not in"):
        suggest_constraints_grouped(_ds(t, 2), "nope")


def test_filter_valid_quarantine(ray_session, tmp_path):
    """One-pass dead-letter split: valid rows forward, failing rows land
    in the quarantine dir, counts add up, retries cannot duplicate."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rho_contracts_ray import c
    from rho_contracts_ray.validate import filter_valid_quarantine

    t = pa.table({
        "id": pa.array(list(range(100)), pa.int64()),
        "v": pa.array([float(i) if i % 7 else -1.0 for i in range(100)],
                      pa.float64()),
    })
    con = c.object({"v": c.pred(lambda x: x is not None and x >= 0)})
    qdir = str(tmp_path / "quarantine")
    good = filter_valid_quarantine(
        ray.data.from_arrow(t).repartition(4), con, qdir)
    good_rows = good.take_all()
    files = [f for f in os.listdir(qdir) if f.endswith(".parquet")]
    bad = pa.concat_tables([pq.read_table(os.path.join(qdir, f))
                            for f in files])
    assert len(good_rows) + bad.num_rows == 100
    assert all(r["v"] >= 0 for r in good_rows)
    assert set(bad["v"].to_pylist()) == {-1.0}
    assert sorted([r["id"] for r in good_rows]
                  + bad["id"].to_pylist()) == list(range(100))
    # non-empty dir refused (appends would duplicate rows)
    with pytest.raises(ValueError, match="not empty"):
        filter_valid_quarantine(ray.data.from_arrow(t), con, qdir)

    # two blocks with IDENTICAL failing rows but different good rows
    # must produce two distinct shards (hash covers the whole batch)
    t2a = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "v": pa.array([-1.0, 5.0], pa.float64())})
    t2b = pa.table({"id": pa.array([1, 3], pa.int64()),
                    "v": pa.array([-1.0, 7.0], pa.float64())})
    q2 = str(tmp_path / "q2")
    ds2 = ray.data.from_arrow(t2a).union(ray.data.from_arrow(t2b))
    good2 = filter_valid_quarantine(ds2, con, q2).take_all()
    files2 = [f for f in os.listdir(q2) if f.endswith(".parquet")]
    assert len(files2) == 2
    bad2 = pa.concat_tables([pq.read_table(os.path.join(q2, f))
                             for f in files2])
    assert len(good2) + bad2.num_rows == 4

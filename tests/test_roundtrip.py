"""SURVEY §5(3): from_example(t).validate(t) has zero violations — the
inference round-trip property, on every driver table."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from rho_contracts_ray import from_example, validate
from rho_contracts_ray.validate import arrow_rows_to_js

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.mark.parametrize("table", TABLES)
def test_from_example_roundtrip(table):
    t = pq.read_table(f"{SF}/{table}.parquet")
    # infer from the first row (timestamps/lists have no JS example analog
    # in fromExample — substitute per-type contracts like a user would)
    from rho_contracts_ray import c

    row = arrow_rows_to_js(t.slice(0, 1))[0]
    fields = {}
    for name, v in row.items():
        if hasattr(v, "isoformat"):
            fields[name] = c.date
        elif isinstance(v, list):
            fields[name] = c.array(c.number)
        else:
            fields[name] = from_example(v)
    contract = c.object(fields)
    rep = validate(t, contract, name=table)
    s = rep.summary()
    assert s["violations"] == 0, (table, rep.violations().to_pydict())
    assert s["rows"] == t.num_rows

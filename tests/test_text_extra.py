"""Extra text-stage coverage: group token-set Jaccard overlap."""

import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.text import group_token_jaccard


def test_group_token_jaccard_small(ray_session):
    t = pa.table({
        "src": ["a", "a", "b", "c", None],
        "text": ["x y z", "x  x", "y z", "w", "x y"],
    })
    for parts in (1, 3):
        out = group_token_jaccard(rd.from_arrow(t).repartition(parts),
                                  "src", "text")
        got = {(r["source_a"], r["source_b"]):
               (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
               for r in out.to_pylist()}
        # a={x,y,z}, b={y,z}, c={w}; null src dropped; c never co-occurs
        assert got == {("a", "b"): (2, 3, 2, 2 / 3)}


def test_group_token_jaccard_empty(ray_session):
    t = pa.table({"src": pa.array([], pa.string()),
                  "text": pa.array([], pa.string())})
    out = group_token_jaccard(rd.from_arrow(t), "src", "text")
    assert out.num_rows == 0
    assert out.column_names == ["source_a", "source_b", "n_common",
                                "n_a", "n_b", "jaccard"]


def test_classifier_stage_deterministic_and_actor_pool(ray_session):
    import numpy as np

    from rho_contracts_ray.stages.text import classify_quality

    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(
                      [f"Word{i} abc 123 XY z" * (i % 5) for i in range(40)])})
    a = classify_quality(rd.from_arrow(t).repartition(4), concurrency=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = classify_quality(rd.from_arrow(t), concurrency=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a.columns) == {"doc_id", "n_words", "mean_len_x1000",
                              "n_digits", "n_upper", "score", "keep"}
    assert ((a["score"] >= 0) & (a["score"] <= 1)).all()
    assert bool(((a["score"] >= 0.5) == a["keep"]).all())


def test_blocklist_scan_overlaps_nulls_and_slices(ray_session):
    from rho_contracts_ray.stages.text import blocklist_scan

    t = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["a table on a tab", None, "",
                          "aaa spark sparkspark", "tabtable"]),
    })
    for parts in (1, 3):
        out = blocklist_scan(rd.from_arrow(t).repartition(parts),
                             ["tab", "table", "aa", "spark"])
        got = {r["doc_id"]: (r["n_hits"], r["n_terms"], r["flagged"])
               for r in out.take_all()}
        # doc0: 'tab' x2 (standalone + inside 'table'), 'table' x1
        # doc3: 'aa' OVERLAPPING in 'aaa' = 2, 'spark' x3
        # doc4: 'tab' at 0 and 3, 'table' at 3 — nested matches count
        assert got == {0: (3, 2, True), 1: (0, 0, False),
                       2: (0, 0, False), 3: (5, 2, True),
                       4: (3, 2, True)}


def test_blocklist_scan_multibyte_and_empty(ray_session):
    from rho_contracts_ray.stages.text import blocklist_scan

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["héllo héé", "plain"])})
    out = blocklist_scan(rd.from_arrow(t), ["é", "hé"])
    got = {r["doc_id"]: (r["n_hits"], r["n_terms"])
           for r in out.take_all()}
    assert got == {0: (3 + 2, 2), 1: (0, 0)}

    e = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = blocklist_scan(rd.from_arrow(e), ["x"])
    assert out.count() == 0
    sch = out.schema()
    if sch is not None:   # Ray reports no schema when no block ran
        assert sch.names == ["doc_id", "n_hits", "n_terms", "flagged"]

    import pytest
    with pytest.raises(ValueError):
        blocklist_scan(rd.from_arrow(t), [])
    with pytest.raises(ValueError):
        blocklist_scan(rd.from_arrow(t), ["ok", ""])

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

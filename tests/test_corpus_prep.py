"""End-to-end training-data prep pipeline (contract gate -> quality ->
exact dedup -> near dedup)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from rho_contracts_ray.pipelines import prep_documents

SF = "/root/testdata/sf0.01"


def test_prep_documents_end_to_end(ray_session):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_pylist()
    nid = max(ids) + 1
    add_t, add_i = [], []
    add_t.append(texts[0]); add_i.append(nid); nid += 1      # exact dup
    w = texts[1].split(); w[0] = "MUT"
    add_t.append(" ".join(w)); add_i.append(nid); nid += 1   # near dup
    add_t.append(""); add_i.append(nid); nid += 1            # contract gate
    full = pa.table({
        "doc_id": pa.array(ids + add_i, pa.int64()),
        "text": pa.array(texts + add_t),
    })
    s = prep_documents(rd.from_arrow(full))
    kept = set(s["kept_ids"]["doc_id"].to_pylist())
    assert add_i[0] not in kept          # exact dup dropped
    assert add_i[1] not in kept          # near dup dropped
    assert add_i[2] not in kept          # empty text fails the contract gate
    assert 0 in kept and 1 in kept       # originals (smaller ids) kept
    assert s["kept_rows"] == len(kept)
    assert s["input_rows"] == len(ids) + 3
    assert s["dropped_exact_dups"] >= 1
    assert s["near_dup_clusters"] >= 1
    # determinism
    s2 = prep_documents(rd.from_arrow(full))
    assert set(s2["kept_ids"]["doc_id"].to_pylist()) == kept

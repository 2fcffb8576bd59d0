"""Exact duplicate-substring-span removal vs a true-string-equality DuckDB
oracle (the Ray path uses 128-bit gram hashes; the oracle uses the gram
strings themselves, so a hash false-positive would fail here)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rho_contracts_ray.stages.substring import remove_dup_spans

SF = "/root/testdata/sf0.01"


def _oracle(con, n: int, min_count: int) -> pd.DataFrame:
    return con.execute(f"""
        WITH toks AS (
          SELECT doc_id, string_split(coalesce(text,''), ' ') AS arr
          FROM documents),
        g AS (
          SELECT doc_id, i, array_to_string(arr[i : i+{n - 1}], ' ') AS gram
          FROM toks, UNNEST(range(1, len(arr)-{n - 2})) AS t(i)),
        dup AS (SELECT gram FROM g GROUP BY gram
                HAVING count(*) >= {min_count}),
        st AS (SELECT doc_id, i FROM g JOIN dup USING (gram)),
        tok AS (
          SELECT doc_id, i AS pos, arr[i] AS w
          FROM toks, UNNEST(range(1, len(arr)+1)) AS t(i)),
        cov AS (
          SELECT DISTINCT tok.doc_id, tok.pos
          FROM tok JOIN st ON st.doc_id = tok.doc_id
                          AND tok.pos BETWEEN st.i AND st.i + {n - 1}),
        kept AS (
          SELECT tok.doc_id, tok.pos, tok.w
          FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id
                                AND cov.pos = tok.pos
          WHERE cov.pos IS NULL)
        SELECT t.doc_id,
               coalesce(k.txt, '') AS text,
               coalesce(k.n_kept, 0)::BIGINT AS n_kept,
               (len(t.arr) - coalesce(k.n_kept, 0))::BIGINT AS n_dropped
        FROM toks t LEFT JOIN (
            SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS txt,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id) k USING (doc_id)
        ORDER BY doc_id
    """).df()


@pytest.mark.parametrize("n,min_count", [(5, 2), (3, 3)])
def test_dup_spans_vs_duckdb(ray_session, n, min_count):
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    got = remove_dup_spans(ds, n=n, min_count=min_count) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = _oracle(con, n, min_count).reset_index(drop=True)
    con.close()
    pd.testing.assert_frame_equal(got, want)
    # the op must be NONTRIVIAL on this corpus: some spans dropped, and
    # not everything dropped
    assert got["n_dropped"].sum() > 0
    assert got["n_kept"].sum() > 0
    assert len(got) == 500                      # one row per input doc


def test_dup_spans_table_path_matches_ds(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    local = remove_dup_spans(t, n=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ds = remove_dup_spans(rd.from_arrow(t), n=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(local, ds)


def test_dup_spans_within_one_doc():
    # a span repeated inside a SINGLE document counts toward min_count
    t = pa.table({"doc_id": [7], "text": ["p q r s p q r s z"]})
    out = remove_dup_spans(t, n=4, min_count=2).to_pylist()[0]
    assert out["text"] == "z"
    assert out["n_dropped"] == 8


def test_dup_spans_no_dups_identity():
    t = pa.table({"doc_id": [1, 2], "text": ["a b c", "d e f"]})
    out = remove_dup_spans(t, n=2, min_count=2)
    assert out["text"].to_pylist() == ["a b c", "d e f"]
    assert out["n_dropped"].to_pylist() == [0, 0]

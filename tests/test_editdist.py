"""Levenshtein fuzzy-dup pairs (stages/editdist.py): DP parity with
DuckDB's byte-based levenshtein(), lower-bound prune soundness, and the
meeting-block rule (pairs whose length blocks differ by <=1 appear
exactly once; by 2 never)."""

import random

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rho_contracts_ray.stages.editdist import (_gram_bag, _gram_sets,
                                               fuzzy_dup_pairs,
                                               levenshtein_bytes)


def test_levenshtein_vs_duckdb_random():
    con = duckdb.connect()
    rng = random.Random(7)
    alpha = "abcde éß漢"
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 30)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 30)))
        want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein_bytes(a.encode(), b.encode()) == want, (a, b)


def test_levenshtein_early_abandon_caps():
    assert levenshtein_bytes(b"a" * 50, b"b" * 50, 5) == 6
    assert levenshtein_bytes(b"", b"xyz", 2) == 3
    assert levenshtein_bytes(b"", b"xy", 2) == 2
    assert levenshtein_bytes(b"same", b"same", 0) == 0


def test_gram_bag_is_lower_bound():
    rng = random.Random(3)
    for _ in range(150):
        a = bytes(rng.randrange(97, 103) for _ in range(rng.randrange(4, 60)))
        b = bytearray(a)
        for _ in range(rng.randrange(0, 8)):   # random edits of a
            op = rng.randrange(3)
            pos = rng.randrange(max(1, len(b)))
            if op == 0 and b:
                del b[pos]
            elif op == 1:
                b.insert(pos, rng.randrange(97, 103))
            elif b:
                b[pos] = rng.randrange(97, 103)
        b = bytes(b)
        lev = levenshtein_bytes(a, b)
        gs = _gram_sets([a, b], np.array([0, 1]))
        assert _gram_bag(gs[0], gs[1]) <= 4 * lev
        # byte-bag bound too
        ha = np.bincount(np.frombuffer(a, np.uint8), minlength=256)
        hb = np.bincount(np.frombuffer(b, np.uint8), minlength=256)
        A = np.abs(ha - hb).sum()
        assert (A + abs(len(a) - len(b))) // 2 <= lev


def _pairs(rows, **kw):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "lang": pa.array([r[2] for r in rows], pa.string())})
    return fuzzy_dup_pairs(rd.from_arrow(t).repartition(4), **kw) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def test_meeting_block_rule(ray_session):
    # block=4: "aaaa" (len 4 -> block 1) vs "aaa" (len 3 -> block 0):
    # adjacent blocks, lev 1 -> exactly ONE pair.  "aaaaaaaaa" (block 2)
    # vs "aaa" (block 0): 2 apart -> excluded even though lev < k.
    rows = [(1, "aaa", "en"), (2, "aaaa", "en"), (3, "aaaaaaaaa", "en"),
            (4, "aaa", "fr"),            # other lang: no pair
            (5, None, "en"), (6, "aaa", None)]   # nulls drop
    got = _pairs(rows, k=10, block=4)
    assert list(map(tuple, got.itertuples(index=False))) == \
        [(1, 2, 1), (2, 3, 5)]


def test_same_block_pair_not_duplicated(ray_session):
    got = _pairs([(7, "abcd", "en"), (8, "abce", "en")], k=3, block=4)
    assert len(got) == 1 and got.loc[0, "lev"] == 1


def test_empty_and_no_pairs(ray_session):
    rows = [(1, "completely different text here", "en"),
            (2, "zzzzzz qqqq wwww eeee rrrr tttt", "en")]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "lang": pa.array([r[2] for r in rows], pa.string())})
    ds = fuzzy_dup_pairs(rd.from_arrow(t).repartition(4), k=2)
    assert ds.count() == 0
    # Dataset.to_pandas drops a 0-row schema; the schema lives on the ds
    assert ds.schema().names == ["doc_a", "doc_b", "lev"]


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_fuzzy_pairs_vs_duckdb(ray_session, sf):
    import pyarrow.parquet as pq

    t = pq.read_table(f"/root/testdata/sf{sf}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    got = fuzzy_dup_pairs(rd.from_arrow(t).repartition(8)) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql(
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "levenshtein(a.text, b.text) AS lev "
        "FROM documents a JOIN documents b "
        "ON a.lang = b.lang AND a.doc_id < b.doc_id "
        "AND abs(strlen(a.text)//32 - strlen(b.text)//32) <= 1 "
        "WHERE levenshtein(a.text, b.text) <= 40 ORDER BY 1, 2").df()
    assert got.astype("int64").values.tolist() == \
        want.astype("int64").values.tolist()


def test_max_group_guard(ray_session):
    rows = [(i, "aaaa", "en") for i in range(6)]
    with pytest.raises(Exception, match="max_group"):
        _pairs(rows, k=2, block=4, max_group=3)
    # and the exact result is unaffected when the cap is not hit
    got = _pairs(rows, k=2, block=4, max_group=100)
    assert len(got) == 15   # all C(6,2) identical docs pair at lev 0

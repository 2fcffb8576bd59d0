"""Content-defined chunking (stages/cdc.py): shift invariance, exact
reassembly, batch-vs-single-doc parity, dedup stats."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.cdc import (_chunks_of, cdc_chunks,
                                          chunk_dedup_stats)

_MASK = 0x3F   # ~64 B average chunks for test-sized payloads


def _text(rng, n):
    return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))


def test_reassembly_and_reference_parity(ray_session):
    rng = np.random.default_rng(8)
    texts = [_text(rng, rng.integers(0, 900)) for _ in range(30)] + [""]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = cdc_chunks(rd.from_arrow(t).repartition(4), mask=_MASK) \
        .to_pandas().sort_values(["doc_id", "chunk_ix"])
    for d, grp in out.groupby("doc_id"):
        buf = texts[d].encode()
        ref = _chunks_of(buf, _MASK)
        got = list(zip(grp["offset"], grp["length"], grp["chunk_hash"]))
        assert got == ref                       # batch == single-doc
        assert sum(grp["length"]) == len(buf)   # exact reassembly
        assert list(grp["chunk_ix"]) == list(range(len(grp)))
    assert 0 not in set(out["doc_id"]) or texts[0] != ""


def test_shift_invariance_of_interior_chunks():
    rng = np.random.default_rng(3)
    payload = _text(rng, 3000).encode()
    a = _chunks_of(b"X" * 7 + payload, _MASK)
    b = _chunks_of(b"Y" * 501 + payload, _MASK)
    ha = {h for _, _, h in a}
    hb = {h for _, _, h in b}
    # CDC promise: almost all of the shared payload's chunks coincide
    # even though offsets differ by 494 bytes
    assert len(ha & hb) >= len(ha) * 0.6


def test_chunk_dedup_stats_finds_planted_block(ray_session):
    rng = np.random.default_rng(5)
    block = _text(rng, 1200)
    texts = [_text(rng, 400) + block + _text(rng, 400) for _ in range(4)]
    texts += [_text(rng, 800) for _ in range(6)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    stats = chunk_dedup_stats(rd.from_arrow(t).repartition(3),
                              mask=_MASK).to_pandas()
    # interior chunks of the planted block appear in all 4 docs
    assert (stats["n_docs"] == 4).any()
    assert (stats["n_copies"] >= 4).any()


def test_incremental_group_agg_group_move_and_drop(ray_session):
    import ray.data as rd

    from rho_contracts_ray.stages.upsert import incremental_group_agg

    base = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a", "b", "c"], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0])}))
    # update moves a 'b' row (v=3) to group 'a' with v=30;
    # delete empties group 'c' entirely; insert a new group 'd'
    deltas = rd.from_arrow(pa.table({
        "g": pa.array(["b", "a", "c", "d"], pa.string()),
        "dn": pa.array([-1, 1, -1, 1], pa.int64()),
        "dsum": pa.array([-3.0, 30.0, -4.0, 9.0])}))
    out = incremental_group_agg(base, deltas, "g", "v", ndigits=4) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert list(out["g"]) == ["a", "d"]       # 'b' empty, 'c' deleted
    assert list(out["n_rows"]) == [3, 1]
    assert list(out["total"]) == [33.0, 9.0]

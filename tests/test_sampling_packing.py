"""Sampling, n-gram statistics and sequence-packing operators."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rho_contracts_ray.stages import (
    hash_sample, ngram_top_k, pack_sequences, sample_threshold,
    split_train_holdout, stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else pa.table({})


def test_hash_sample_matches_sql(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    out = _collect(hash_sample(ds, "doc_id", threshold=429496729))
    ref = duckdb.connect().execute(
        f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet') "
        "WHERE (doc_id * 2654435761) % 4294967296 < 429496729 "
        "ORDER BY doc_id").df()
    assert sorted(out["doc_id"].to_pylist()) == ref["doc_id"].tolist()
    # roughly 10%
    n_total = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert 0.02 < out.num_rows / n_total < 0.25


def test_hash_sample_stable_across_partitionings(ray_session):
    ds1 = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ds2 = rd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id"]).repartition(7)
    a = sorted(_collect(hash_sample(ds1, "doc_id", rate=0.2))["doc_id"].to_pylist())
    b = sorted(_collect(hash_sample(ds2, "doc_id", rate=0.2))["doc_id"].to_pylist())
    assert a == b


def test_stratified_sample_rates(ray_session):
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type"])
    out = _collect(stratified_sample(
        ds, "event_id", "event_type",
        rates={"click": 0.0}, default_rate=1.0))
    assert "click" not in set(out["event_type"].to_pylist())
    full = pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert 0 < out.num_rows < full


def test_split_train_holdout_disjoint_exhaustive(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    train, hold = split_train_holdout(ds, "doc_id", holdout_rate=0.2)
    a = set(_collect(train)["doc_id"].to_pylist())
    b = set(_collect(hold)["doc_id"].to_pylist())
    assert not (a & b)
    n_total = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(a) + len(b) == n_total
    assert len(b) > 0


def test_ngram_top_k_matches_sql(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    out = _collect(ngram_top_k(ds, n=2, k=10))
    con = duckdb.connect()
    ref = con.execute(
        "WITH toks AS ("
        " SELECT doc_id, string_split(text, ' ') AS arr "
        f" FROM read_parquet('{SF}/documents.parquet')"
        "), grams AS ("
        " SELECT arr[i] || ' ' || arr[i+1] AS g"
        " FROM toks, UNNEST(range(1, len(arr))) AS t(i)"
        ") SELECT g AS ngram, count(*)::BIGINT AS cnt FROM grams "
        "GROUP BY g ORDER BY cnt DESC, g LIMIT 10"
    ).df()
    assert out["ngram"].to_pylist() == ref["ngram"].tolist()
    assert out["cnt"].to_pylist() == ref["cnt"].tolist()


@pytest.fixture(scope="module")
def packed(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(pack_sequences(ds, capacity=256))


def test_pack_sequences_capacity_and_coverage(ray_session, packed):
    over = np.array(packed["oversized"].to_pylist())
    toks = np.array(packed["total_tokens"].to_pylist())
    assert (toks[~over] <= 256).all()
    assert (toks[over] > 256).all()   # flagged, not silently dropped
    # EVERY doc appears exactly once (packed or flagged oversized)
    all_ids = [i for ids in packed["doc_ids"].to_pylist() for i in ids]
    assert len(all_ids) == len(set(all_ids))
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert set(all_ids) == set(docs["doc_id"].to_pylist())
    # packing should be reasonably tight on the full bins
    fills = [f for f, o in zip(packed["fill_ratio"].to_pylist(), over)
             if not o]
    assert sum(fills) / len(fills) > 0.5


def test_pack_sequences_deterministic(ray_session, packed):
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    again = _collect(pack_sequences(ds, capacity=256))
    key = [("first_doc_id", "ascending"), ("bin_idx", "ascending")]
    assert packed.sort_by(key).equals(again.sort_by(key))
    # (first_doc_id, bin_idx) is globally unique for ANY int64 id — the
    # r2 bit-packed seq_key overflowed at doc_id >= 2^43
    keys = list(zip(packed["first_doc_id"].to_pylist(),
                    packed["bin_idx"].to_pylist()))
    assert len(keys) == len(set(keys))


def test_hash_sample_null_ids_excluded(ray_session):
    # null ids must land in NO sample/half — the SQL predicate's NULL
    # semantics (previously NaN -> INT64_MIN gave arbitrary membership)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, None, 2, None, 3], pa.int64()),
        "text": pa.array(list("abcde")),
    }))
    full = _collect(hash_sample(ds, "doc_id", rate=1.0))
    assert full["doc_id"].null_count == 0
    assert sorted(full["doc_id"].to_pylist()) == [1, 2, 3]
    train, hold = split_train_holdout(ds, "doc_id", holdout_rate=0.5)
    t = _collect(train)["doc_id"].to_pylist()
    h = _collect(hold)["doc_id"].to_pylist()
    assert None not in t and None not in h
    assert sorted(t + h) == [1, 2, 3]
    strat = _collect(stratified_sample(
        ds, "doc_id", "text", rates={}, default_rate=1.0))
    assert strat["doc_id"].null_count == 0


def test_pack_sequences_huge_ids(ray_session):
    # ids past 2^43 (64-bit hashed ids) must not overflow the sequence key
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([2**62, 2**62 + 1, 5], pa.int64()),
        "text": pa.array(["a b c", "d e", "f g h i"]),
    }))
    out = _collect(pack_sequences(ds, capacity=4))
    ids = [i for ids in out["doc_ids"].to_pylist() for i in ids]
    assert set(ids) == {2**62, 2**62 + 1, 5}
    assert not any(out["oversized"].to_pylist())


def test_chunk_documents_matches_sql(ray_session):
    from rho_contracts_ray.stages import chunk_documents

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    out = _collect(chunk_documents(ds, max_tokens=16, overlap=4)) \
        .sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])
    ref = duckdb.connect().execute(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr "
        f"FROM read_parquet('{SF}/documents.parquet')), chunks AS ("
        " SELECT doc_id, k AS chunk_id,"
        " array_to_string(arr[k*12+1 : k*12+16], ' ') AS chunk_text,"
        " len(arr[k*12+1 : k*12+16])::BIGINT AS n_tokens"
        " FROM toks, UNNEST(range(0, (greatest(len(arr)-4,1) + 11) // 12))"
        " AS t(k)) SELECT * FROM chunks ORDER BY doc_id, chunk_id").df()
    assert out["doc_id"].to_pylist() == ref["doc_id"].tolist()
    assert out["chunk_id"].to_pylist() == ref["chunk_id"].tolist()
    assert out["chunk_text"].to_pylist() == ref["chunk_text"].tolist()
    assert out["n_tokens"].to_pylist() == ref["n_tokens"].tolist()
    # overlap property: consecutive chunks share the overlap tokens
    rows = list(zip(out["doc_id"].to_pylist(), out["chunk_id"].to_pylist(),
                    out["chunk_text"].to_pylist()))
    for (d1, c1, t1), (d2, c2, t2) in zip(rows, rows[1:]):
        if d1 == d2 and c2 == c1 + 1 and len(t2.split(" ")) == 16:
            assert t1.split(" ")[12:] == t2.split(" ")[:4]


def test_decontaminate_ngrams_matches_sql(ray_session):
    from rho_contracts_ray.stages import decontaminate_ngrams, hash_sample

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    hold = hash_sample(docs, "doc_id", threshold=429496729)

    def train_only(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks() \
            if isinstance(batch["doc_id"], pa.ChunkedArray) \
            else batch["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        m = (ids_np * 2654435761) % (1 << 32) >= 429496729
        return batch.filter(pa.array(m))

    train = rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .map_batches(train_only, batch_format="pyarrow")
    out = _collect(decontaminate_ngrams(train, hold, n=3, min_shared=3)) \
        .sort_by("doc_id")
    ref = duckdb.connect().execute(
        "WITH hold AS (SELECT string_split(text, ' ') AS arr "
        f"FROM read_parquet('{SF}/documents.parquet') "
        "WHERE (doc_id * 2654435761) % 4294967296 < 429496729), "
        "hg AS (SELECT DISTINCT arr[i] || ' ' || arr[i+1] || ' ' || "
        "arr[i+2] AS g FROM hold, UNNEST(range(1, len(arr)-1)) AS t(i)), "
        "train AS (SELECT doc_id, string_split(text, ' ') AS arr "
        f"FROM read_parquet('{SF}/documents.parquet') "
        "WHERE (doc_id * 2654435761) % 4294967296 >= 429496729), "
        "tg AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || "
        "' ' || arr[i+2] AS g FROM train, "
        "UNNEST(range(1, len(arr)-1)) AS t(i)) "
        "SELECT tg.doc_id, count(*)::BIGINT AS n_shared "
        "FROM tg JOIN hg USING (g) GROUP BY 1 HAVING count(*) >= 3 "
        "ORDER BY doc_id").df()
    assert out["doc_id"].to_pylist() == ref["doc_id"].tolist()
    assert out["n_shared"].to_pylist() == ref["n_shared"].tolist()
    assert out.num_rows > 0  # word-soup corpus overlaps heavily


def test_hot_keys_and_bucketed_reduce_empty_input(ray_session):
    from rho_contracts_ray.stages.distagg import bucketed_reduce, hot_keys

    empty = rd.from_arrow(pa.table({"bkey": pa.array([], pa.int64())}))
    assert hot_keys(empty, "bkey").size == 0
    assert bucketed_reduce(empty, "bkey", lambda t: t) == []

    # dedup pair finders over an empty corpus return empty, no crash
    from rho_contracts_ray.stages import minhash_dup_pairs, simhash_dup_pairs

    edocs = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    assert minhash_dup_pairs(edocs).count() == 0
    assert simhash_dup_pairs(edocs).count() == 0


def test_bucketed_reduce_dynamic_bucket_counts(ray_session):
    """Bucket count is a fan-out knob, never a results knob: identical
    output at 16 / 64 / 256 buckets (VERDICT r2 #2)."""
    from rho_contracts_ray.stages.distagg import (bucketed_reduce,
                                                  default_buckets, hot_keys)

    rng = np.random.default_rng(0)
    keys = rng.integers(-2**62, 2**62, 5000, dtype=np.int64)
    keys[:500] = keys[500:1000]           # plant duplicates
    ds = rd.from_arrow(pa.table({"bkey": pa.array(keys)})).repartition(8)
    ref = hot_keys(ds, "bkey", n_buckets=16)
    assert ref.size >= 500
    for n in (64, 256):
        assert np.array_equal(ref, hot_keys(ds, "bkey", n_buckets=n))

    def fn(t):
        return pa.table({"n": [t.num_rows]})

    t16 = sum(x["n"][0].as_py()
              for x in bucketed_reduce(ds, "bkey", fn, n_buckets=16))
    t64 = sum(x["n"][0].as_py()
              for x in bucketed_reduce(ds, "bkey", fn, n_buckets=64))
    assert t16 == t64 == 5000
    assert default_buckets() >= 16


def test_minhash_pairs_identical_across_bucket_counts(ray_session, monkeypatch):
    from rho_contracts_ray.stages import minhash_dup_pairs

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).repartition(8)

    def collect(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    base = collect(minhash_dup_pairs(docs, threshold=0.5))
    monkeypatch.setenv("RHO_REDUCE_BUCKETS", "64")
    wide = collect(minhash_dup_pairs(docs, threshold=0.5))
    assert base.equals(wide)


def test_pair_merge_small_and_exchange_paths_identical(ray_session,
                                                       monkeypatch):
    """The pair consolidation has two routes: one merge task for small
    candidate sets, a second bucketed exchange for large ones.  Same
    pairs either way."""
    import rho_contracts_ray.stages.dedup as dedup
    from rho_contracts_ray.stages import jaccard_dup_pairs, minhash_dup_pairs

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).repartition(8)

    def collect(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    base_mh = collect(minhash_dup_pairs(docs, threshold=0.5))
    base_jc = collect(jaccard_dup_pairs(docs, threshold=0.3,
                                        max_bucket=1_000_000))
    monkeypatch.setattr(dedup, "_SMALL_PAIR_MERGE_ROWS", 0)
    assert collect(minhash_dup_pairs(docs, threshold=0.5)).equals(base_mh)
    assert collect(jaccard_dup_pairs(docs, threshold=0.3,
                                     max_bucket=1_000_000)).equals(base_jc)


def test_bucketed_reduce_non_pow2_buckets_lossless(ray_session):
    """Non-power-of-two bucket counts must fold overflow hash ranges into
    the last bucket, never drop rows (r3 review: rows silently vanished
    at n_buckets=20)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from rho_contracts_ray.stages.distagg import bucketed_reduce, hot_keys

    rng = np.random.RandomState(11)
    keys = rng.randint(-2**62, 2**62, 5000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"bkey": pa.array(keys)})).repartition(4)
    ref_rows = sum(
        x for x in bucketed_reduce(ds, "bkey", lambda t: t.num_rows,
                                   n_buckets=16))
    assert ref_rows == 5000
    for n in (20, 100, 17):
        got = sum(x for x in bucketed_reduce(ds, "bkey", lambda t: t.num_rows,
                                             n_buckets=n))
        assert got == 5000, f"n_buckets={n} lost rows: {got}"
        ref = hot_keys(ds, "bkey", min_count=2, n_buckets=16)
        assert np.array_equal(ref, hot_keys(ds, "bkey", min_count=2,
                                            n_buckets=n))


def test_bucketed_reduce_missing_key_column_raises(ray_session):
    """A NON-empty block without the routing column is a schema bug and
    must raise, not silently drop its rows (ADVICE r3); empty
    pass-through blocks still skip silently."""
    import pyarrow as pa
    import pytest

    import ray.data as rd

    from rho_contracts_ray.stages.distagg import bucketed_reduce

    bad = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(Exception, match="routing column"):
        bucketed_reduce(bad, "bkey", lambda t: t.num_rows)


def test_bucketed_reduce_refs_fanin_path(ray_session, monkeypatch):
    """Above _ARG_FANIN split tasks, bucket inputs travel as one
    list-of-refs arg (chunked ray.get inside) — identical results to the
    positional path (the 100k-block form that Ray's per-task arg limits
    would otherwise break)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    import rho_contracts_ray.stages.distagg as distagg

    rng = np.random.RandomState(5)
    keys = rng.randint(0, 300, 4000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"bkey": pa.array(keys)})).repartition(8)
    ref_hot = distagg.hot_keys(ds, "bkey", min_count=3, n_buckets=16)
    ref_rows = sorted(distagg.bucketed_reduce(
        ds, "bkey", lambda t: t.num_rows, n_buckets=16))
    monkeypatch.setattr(distagg, "_ARG_FANIN", 2)   # force the refs path
    assert np.array_equal(
        ref_hot, distagg.hot_keys(ds, "bkey", min_count=3, n_buckets=16))
    assert ref_rows == sorted(distagg.bucketed_reduce(
        ds, "bkey", lambda t: t.num_rows, n_buckets=16))


def test_decontaminate_bloom_superset_of_exact(ray_session):
    """Bloom decontamination has one-sided error: per-doc counts may
    overcount by ~fpr x grams but NEVER undercount — every doc the exact
    method flags must be flagged with n_shared >= the exact count."""
    from rho_contracts_ray.stages import decontaminate_ngrams, hash_sample

    def _docs():
        return rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])

    hold = hash_sample(_docs(), "doc_id", threshold=429496729)
    exact = _collect(decontaminate_ngrams(_docs(), hold, n=3, min_shared=3))
    hold2 = hash_sample(_docs(), "doc_id", threshold=429496729)
    bloom = _collect(decontaminate_ngrams(_docs(), hold2, n=3, min_shared=3,
                                          method="bloom", bloom_fpr=0.01))
    ex = dict(zip(exact["doc_id"].to_pylist(),
                  exact["n_shared"].to_pylist()))
    bl = dict(zip(bloom["doc_id"].to_pylist(),
                  bloom["n_shared"].to_pylist()))
    assert exact.num_rows > 0
    assert set(ex) <= set(bl)
    for d, n_ex in ex.items():
        assert bl[d] >= n_ex, (d, n_ex, bl[d])
    # and the overcount is bounded: bloom should not flag wildly more
    assert len(bl) <= 3 * len(ex) + 20, (len(ex), len(bl))

    with pytest.raises(ValueError):
        decontaminate_ngrams(_docs(), hold2, method="sketchy")


def test_weighted_sample_matches_sql_and_rate(ray_session):
    """Inclusion predicate byte-equal to the SQL form; realized rates
    scale with weight; zero/null weights and null ids never survive."""
    from rho_contracts_ray.stages import weighted_sample

    n = 20_000
    rng = np.random.RandomState(3)
    w = rng.choice([0.0, 0.25, 1.0, 4.0, None], n,
                   p=[0.1, 0.3, 0.3, 0.2, 0.1])
    t = pa.table({
        "id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "w": pa.array([None if x is None else float(x) for x in w],
                      pa.float64()),
    })
    out = _collect(weighted_sample(rd.from_arrow(t).repartition(5),
                                   "id", "w", base_rate=0.5))
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ref = con.execute(
        "SELECT id FROM t WHERE w IS NOT NULL AND "
        "(id * 2654435761) % 4294967296 < "
        "round(least(greatest(0.5 * w, 0.0), 1.0) * 4294967296.0) "
        "ORDER BY id").df()
    assert sorted(out["id"].to_pylist()) == ref["id"].tolist()

    kept = set(out["id"].to_pylist())
    df = t.to_pandas()
    for wval, lo, hi in ((0.25, 0.08, 0.18), (1.0, 0.42, 0.58),
                         (4.0, 0.95, 1.0)):
        ids = df[df.w == wval]["id"]
        rate = ids.isin(kept).mean()
        assert lo <= rate <= hi, (wval, rate)
    assert not df[df.w.isna()]["id"].isin(kept).any()
    assert not df[df.w == 0.0]["id"].isin(kept).any()


def test_mix_sources_quota_clamp_and_drop(ray_session):
    """mix_sources: per-source keep rate = min(1, share*T/count); sources
    outside the share map and null ids/sources drop; a source smaller
    than its quota keeps everything (clamp at 1, no invention)."""
    from rho_contracts_ray.stages.sampling import mix_sources

    t = pa.table({
        "doc_id": pa.array(list(range(1, 401)) + [None], pa.int64()),
        "source": pa.array(
            ["big"] * 300 + ["tiny"] * 50 + ["unlisted"] * 50 + [None]),
    })
    shares = {"big": 0.5, "tiny": 0.5, "ghost": 1.0}
    out = _collect(mix_sources(rd.from_arrow(t), "doc_id", "source",
                               shares, target_rows=100))
    src = out["source"].to_pylist()
    assert "unlisted" not in src and None not in src
    assert None not in out["doc_id"].to_pylist()
    # tiny: quota 50 >= its 50 rows -> rate clamps to 1, ALL kept
    assert src.count("tiny") == 50
    # big: rate = 50/300; the hash keeps roughly that share
    n_big = src.count("big")
    assert 20 <= n_big <= 90
    # exact membership is the hash predicate with the derived threshold
    thr = sample_threshold(min(1.0, 0.5 * 100.0 / 300.0))
    ids = np.array([i for i, s in zip(t["doc_id"].to_pylist(),
                                      t["source"].to_pylist())
                    if s == "big"], dtype=np.uint64)
    expect = ids[(ids * np.uint64(2654435761)) % np.uint64(1 << 32)
                 < np.uint64(thr)]
    got = sorted(i for i, s in zip(out["doc_id"].to_pylist(), src)
                 if s == "big")
    assert got == sorted(int(x) for x in expect)


def test_mix_sources_partition_invariant(ray_session):
    from rho_contracts_ray.stages.sampling import mix_sources

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"])
    shares = {f"src{i}": (0.07 if i % 2 == 0 else 0.03)
              for i in range(20)}
    a = _collect(mix_sources(ds, "doc_id", "source", shares, 30))
    b = _collect(mix_sources(ds.repartition(7), "doc_id", "source",
                             shares, 30))
    assert sorted(a["doc_id"].to_pylist()) == sorted(b["doc_id"].to_pylist())


def test_hot_keys_n_buckets_one_and_bucket_named_column(ray_session):
    """Two code-review regressions: explicit n_buckets=1 must not crash
    (Ray num_returns=1 returns a bare ref), and an input dataset that
    itself carries a column named 'bucket' must not confuse the
    empty-block pass-through detection."""
    from rho_contracts_ray.stages.distagg import hot_keys

    t = pa.table({
        "bkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "bucket": pa.array([9, 9, 9, 9, 9, 9], pa.int64()),
    })
    # several blocks, some empty after a filter -> empty pass-through
    ds = rd.from_arrow(t).repartition(4).filter(expr="bkey < 100")
    out = hot_keys(ds, "bkey", min_count=2, n_buckets=1)
    assert out.tolist() == [1, 3]


def test_quantile_col_name_sub_percent():
    from rho_contracts_ray.stages.agg import quantile_col_name

    assert quantile_col_name(0.5) == "p50"
    assert quantile_col_name(0.95) == "p95"
    assert quantile_col_name(1.0) == "p100"
    assert quantile_col_name(0.999) == "p99_9"   # NOT p100
    assert quantile_col_name(0.995) == "p99_5"   # distinct from 1.0
    assert quantile_col_name(0.004) == "p0_4"    # NOT p0

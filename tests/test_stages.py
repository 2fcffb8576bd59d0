"""Training-data pipeline stages: text analysis, dedup family, ANN,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rho_contracts_ray.stages import (
    DecodeImageStage, connected_components, distributed_components,
    embedding_dup_pairs,
    exact_dup_groups, knn_brute_force, knn_ivf, make_media_table,
    minhash_dup_pairs, ngram_jaccard, simhash_dup_pairs, text_features,
    token_counts,
)
from rho_contracts_ray.stages.multimodal import decode_images

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    """documents + planted near-dups and exact dups."""
    t = pq.read_table(f"{SF}/documents.parquet")
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_pylist()
    next_id = max(ids) + 1
    add_texts, add_ids = [], []
    # exact dups of docs 0..4
    for i in range(5):
        add_texts.append(texts[i])
        add_ids.append(next_id); next_id += 1
    # near dups of docs 10..14: change one word
    for i in range(10, 15):
        words = texts[i].split()
        words[len(words) // 2] = "MUTATED"
        add_texts.append(" ".join(words))
        add_ids.append(next_id); next_id += 1
    full = pa.table({
        "doc_id": pa.array(ids + add_ids, pa.int64()),
        "text": pa.array(texts + add_texts, pa.string()),
    })
    return full, ids, add_ids


def test_token_counts_matches_python_split():
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a b  c", "  x ", "", "one"]})
    out = token_counts(t)
    expect = [len(s.split()) for s in t["text"].to_pylist()]
    assert out["n_tokens"].to_pylist() == expect


def test_text_features_deterministic(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    out = text_features(ds).to_pandas().sort_values("doc_id")
    out2 = text_features(rd.read_parquet(f"{SF}/documents.parquet")) \
        .to_pandas().sort_values("doc_id")
    assert (out["quality"].values == out2["quality"].values).all()
    assert (out["lang_id"].values == out2["lang_id"].values).all()
    assert (out["n_tokens"] > 0).all()
    assert out["quality"].between(0, 1).all()


def test_exact_dedup(ray_session, docs_with_dups):
    full, ids, add_ids = docs_with_dups
    groups = exact_dup_groups(full, ["text"], "doc_id")
    # 5 exact-dup groups, each keeping the original (smaller) id
    assert groups.num_rows == 5
    assert sorted(groups["keep_id"].to_pylist()) == [0, 1, 2, 3, 4]
    assert all(c == 2 for c in groups["cnt"].to_pylist())
    # Dataset flavor agrees
    ds = rd.from_arrow(full)
    g2 = exact_dup_groups(ds, ["text"], "doc_id").to_pandas()
    assert sorted(g2["keep_id"].tolist()) == [0, 1, 2, 3, 4]


def test_merge_topk_vectorized_many_queries(ray_session):
    """1 k queries x 50 partial batches merge vectorized (lexsort) — the
    r2 per-row driver heap took seconds here (VERDICT r2 #5) — and agree
    with a direct numpy reference."""
    import time

    from rho_contracts_ray.stages.ann import _merge_topk

    rng = np.random.default_rng(7)
    nq, nb, k = 1000, 50, 10
    tables = []
    for b in range(nb):
        n = nq * k
        tables.append(pa.table({
            "query_id": pa.array(np.repeat(np.arange(nq), k), pa.int64()),
            "vec_id": pa.array(rng.integers(0, 10**9, n), pa.int64()),
            "score": pa.array(rng.random(n, dtype=np.float32)),
        }))
    ds = rd.from_arrow(tables)
    t0 = time.monotonic()
    out = _merge_topk(ds, k)
    dt = time.monotonic() - t0
    assert out.num_rows == nq * k
    assert dt < 5.0, f"_merge_topk took {dt:.1f}s for {nq*nb*k} rows"
    # reference check on one query
    allq = np.concatenate([t["query_id"].to_numpy() for t in tables])
    allv = np.concatenate([t["vec_id"].to_numpy() for t in tables])
    alls = np.concatenate([
        t["score"].to_numpy().astype(np.float64) for t in tables])
    m = allq == 123
    ref_order = np.lexsort((allv[m], -alls[m]))[:k]
    got = out.filter(pa.compute.equal(out["query_id"], 123))
    assert got["vec_id"].to_pylist() == allv[m][ref_order].tolist()
    assert got["rank"].to_pylist() == list(range(1, k + 1))


def test_exact_dedup_high_dup_rate_distributed(ray_session):
    """Adversarial dup-heavy corpus (90% duplicates): the pass-2 finish is
    fully distributed — real key values flow through bucket tasks into the
    returned Dataset, never a driver concat (VERDICT r2 #4).  Also pins
    the Dataset-out contract on every path (ADVICE r2): chaining Dataset
    ops works whether or not duplicates exist."""
    import numpy as np

    n = 5000
    texts = [f"dup text {i % 500}" for i in range(n)]   # 500 keys x 10
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(8)
    out = exact_dup_groups(ds, ["text"], "doc_id", min_count=2)
    # Dataset-out contract: chain a Dataset op before collecting
    t = pa.concat_tables([
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in out.select_columns(["text", "keep_id", "cnt"])
        .iter_batches(batch_size=None, batch_format="pyarrow")])
    assert t.num_rows == 500
    assert all(c == 10 for c in t["cnt"].to_pylist())
    keep = sorted(t["keep_id"].to_pylist())
    assert keep == sorted(range(500))   # min id per group
    # duplicate-free input: same type, zero rows, schema intact
    uniq = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"unique {i}" for i in range(100)]),
    }))
    empty_out = exact_dup_groups(uniq, ["text"], "doc_id", min_count=2)
    assert hasattr(empty_out, "select_columns")
    et = empty_out.select_columns(["keep_id"])
    assert sum(b.num_rows for b in et.iter_batches(
        batch_size=None, batch_format="pyarrow")) == 0


def _sorted_pairs(ds):
    """Collect a pair-finder Dataset to a deterministically ordered
    DataFrame (blocks are per-merge-bucket; global order is not part of
    the contract)."""
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_minhash_finds_near_dups(ray_session, docs_with_dups):
    full, ids, add_ids = docs_with_dups
    ds = rd.from_arrow(full)
    pairs = _sorted_pairs(minhash_dup_pairs(ds, threshold=0.6))
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # all 10 planted pairs (5 exact + 5 near) recovered
    expected = {(i, add_ids[i]) for i in range(5)}
    expected |= {(i, add_ids[5 + (i - 10)]) for i in range(10, 15)}
    assert expected <= got, expected - got
    # no wild false positives: all reported pairs verify with real jaccard
    texts = dict(zip(full["doc_id"].to_pylist(), full["text"].to_pylist()))
    for a, b in got:
        assert ngram_jaccard(texts[a], texts[b], 1) > 0.4


def test_minhash_scratch_dir_spill_identical(ray_session, docs_with_dups,
                                              tmp_path):
    """The 100-TB signature-spill path (parquet checkpoint instead of an
    object-store pin) returns byte-identical pairs."""
    full, _, _ = docs_with_dups
    ds = rd.from_arrow(full)
    base = _sorted_pairs(minhash_dup_pairs(ds, threshold=0.6))
    spilled = _sorted_pairs(
        minhash_dup_pairs(rd.from_arrow(full), threshold=0.6,
                          scratch_dir=str(tmp_path / "sigs")))
    assert base.equals(spilled)


def test_simhash_finds_near_dups(ray_session, docs_with_dups):
    full, ids, add_ids = docs_with_dups
    ds = rd.from_arrow(full)
    pairs = _sorted_pairs(simhash_dup_pairs(ds, max_hamming=6))
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    exact_expected = {(i, add_ids[i]) for i in range(5)}
    assert exact_expected <= got
    # hamming 0 for exact dups
    ham = dict(((a, b), h) for a, b, h in zip(
        pairs["id_a"], pairs["id_b"], pairs["hamming"]))
    for p in exact_expected:
        assert ham[p] == 0


def test_connected_components():
    assert connected_components([(1, 2), (2, 3), (7, 8)]) == [[1, 2, 3], [7, 8]]
    assert connected_components([]) == []


def _components_map(pairs):
    """node -> min-id component from the driver union-find (the oracle
    for the distributed large-star/small-star path)."""
    exp = {}
    for g in connected_components(pairs):
        for x in g:
            exp[x] = g[0]       # clusters come back sorted, min first
    return exp


@pytest.mark.parametrize("case", ["chain", "cliques", "star", "random"])
def test_distributed_components_matches_union_find(ray_session, case):
    rng = np.random.default_rng(7)
    if case == "chain":
        # diameter 30: forces several large/small-star rounds
        pairs = [(i, i + 1) for i in range(30)]
    elif case == "cliques":
        a, b = list(range(100, 110)), list(range(200, 206))
        pairs = [(x, y) for i, x in enumerate(a) for y in a[i + 1:]]
        pairs += [(y, x) for i, x in enumerate(b) for y in b[i + 1:]]
        pairs += [(5, 5)]                      # self-loop: dropped
    elif case == "star":
        pairs = [(i, 0) for i in range(1, 21)] * 2    # duplicate edges
    else:
        # random multigraph over sparse negative/positive int64 ids,
        # self-loops and both orientations included
        ids = (rng.choice(20_000, size=400, replace=False)
               .astype(np.int64) - 10_000)
        pairs = [(int(ids[rng.integers(400)]), int(ids[rng.integers(400)]))
                 for _ in range(500)]
    t = pa.table({"id_a": pa.array([x for x, _ in pairs], pa.int64()),
                  "id_b": pa.array([y for _, y in pairs], pa.int64())})
    exp = _components_map(pairs)

    out = distributed_components(rd.from_arrow(t), small_rows=0,
                                 n_buckets=4).to_pandas()
    assert dict(zip(out["node"], out["component"])) == exp
    # the single-task small path agrees with the iterated star path
    out2 = distributed_components(t).to_pandas()
    assert dict(zip(out2["node"], out2["component"])) == exp


def test_distributed_components_oversized_split(ray_session, monkeypatch):
    # pin the bucket-split threshold below the edge count so the star and
    # distinct exchanges run through the sub-range split path
    monkeypatch.setenv("RHO_BUCKET_SPLIT_ROWS", "8")
    pairs = [(i, i + 1) for i in range(40)] + [(100, 200), (200, 300)]
    t = pa.table({"id_a": pa.array([x for x, _ in pairs], pa.int64()),
                  "id_b": pa.array([y for _, y in pairs], pa.int64())})
    out = distributed_components(rd.from_arrow(t), small_rows=0,
                                 n_buckets=2).to_pandas()
    assert dict(zip(out["node"], out["component"])) == _components_map(pairs)


def test_distributed_components_round_cutoff_fails_loud(ray_session):
    # a 30-chain needs several star rounds; a 1-round cutoff must raise,
    # not return a partial (wrong) clustering
    pairs = [(i, i + 1) for i in range(30)]
    t = pa.table({"id_a": pa.array([x for x, _ in pairs], pa.int64()),
                  "id_b": pa.array([y for _, y in pairs], pa.int64())})
    with pytest.raises(RuntimeError, match="no fixpoint"):
        distributed_components(rd.from_arrow(t), small_rows=0,
                               n_buckets=2, max_rounds=1)


def test_distributed_components_empty(ray_session):
    t = pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())})
    out = distributed_components(t)
    assert out.count() == 0
    assert {f.name for f in out.schema().base_schema} \
        == {"node", "component"}


def test_ngram_jaccard():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0


@pytest.mark.parametrize("strategy", ["broadcast", "exchange"])
def test_jaccard_dup_pairs_exact(ray_session, docs_with_dups, strategy):
    """The distributed set-similarity join vs a brute-force of the scalar
    verifier — identical pairs AND identical jaccard values (the join is
    deterministic recall-1, unlike minhash/simhash) — on BOTH the
    broadcast-postings and the bucketed-exchange strategies."""
    from rho_contracts_ray.stages import jaccard_dup_pairs

    full, _, _ = docs_with_dups
    out = jaccard_dup_pairs(rd.from_arrow(full), threshold=0.5, n=3,
                            max_bucket=1_000_000,
                            strategy=strategy).to_pandas()
    # brute force over the same corpus with string_split-matched semantics
    docs = dict(zip(full["doc_id"].to_pylist(), full["text"].to_pylist()))

    def gset(s, n=3):
        toks = s.split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)} \
            if len(toks) >= n else set()

    ids = sorted(docs)
    want = []
    gs = {i: gset(docs[i]) for i in ids}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(gs[a] & gs[b])
            if not inter:
                continue
            j = inter / (len(gs[a]) + len(gs[b]) - inter)
            if j >= 0.5:
                want.append((a, b, j))
    got = list(zip(out.id_a, out.id_b, out.jaccard))
    assert sorted(got) == sorted(want)
    assert not out.truncated.any()
    # the planted exact dups must appear with J == 1.0
    assert (out.jaccard == 1.0).sum() >= 5


def test_jaccard_dup_pairs_truncation_flagged(ray_session):
    """A gram group over max_bucket truncates: surviving pairs are flagged,
    never silently full-J."""
    import ray.data as rd

    from rho_contracts_ray.stages import jaccard_dup_pairs

    # 6 docs sharing one trigram + unique tails >= 3 tokens each
    texts = [f"common gram here u{i} v{i} w{i}" for i in range(6)]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    for strategy in ("broadcast", "exchange"):
        out = jaccard_dup_pairs(rd.from_arrow(t).repartition(3),
                                threshold=0.01, n=3, max_bucket=3,
                                strategy=strategy).to_pandas()
        assert len(out) > 0 and out.truncated.all(), strategy
        full = jaccard_dup_pairs(rd.from_arrow(t), threshold=0.01, n=3,
                                 max_bucket=100,
                                 strategy=strategy).to_pandas()
        assert len(full) == 15 and not full.truncated.any(), strategy


def test_jaccard_strategies_identical_random(ray_session):
    """Property: broadcast-postings and bucketed-exchange strategies return
    IDENTICAL tables (pairs, bit-equal jaccard doubles, truncated flags) on
    a random corpus — with and without a binding max_bucket."""
    import ray.data as rd

    from rho_contracts_ray.stages import jaccard_dup_pairs

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 30)))
             for _ in range(300)]
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    for mb in (1_000_000, 7):
        outs = {}
        for strategy in ("broadcast", "exchange"):
            df = jaccard_dup_pairs(
                rd.from_arrow(t).repartition(5), threshold=0.25, n=2,
                max_bucket=mb, strategy=strategy).to_pandas() \
                .sort_values(["id_a", "id_b"]).reset_index(drop=True)
            outs[strategy] = df
        assert len(outs["broadcast"]) > 0, mb
        assert outs["broadcast"].equals(outs["exchange"]), mb


def test_jaccard_short_docs_never_pair(ray_session):
    import ray.data as rd

    from rho_contracts_ray.stages import jaccard_dup_pairs

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["one two", "one two", None], pa.string())})
    out = jaccard_dup_pairs(rd.from_arrow(t), threshold=0.1, n=3)
    assert out.count() == 0
    assert out.schema().names == ["id_a", "id_b", "jaccard", "truncated"]


@pytest.fixture(scope="module")
def embeddings(ray_session):
    return pq.read_table(f"{SF}/embeddings.parquet")


def test_knn_brute_force_matches_numpy(ray_session, embeddings):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack([np.asarray(v, dtype=np.float32)
                    for v in embeddings["embedding"].to_pylist()])
    ids = np.asarray(embeddings["vec_id"].to_pylist())
    queries = emb[:3]
    out = knn_brute_force(ds, queries, k=5)
    # exact numpy oracle
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    scores = qn @ vn.T
    for qi in range(3):
        order = np.lexsort((ids, -scores[qi]))[:5]
        expect = ids[order].tolist()
        got = out.filter(pa.compute.equal(out["query_id"], qi)) \
                 .sort_by("rank")["vec_id"].to_pylist()
        assert got == expect, (qi, got, expect)
        # query vector's own row must be rank 1 with score ~1
        assert got[0] == ids[qi]


def test_knn_ivf_recall(ray_session, embeddings):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack([np.asarray(v, dtype=np.float32)
                    for v in embeddings["embedding"].to_pylist()])
    queries = emb[:5]
    bf = knn_brute_force(ds, queries, k=3)
    ivf = knn_ivf(rd.read_parquet(f"{SF}/embeddings.parquet"), queries, k=3,
                  n_clusters=8, nprobe=4)
    # top-1 recall: the query's own vector lives in its probed cluster
    for qi in range(5):
        top_bf = bf.filter(pa.compute.equal(bf["query_id"], qi)) \
                   .sort_by("rank")["vec_id"][0].as_py()
        ivf_q = ivf.filter(pa.compute.equal(ivf["query_id"], qi))
        assert ivf_q.num_rows > 0
        assert ivf_q.sort_by("rank")["vec_id"][0].as_py() == top_bf


def test_knn_ivf_pq_recall_and_determinism(ray_session, embeddings):
    """ADC scores are quantized, so PQ is tested on RECALL against the
    exact answer (not score equality), plus partition-independence."""
    from rho_contracts_ray.stages import knn_ivf_pq

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack([np.asarray(v, dtype=np.float32)
                    for v in embeddings["embedding"].to_pylist()])
    queries = emb[:5]
    k = 10
    bf = knn_brute_force(ds, queries, k=k)
    pq_out = knn_ivf_pq(ds, queries, k=k, n_clusters=8, nprobe=4, m_sub=8)
    hits = total = 0
    for qi in range(5):
        want = set(bf.filter(pa.compute.equal(bf["query_id"], qi))
                   ["vec_id"].to_pylist())
        got = set(pq_out.filter(pa.compute.equal(pq_out["query_id"], qi))
                  ["vec_id"].to_pylist())
        # the query's own vector has residual ~0: it must be retrieved
        assert int(embeddings["vec_id"][qi].as_py()) in got
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.6, hits / total

    # identical output under a different partitioning
    pq2 = knn_ivf_pq(rd.read_parquet(f"{SF}/embeddings.parquet")
                     .repartition(7), queries, k=k,
                     n_clusters=8, nprobe=4, m_sub=8)
    assert pq_out.sort_by([("query_id", "ascending"), ("rank", "ascending")]) \
        .equals(pq2.sort_by([("query_id", "ascending"),
                             ("rank", "ascending")]))


def test_knn_oracle_margins_sf001(ray_session):
    """Gate conditions behind the knn / embedding_dup_pairs DuckDB oracles
    at the driver's sf0.01 scale: (a) every top-5 rank boundary has a
    score gap orders of magnitude above float32 error, so engine (f32) and
    SQL ranks cannot diverge; (b) the max pair cosine sits far below the
    0.99 dup threshold, so the empty-result oracle is margin-safe; (c) the
    IVF path returns EXACTLY the brute-force answer here, so both knn
    queries share one oracle."""
    sf = "/root/testdata/sf0.01"
    emb_t = pq.read_table(f"{sf}/embeddings.parquet")
    emb = np.stack([np.asarray(v, dtype=np.float32)
                    for v in emb_t["embedding"].to_pylist()])
    ids = np.asarray(emb_t["vec_id"].to_pylist())
    order = np.argsort(ids)
    q = emb[order[:3]].astype(np.float64)
    vn = emb.astype(np.float64)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = qn @ vn.T
    for qi in range(3):
        s = np.sort(scores[qi])[::-1]
        gaps = s[:5] - s[1:6]          # all consecutive top-5 boundaries
        assert gaps.min() > 1e-4, gaps  # >> f32 error (~1e-6)
    # (b) dup-pair margin
    k = min(len(emb), 2000)
    sims = vn[:k] @ vn[:k].T
    np.fill_diagonal(sims, -1)
    assert sims.max() < 0.9, sims.max()
    # (c) IVF == brute force, same params as the driver queries
    ds = rd.read_parquet(f"{sf}/embeddings.parquet")
    bf = knn_brute_force(ds, emb[order[:3]], k=5) \
        .select(["query_id", "rank", "vec_id"])
    ivf = knn_ivf(rd.read_parquet(f"{sf}/embeddings.parquet"),
                  emb[order[:3]], k=5, n_clusters=8, nprobe=4) \
        .select(["query_id", "rank", "vec_id"])
    assert bf.equals(ivf)


def test_embedding_dup_pairs(ray_session, embeddings):
    # plant an exact duplicate vector
    t = embeddings
    dup = pa.table({
        "vec_id": pa.array([9999], pa.int64()),
        "embedding": t["embedding"].slice(0, 1),
        "label": t["label"].slice(0, 1),
    })
    full = pa.concat_tables([t.select(["vec_id", "embedding", "label"]), dup])
    ds = rd.from_arrow(full)
    pairs = _sorted_pairs(embedding_dup_pairs(ds, threshold=0.999))
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 9999) in got


def test_multimodal_plumbing(ray_session):
    t = make_media_table(50)
    ds = rd.from_arrow(t)
    out = decode_images(ds).to_pandas().sort_values("media_id")
    assert len(out) == 50
    assert set(out["detected_format"]) <= {"png", "jpg", "unknown"}
    assert (out["payload_bytes"] > 0).all()
    assert len(out["features"].iloc[0]) == 64
    # deterministic across runs
    out2 = decode_images(rd.from_arrow(t)).to_pandas().sort_values("media_id")
    assert (out["features"].iloc[0] == out2["features"].iloc[0]).all()
    # real decoder raises on the fake table: its corrupt magic-only
    # payloads are data errors now that PNG AND JPEG pixel decode are
    # real (ValueError from the respective decoder)
    stage = DecodeImageStage(decoder="real")
    with pytest.raises(ValueError):
        stage(t.slice(0, 50))
    jpeg_only = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([b"\xff\xd8fakejpeg"], pa.large_binary()),
    })
    with pytest.raises(ValueError, match="JPEG"):
        stage(jpeg_only)


def test_real_bmp_roundtrip_and_features(ray_session):
    import numpy as np

    from rho_contracts_ray.stages.multimodal import (
        AudioFeaturesStage, decode_bmp, decode_wav, encode_bmp, encode_wav,
        png_header_dims)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()

    samples = (np.sin(np.linspace(0, 80, 16000)) * 20000).astype(np.int16)
    got, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and (got == samples).all()

    # PNG header dims parse lib-free
    import struct
    fake_png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0))
    assert png_header_dims(fake_png) == (640, 480)

    # real image decode end-to-end over a BMP media table
    media = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_bmp(px), encode_bmp(px[:5, :5])],
                            pa.large_binary()),
    })
    out = DecodeImageStage(decoder="real")(media)
    assert out["detected_format"].to_pylist() == ["bmp", "bmp"]
    assert out["width"].to_pylist() == [17, 5]
    assert out["height"].to_pylist() == [13, 5]
    f = np.array(out["features"].to_pylist()[0])
    assert abs(f.sum() - 1.0) < 1e-6  # normalized histogram

    # real audio features end-to-end
    audio = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_wav(samples, 8000)], pa.large_binary()),
    })
    a = AudioFeaturesStage()(audio)
    assert a["rate"].to_pylist() == [8000]
    assert a["duration_ms"].to_pylist() == [2000]
    assert 0.3 < a["rms"].to_pylist()[0] < 0.8
    assert a["zero_crossings"].to_pylist()[0] > 10


def test_resize_image_stage_real_roundtrip(ray_session):
    import ray.data as rd

    from rho_contracts_ray.stages import (DecodeImageStage, ResizeImageStage,
                                          encode_bmp)

    rng = np.random.RandomState(3)
    imgs = [encode_bmp(rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
            for h, w in ((32, 48), (7, 5), (16, 16))]
    t = pa.table({"media_id": pa.array([0, 1, 2], pa.int64()),
                  "payload": pa.array(imgs, pa.binary())})
    resized = ResizeImageStage(out_h=8, out_w=8)(t)
    assert resized["resized"].to_pylist() == [True, True, True]
    # compose with the decode stage: every payload now decodes to 8x8
    dec = DecodeImageStage(decoder="real")(resized)
    assert dec["width"].to_pylist() == [8, 8, 8]
    assert dec["height"].to_pylist() == [8, 8, 8]
    # nearest-neighbor on a constant image is lossless
    const = encode_bmp(np.full((10, 10, 3), 200, np.uint8))
    t2 = pa.table({"media_id": pa.array([0], pa.int64()),
                   "payload": pa.array([const], pa.binary())})
    out = ResizeImageStage(out_h=4, out_w=4)(t2)
    from rho_contracts_ray.stages import decode_bmp
    assert (decode_bmp(out["payload"][0].as_py()) == 200).all()
    # corrupt PNG: flag passes through, raise surfaces the data error
    # (PNG resize is REAL now); JPEG still names the dependency
    png = pa.table({"media_id": pa.array([9], pa.int64()),
                    "payload": pa.array([b"\x89PNG\r\n"], pa.binary())})
    flagged = ResizeImageStage(on_undecodable="flag")(png)
    assert flagged["resized"].to_pylist() == [False]
    with pytest.raises(ValueError, match="PNG"):
        ResizeImageStage()(png)
    jpg = pa.table({"media_id": pa.array([9], pa.int64()),
                    "payload": pa.array([b"\xff\xd8fake"], pa.binary())})
    with pytest.raises(ValueError, match="JPEG"):
        ResizeImageStage()(jpg)
    # real JPEG resizes end-to-end and re-encodes as JPEG (lossy by a
    # couple of LSBs — compare against the resized source pixels)
    from rho_contracts_ray.stages.multimodal import decode_jpeg, encode_jpeg
    pxj = np.full((12, 16, 3), 90, np.uint8)
    pxj[:, 8:] = 200
    real_jpg = pa.table({"media_id": pa.array([2], pa.int64()),
                         "payload": pa.array([encode_jpeg(pxj)],
                                             pa.binary())})
    rj = ResizeImageStage(out_h=4, out_w=4)(real_jpg)
    assert rj["resized"].to_pylist() == [True]
    back = decode_jpeg(rj["payload"][0].as_py())
    assert back.shape == (4, 4, 3)
    assert np.abs(back[:, :2].astype(int) - 90).max() <= 4
    assert np.abs(back[:, 2:].astype(int) - 200).max() <= 4
    # real PNG resizes end-to-end and re-encodes as PNG
    from rho_contracts_ray.stages.multimodal import decode_png, encode_png
    px9 = np.full((10, 12, 3), 77, np.uint8)
    real_png = pa.table({"media_id": pa.array([1], pa.int64()),
                         "payload": pa.array([encode_png(px9)], pa.binary())})
    rp = ResizeImageStage(out_h=4, out_w=4)(real_png)
    assert rp["resized"].to_pylist() == [True]
    assert (decode_png(rp["payload"][0].as_py()) == 77).all()
    # distributed path
    ds_out = rd.from_arrow(t).map_batches(
        ResizeImageStage, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow", batch_size=2, concurrency=(1, 2)).take_all()
    assert all(r["resized"] for r in ds_out)


def test_global_topk_matches_full_sort(ray_session):
    """global_topk (k rows survive per block) == sort().limit(k) on a
    multi-block dataset with ties, for both directions and k > n."""
    from rho_contracts_ray.stages import global_topk

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 50, 5000)          # heavy ties
    ids = np.arange(5000, dtype=np.int64)
    t = pa.table({"v": pa.array(vals.astype(np.float64)), "id": pa.array(ids)})
    ds = rd.from_arrow(t).repartition(16)
    for desc in (True, False):
        got = global_topk(ds, ["v", "id"], 25,
                          descending=[desc, False]).to_pandas()
        want = t.to_pandas().sort_values(
            ["v", "id"], ascending=[not desc, True]).head(25) \
            .reset_index(drop=True)
        assert got.values.tolist() == want.values.tolist()
    # k larger than the dataset returns everything
    small = rd.from_arrow(t.slice(0, 3)).repartition(2)
    assert global_topk(small, ["v", "id"], 100).count() == 3
    with pytest.raises(ValueError, match="positive"):
        global_topk(ds, ["v"], 0)
    with pytest.raises(ValueError, match="descending"):
        global_topk(ds, ["v", "id"], 5, descending=[True])


def test_pii_scrub_redacts(ray_session):
    from rho_contracts_ray.stages import pii_scrub

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "mail me at jane.doe+spam@sub.example.co.uk today",
            "call 555-0100 1234 or 555 010 0999",
            None,                                   # null -> ''
            "no pii here",
        ]),
    })
    out = pii_scrub(t)
    rows = out.to_pylist()
    assert rows[0]["text_scrubbed"] == "mail me at <EMAIL> today"
    assert rows[0]["n_emails"] == 1 and rows[0]["n_long_nums"] == 0
    # one digit-run spans '555-0100 1234' (space and dash both bridge)
    assert "<NUM>" in rows[1]["text_scrubbed"]
    assert rows[1]["n_long_nums"] == 2
    assert rows[2]["text_scrubbed"] == "" and rows[2]["n_emails"] == 0
    assert rows[3]["text_scrubbed"] == "no pii here"
    # distributed path identical
    ds_out = pii_scrub(rd.from_arrow(t).repartition(2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert ds_out["text_scrubbed"].tolist() == \
        [r["text_scrubbed"] for r in rows]


def test_line_stats_exact(ray_session):
    from rho_contracts_ray.stages import line_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a\nb\na\na", "x", None, "\n\n"]),
    })
    out = line_stats(t).to_pylist()
    assert [r["n_lines"] for r in out] == [4, 1, 1, 3]
    assert [r["n_distinct_lines"] for r in out] == [2, 1, 1, 1]
    assert out[0]["dup_line_frac"] == 0.5
    assert out[3]["dup_line_frac"] == pytest.approx(2 / 3)
    # word granularity
    w = line_stats(t.slice(0, 1), sep=" ")
    assert w["n_lines"][0].as_py() == 1     # no spaces -> one unit


def test_rollup_agg_matches_duckdb(ray_session):
    """rollup_agg == GROUP BY ROLLUP for sums+counts at every level."""
    import duckdb

    from rho_contracts_ray.stages import rollup_agg

    rng = np.random.RandomState(11)
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], 400)),
        "b": pa.array(rng.choice(["p", "q"], 400)),
        "v": pa.array(rng.uniform(0, 10, 400).round(3)),
    })
    got = rollup_agg(rd.from_arrow(t).repartition(8), ["a", "b"], "v",
                     sum_col="s", cnt_col="n").to_pandas()
    got["s"] = got["s"].round(6)
    want = duckdb.connect().execute(
        "SELECT a, b, round(sum(v), 6) AS s, count(*)::BIGINT AS n "
        "FROM t GROUP BY ROLLUP(a, b)").df()
    key = ["a", "b"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    want = want.sort_values(key, na_position="last").reset_index(drop=True)
    assert got[["a", "b", "n"]].where(got[["a", "b", "n"]].notna(), None) \
        .values.tolist() == \
        want[["a", "b", "n"]].where(want[["a", "b", "n"]].notna(), None) \
        .values.tolist()
    assert np.allclose(got["s"], want["s"])
    # level row counts: 3*2 finest + 3 mid + 1 grand
    assert len(got) == 10


def test_histogram_bins_exact(ray_session):
    from rho_contracts_ray.stages import histogram

    t = pa.table({"v": pa.array(
        [0.0, 9.999, 10.0, 55.5, None, float("nan"), -1.0, 500.0, 499.999])})
    out = histogram(rd.from_arrow(t).repartition(3), "v", 0.0, 500.0, 50)
    n = out["n"].to_numpy()
    assert out.num_rows == 50                       # zero bins included
    assert n[0] == 2 and n[1] == 1 and n[5] == 1 and n[49] == 1
    assert n.sum() == 5                             # null/NaN/oob dropped
    assert out["bin_lo"][1].as_py() == 10.0
    with pytest.raises(ValueError):
        histogram(rd.from_arrow(t), "v", 0.0, 0.0, 5)


def test_group_argmax_ties_and_partials(ray_session):
    """group_argmax == SQL row_number pick across many blocks, with score
    ties resolved to the smallest id."""
    from rho_contracts_ray.stages import group_argmax

    rng = np.random.RandomState(3)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.randint(0, 40, n).astype("U8")),
        "score": pa.array(rng.randint(0, 5, n).astype(np.int64)),  # ties
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })
    got = group_argmax(rd.from_arrow(t).repartition(16),
                       "k", "score", "id").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    df = t.to_pandas()
    want = df.sort_values(["k", "score", "id"],
                          ascending=[True, False, True]) \
        .groupby("k", as_index=False).first()
    assert got["id"].tolist() == want["id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()


def test_grouping_sets_matches_duckdb(ray_session):
    import duckdb

    from rho_contracts_ray.stages import grouping_sets_agg

    rng = np.random.RandomState(7)
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], 500)),
        "b": pa.array(rng.randint(0, 4, 500).astype(np.int64)),
        "v": pa.array(rng.uniform(0, 10, 500).round(3)),
    })
    got = grouping_sets_agg(rd.from_arrow(t).repartition(8),
                            [["a", "b"], ["b"], []], "v",
                            sum_col="s", cnt_col="n").to_pandas()
    got["s"] = got["s"].round(6)
    want = duckdb.connect().execute(
        "SELECT a, b, round(sum(v), 6) AS s, count(*)::BIGINT AS n "
        "FROM t GROUP BY GROUPING SETS ((a, b), (b), ())").df()
    key = ["a", "b", "n"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    want = want.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(got) == len(want) == 12 + 4 + 1
    assert got["a"].where(got["a"].notna(), "#").tolist() == \
        want["a"].where(want["a"].notna(), "#").tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert np.allclose(got["s"], want["s"])


def test_cube_agg_matches_duckdb(ray_session):
    import duckdb

    from rho_contracts_ray.stages import cube_agg

    rng = np.random.RandomState(5)
    t = pa.table({
        "a": pa.array(rng.choice(["p", "q"], 300)),
        "b": pa.array(rng.choice(["u", "w"], 300)),
        "v": pa.array(rng.randint(0, 100, 300).astype(np.int64)),
    })
    got = cube_agg(rd.from_arrow(t).repartition(4), ["a", "b"], "v",
                   sum_col="s", cnt_col="n").to_pandas()
    want = duckdb.connect().execute(
        "SELECT a, b, sum(v)::BIGINT AS s, count(*)::BIGINT AS n "
        "FROM t GROUP BY CUBE(a, b)").df()
    key = ["a", "b"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    want = want.sort_values(key, na_position="last").reset_index(drop=True)
    assert got["n"].tolist() == want["n"].tolist()
    assert got["s"].astype("int64").tolist() == \
        want["s"].astype("int64").tolist()
    with pytest.raises(ValueError):
        cube_agg(rd.from_arrow(t), list("abcdefg"), "v")


def test_pivot_counts_matches_duckdb(ray_session):
    import duckdb

    from rho_contracts_ray.stages import pivot_counts

    rng = np.random.RandomState(13)
    t = pa.table({
        "u": pa.array(rng.randint(0, 50, 2000).astype(np.int64)),
        "c": pa.array(rng.choice(["a", "b", "z", "other"], 2000)),
    })
    got = pivot_counts(rd.from_arrow(t).repartition(8), "u", "c",
                       ["a", "b", "z"]).to_pandas() \
        .sort_values("u").reset_index(drop=True)
    want = duckdb.connect().execute(
        "SELECT u, sum(CASE WHEN c='a' THEN 1 ELSE 0 END)::BIGINT AS n_a, "
        "sum(CASE WHEN c='b' THEN 1 ELSE 0 END)::BIGINT AS n_b, "
        "sum(CASE WHEN c='z' THEN 1 ELSE 0 END)::BIGINT AS n_z, "
        "count(*)::BIGINT AS total FROM t GROUP BY u ORDER BY u").df()
    for c in ["n_a", "n_b", "n_z", "total"]:
        assert got[c].tolist() == want[c].tolist(), c
    # 'other' rows count toward total only
    assert (got["total"] >= got[["n_a", "n_b", "n_z"]].sum(axis=1)).all()


def test_group_mode_matches_duckdb(ray_session):
    import duckdb

    from rho_contracts_ray.stages import group_mode

    rng = np.random.RandomState(17)
    t = pa.table({
        "k": pa.array(rng.randint(0, 30, 1500).astype(np.int64)),
        "v": pa.array(rng.choice(["x", "y", "z"], 1500)),
    })
    got = group_mode(rd.from_arrow(t).repartition(6), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = duckdb.connect().execute(
        "SELECT k, v, n FROM (SELECT k, v, count(*)::BIGINT AS n, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY count(*) DESC, v) rn "
        "FROM t GROUP BY k, v) WHERE rn = 1 ORDER BY k").df()
    assert got["v"].tolist() == want["v"].tolist()
    assert got["n"].tolist() == want["n"].tolist()

def test_bucketed_group_agg_matches_duckdb(ray_session):
    import duckdb

    from rho_contracts_ray.stages import bucketed_group_agg

    rng = np.random.RandomState(23)
    n = 4000
    t = pa.table({
        "a": pa.array(rng.randint(0, 60, n).astype(np.int64)),
        "b": pa.array(rng.choice(["u", "v", "w"], n)),
        "x": pa.array(rng.randint(0, 1000, n).astype(np.int64)),
    })
    got = bucketed_group_agg(
        rd.from_arrow(t).repartition(12), ["a", "b"],
        [("x", "sum"), ("x", "min"), ("x", "max"), ([], "count_all")],
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    want = duckdb.connect().execute(
        "SELECT a, b, sum(x)::BIGINT AS x_sum, min(x) AS x_min, "
        "max(x) AS x_max, count(*)::BIGINT AS count_all "
        "FROM t GROUP BY a, b ORDER BY a, b").df()
    assert len(got) == len(want)
    for c in ["x_sum", "x_min", "x_max", "count_all"]:
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c
    # explicit bucket override > default still exact
    got2 = bucketed_group_agg(
        rd.from_arrow(t).repartition(12), ["a", "b"],
        [("x", "sum"), ("x", "min"), ("x", "max"), ([], "count_all")],
        n_buckets=37).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert got2["x_sum"].tolist() == got["x_sum"].tolist()
    # duplicate-free / empty-group-safe: zero-row input keeps schema
    empty = bucketed_group_agg(
        rd.from_arrow(t.slice(0, 0)), ["a", "b"], [("x", "sum")])
    assert empty.count() == 0
    assert set(empty.schema().names) == {"a", "b", "x_sum"}

def test_data_scaled_buckets_shape():
    """Bucket sizing: tiny exchanges pay few tasks, huge ones keep
    per-bucket rows bounded, always a power of two in [2, 1024]."""
    import os

    from rho_contracts_ray.stages.distagg import data_scaled_buckets

    assert data_scaled_buckets(0) == 2
    assert data_scaled_buckets(1_000) == 2
    small = data_scaled_buckets(100_000)
    assert 2 <= small <= 16
    big = data_scaled_buckets(10_000_000_000)
    assert big == 1024                       # capped
    for rows in (0, 999, 123_456, 10**7, 10**11):
        n = data_scaled_buckets(rows)
        assert n & (n - 1) == 0 and 2 <= n <= 1024
    os.environ["RHO_REDUCE_BUCKETS"] = "20"
    try:
        assert data_scaled_buckets(5) == 32  # env override, next pow2
    finally:
        del os.environ["RHO_REDUCE_BUCKETS"]

def test_group_collect_matches_duckdb(ray_session):
    import duckdb

    from rho_contracts_ray.stages import group_collect

    rng = np.random.RandomState(31)
    t = pa.table({
        "k": pa.array(rng.randint(0, 25, 1200).astype(np.int64)),
        "v": pa.array([None if i % 37 == 0 else w for i, w in enumerate(
            rng.choice(["aa", "b", "ccc", "d"], 1200))]),
    })
    got = group_collect(rd.from_arrow(t).repartition(6), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = duckdb.connect().execute(
        "SELECT k, string_agg(v, ',' ORDER BY v) AS vals FROM t "
        "WHERE v IS NOT NULL GROUP BY k ORDER BY k").df()
    assert got["vals"].tolist() == want["vals"].tolist()
    gotd = group_collect(rd.from_arrow(t).repartition(6), "k", "v",
                         distinct=True) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    wantd = duckdb.connect().execute(
        "SELECT k, string_agg(DISTINCT v, ',' ORDER BY v) AS vals FROM t "
        "WHERE v IS NOT NULL GROUP BY k ORDER BY k").df()
    assert gotd["vals"].tolist() == wantd["vals"].tolist()

def test_png_codec_roundtrip_and_filters():
    """Lib-free PNG: encode->decode roundtrip, every filter type, every
    supported color type, and clear rejections for unsupported variants."""
    import struct
    import zlib

    import pytest

    from rho_contracts_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (11, 7, 3)).astype(np.uint8)
    assert (decode_png(encode_png(px)) == px).all()

    def build(w, h, ctype, channels, rows_filtered, plte=None):
        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        body = b"".join(bytes([f]) + bytes(r)
                        for f, r in rows_filtered)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", bytes(plte.reshape(-1)))
        return out + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")

    # hand-filter a known RGB image with each filter type per row, then
    # require the decoder to reconstruct the original
    img = rng.randint(0, 256, (5, 4, 3)).astype(np.int32)
    flat = img.reshape(5, -1)
    bpp = 3
    rows = []
    prev = np.zeros(12, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        if f == 0:
            filt = cur % 256
        elif f == 1:
            left = np.concatenate((np.zeros(bpp, np.int32), cur[:-bpp]))
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate((np.zeros(bpp, np.int32), cur[:-bpp]))
            filt = (cur - ((left + prev) >> 1)) % 256
        else:
            filt = np.zeros(12, np.int32)
            for x in range(12):
                a = cur[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
                filt[x] = (cur[x] - pred) % 256
        rows.append((f, filt.astype(np.uint8).tolist()))
        prev = cur
    got = decode_png(build(4, 5, 2, 3, rows))
    assert (got == img.astype(np.uint8).reshape(5, 4, 3)).all()

    # gray -> broadcast RGB
    g = rng.randint(0, 256, (3, 6)).astype(np.uint8)
    rows = [(0, g[y].tolist()) for y in range(3)]
    got = decode_png(build(6, 3, 0, 1, rows))
    assert (got[:, :, 0] == g).all() and (got[:, :, 2] == g).all()

    # palette
    plte = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, (2, 5)).astype(np.uint8)
    rows = [(0, idx[y].tolist()) for y in range(2)]
    got = decode_png(build(5, 2, 3, 1, rows, plte=plte))
    assert (got == plte[idx]).all()

    # RGBA -> alpha dropped
    rgba = rng.randint(0, 256, (2, 3, 4)).astype(np.uint8)
    rows = [(0, rgba[y].reshape(-1).tolist()) for y in range(2)]
    got = decode_png(build(3, 2, 6, 4, rows))
    assert (got == rgba[:, :, :3]).all()

    # rejections name the limitation
    bad16 = bytearray(encode_png(px))
    bad16[24] = 16   # depth byte inside IHDR
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(bad16))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BMnope")


def test_resize_and_decode_png_end_to_end(ray_session):
    """PNG payloads resize and decode REAL through the Ray stages."""
    from rho_contracts_ray.stages.multimodal import (
        DecodeImageStage, ResizeImageStage, decode_png, make_media_table)

    t = make_media_table(40, real=True)
    ds = rd.from_arrow(t).map_batches(
        ResizeImageStage, fn_constructor_kwargs=dict(
            out_h=8, out_w=8, on_undecodable="flag"),
        batch_format="pyarrow", concurrency=2)
    out = ds.map_batches(
        DecodeImageStage, fn_constructor_kwargs=dict(
            decoder="real", on_undecodable="flag"),
        batch_format="pyarrow", concurrency=2).to_pandas()
    kinds = t["kind"].to_pylist()
    png_rows = out[out["detected_format"] == "png"]
    assert len(png_rows) > 0
    assert png_rows["decoded"].all()
    assert (png_rows["width"] == 8).all() and (png_rows["height"] == 8).all()
    # round-trip sanity on one resized payload
    resized = ds.to_pandas()
    row = resized[resized["resized"]].iloc[0]
    assert row["out_width"] == 8

def test_audio_spectral_centroid_pure_tone():
    """A pure sine at f Hz has its spectral centroid at ~f."""
    from rho_contracts_ray.stages.multimodal import (AudioFeaturesStage,
                                                     encode_wav)

    rate = 8000
    t = np.arange(rate)  # 1 second
    for f in (220.0, 880.0, 1760.0):
        wav = encode_wav((np.sin(2 * np.pi * f * t / rate) * 18000)
                         .astype(np.int16), rate)
        media = pa.table({"media_id": pa.array([0], pa.int64()),
                          "payload": pa.array([wav], pa.large_binary())})
        got = AudioFeaturesStage()(media)["spectral_centroid_hz"][0].as_py()
        assert abs(got - f) < f * 0.05 + 5, (f, got)

def test_bucketed_group_agg_property_random_tables(ray_session):
    """Property: bucketed_group_agg == a direct single-table Arrow
    group_by on randomly typed/shaped inputs (nulls included), across
    random bucket counts and partitionings."""
    from hypothesis import given, settings, strategies as st

    from rho_contracts_ray.stages.agg import bucketed_group_agg

    @settings(max_examples=12, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=400),
        nkeys=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        buckets=st.sampled_from([None, 2, 7, 16]),
        parts=st.integers(min_value=1, max_value=6),
        key_kind=st.sampled_from(["int", "str", "int_null"]),
        split_rows=st.sampled_from([None, 10]),   # None = default (off);
        # 10 forces the oversized-bucket sub-range split path on nearly
        # every bucket, pinning it to the same group_by oracle
    )
    def check(n, nkeys, seed, buckets, parts, key_kind, split_rows):
        import os

        if split_rows is None:
            os.environ.pop("RHO_BUCKET_SPLIT_ROWS", None)
        else:
            os.environ["RHO_BUCKET_SPLIT_ROWS"] = str(split_rows)
        rng = np.random.RandomState(seed)
        ki = rng.randint(0, nkeys, n)
        if key_kind == "int":
            k = pa.array(ki.astype(np.int64))
        elif key_kind == "str":
            k = pa.array([f"k{v}" for v in ki])
        else:
            k = pa.array([None if v == 0 else int(v) for v in ki],
                         pa.int64())
        t = pa.table({"k": k,
                      "v": pa.array(rng.randint(-5, 100, n)
                                    .astype(np.int64))})
        got = bucketed_group_agg(
            rd.from_arrow(t).repartition(parts), ["k"],
            [("v", "sum"), ("v", "min"), ([], "count_all")],
            n_buckets=buckets).to_pandas()
        want = t.group_by(["k"]).aggregate(
            [("v", "sum"), ("v", "min"), ([], "count_all")]).to_pandas()
        if len(want) == 0:
            # degenerate empty: a repartitioned zero-row dataset has NO
            # recoverable schema, so the op documents a zero-column empty
            assert len(got) == 0
            return
        key = ["k"]
        got = got.sort_values(key, na_position="last").reset_index(drop=True)
        want = want.sort_values(key, na_position="last") \
            .reset_index(drop=True)
        assert len(got) == len(want)
        for c in ["v_sum", "v_min", "count_all"]:
            assert got[c].fillna(-10**9).tolist() == \
                want[c].fillna(-10**9).tolist(), c

    import os

    try:
        check()
    finally:
        os.environ.pop("RHO_BUCKET_SPLIT_ROWS", None)

def test_distributed_components_property_random_graphs(ray_session):
    """Property: the large-star/small-star path == the driver union-find
    on random multigraphs (self-loops, duplicate and reversed edges,
    negative ids), across bucket counts and the oversized-split path."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        n_edges=st.integers(min_value=1, max_value=250),
        id_space=st.sampled_from([6, 40, 5000]),   # dense -> one blob,
        # medium -> several comps, sparse -> mostly isolated pairs
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        buckets=st.sampled_from([2, 4, 8]),
        split_rows=st.sampled_from([None, 16]),
    )
    def check(n_edges, id_space, seed, buckets, split_rows):
        if split_rows is None:
            os.environ.pop("RHO_BUCKET_SPLIT_ROWS", None)
        else:
            os.environ["RHO_BUCKET_SPLIT_ROWS"] = str(split_rows)
        rng = np.random.RandomState(seed)
        a = rng.randint(0, id_space, n_edges).astype(np.int64) \
            - id_space // 2
        b = rng.randint(0, id_space, n_edges).astype(np.int64) \
            - id_space // 2
        t = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
        got = distributed_components(
            rd.from_arrow(t).repartition(3), small_rows=0,
            n_buckets=buckets).to_pandas()
        assert dict(zip(got["node"], got["component"])) \
            == _components_map(list(zip(a.tolist(), b.tolist())))

    import os

    try:
        check()
    finally:
        os.environ.pop("RHO_BUCKET_SPLIT_ROWS", None)


def test_gif_codec_roundtrip_and_real_lzw():
    """Lib-free GIF: encode(literal-LZW)->decode roundtrip; decode of a
    REAL dictionary-growing LZW stream produced by an independent
    compressor written here; interlace de-weaving; rejections."""
    import struct

    from rho_contracts_ray.stages.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(5)
    # <=256 colors: draw from a small random palette
    pal = rng.randint(0, 256, (11, 3)).astype(np.uint8)
    idx = rng.randint(0, 11, (9, 13))
    px = pal[idx]
    assert (decode_gif(encode_gif(px)) == px).all()

    # independent LZW COMPRESSOR (classic GIF variant) for a differential
    # decode test with genuine dictionary growth
    def lzw_compress(indices, min_code):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        width = min_code + 1
        codes = [clear]
        seq = ()
        for s in indices:
            cand = seq + (int(s),)
            if cand in table:
                seq = cand
                continue
            codes.append(table[seq])
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
            seq = (int(s),)
        if seq:
            codes.append(table[seq])
        codes.append(eoi)
        # pack with the DECODER's width schedule: width grows when
        # next_code reaches 2^width
        out = bytearray()
        acc = nacc = 0
        width = min_code + 1
        nc = eoi + 1
        first = True   # the first code after CLEAR adds no dict entry
        for c in codes:
            acc |= c << nacc
            nacc += width
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
            if c == clear:
                width = min_code + 1
                nc = eoi + 1
                first = True
            elif c != eoi:
                if first:
                    first = False
                elif nc < 4096:
                    nc += 1
                if nc == (1 << width) and width < 12:
                    width += 1
        if nacc:
            out.append(acc & 0xFF)
        return bytes(out)

    w, h = 23, 7
    indices = rng.randint(0, 4, w * h)
    min_code = 2
    lzw = lzw_compress(indices, min_code)
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                       np.uint8)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0xF0 | 1, 0, 0)   # 4-entry GCT
    gif += palette.tobytes()
    gif += struct.pack("<cHHHHB", b",", 0, 0, w, h, 0)
    gif.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        gif.append(len(chunk))
        gif += chunk
    gif += b"\x00;"
    got = decode_gif(bytes(gif))
    assert (got == palette[indices.reshape(h, w)]).all()

    # interlaced flavor of the same image: rows stored in pass order
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    woven = indices.reshape(h, w)[order].reshape(-1)
    gif2 = bytearray(b"GIF89a")
    gif2 += struct.pack("<HHBBB", w, h, 0xF0 | 1, 0, 0)
    gif2 += palette.tobytes()
    gif2 += struct.pack("<cHHHHB", b",", 0, 0, w, h, 0x40)  # interlace bit
    gif2.append(min_code)
    lzw2 = lzw_compress(woven, min_code)
    for i in range(0, len(lzw2), 255):
        chunk = lzw2[i:i + 255]
        gif2.append(len(chunk))
        gif2 += chunk
    gif2 += b"\x00;"
    got2 = decode_gif(bytes(gif2))
    assert (got2 == palette[indices.reshape(h, w)]).all()

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNGnope")
    many = np.zeros((32, 32, 3), np.uint8)          # 1024 distinct colors
    i = np.arange(1024)
    many[..., 0] = (i % 256).reshape(32, 32)
    many[..., 1] = (i // 256).reshape(32, 32)
    with pytest.raises(ValueError, match="256"):
        encode_gif(many)


def test_gif_codec_tiny_palettes():
    """<=2-color and solid-color images: the GCT size field claims
    1 << min_code entries (min_code clamps at 2), so the written table
    must be padded to that length — the unpadded 2-entry table made every
    decoder misparse the stream (ADVICE r3, high)."""
    from rho_contracts_ray.stages.multimodal import decode_gif, encode_gif

    two = np.zeros((5, 7, 3), np.uint8)
    two[::2, 1::3] = [255, 128, 0]               # exactly 2 distinct colors
    assert (decode_gif(encode_gif(two)) == two).all()

    solid = np.full((4, 4, 3), 77, np.uint8)     # 1 distinct color
    assert (decode_gif(encode_gif(solid)) == solid).all()

    three = np.zeros((6, 6, 3), np.uint8)        # 3 colors: psize 4 path
    three[0] = [1, 2, 3]
    three[1] = [9, 9, 9]
    assert (decode_gif(encode_gif(three)) == three).all()


def test_doc_fingerprints_match_scalar_winnowing():
    """The batch-vectorized doc_fingerprints must aggregate exactly what
    the scalar winnowing_fingerprints yields per doc — across empty,
    shorter-than-k, <=w-hash, and long documents."""
    from rho_contracts_ray.stages.text import (doc_fingerprints,
                                               winnowing_fingerprints)

    rng = np.random.RandomState(3)
    texts = ["", "tiny", "just at k!", "x" * 30,
             " ".join(f"w{i}" for i in range(200)),
             "repeat word " * 50, "Ünïcödé ✓ bytes beyond ascii " * 8]
    texts += ["".join(chr(rng.randint(32, 127))
                      for _ in range(rng.randint(0, 400)))
              for _ in range(40)]
    k, w = 8, 16
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = doc_fingerprints(t, k=k, w=w)
    for i, txt in enumerate(texts):
        fp = winnowing_fingerprints(txt, k, w)
        assert out["n_fingerprints"][i].as_py() == fp.size, (i, txt[:30])
        assert out["fp_min"][i].as_py() == (int(fp.min()) if fp.size else 0)
        want_xor = int(np.bitwise_xor.reduce(fp)) if fp.size else 0
        assert out["fp_xor"][i].as_py() == want_xor, (i, txt[:30])


def test_jpeg_codec_roundtrip():
    """Lib-free baseline JPEG: encode (4:4:4, all-ones quant, own
    uniform-length Huffman tables) -> decode round trip.  Flat blocks are
    exact; arbitrary content is within DCT+YCbCr rounding (a few LSBs)."""
    from rho_contracts_ray.stages.multimodal import decode_jpeg, encode_jpeg

    solid = np.full((16, 24, 3), 113, np.uint8)
    assert (decode_jpeg(encode_jpeg(solid)) == solid).all()

    g = np.zeros((24, 40, 3), np.uint8)          # smooth gradient
    g[..., 0] = np.linspace(0, 255, 40, dtype=np.uint8)[None, :]
    g[..., 1] = np.linspace(255, 0, 24, dtype=np.uint8)[:, None]
    g[..., 2] = 127
    got = decode_jpeg(encode_jpeg(g))
    assert np.abs(got.astype(int) - g.astype(int)).max() <= 2

    rng = np.random.RandomState(0)               # worst case: noise,
    r = rng.randint(0, 256, (17, 19, 3)).astype(np.uint8)  # odd dims
    got = decode_jpeg(encode_jpeg(r))
    assert got.shape == r.shape
    assert np.abs(got.astype(int) - r.astype(int)).max() <= 3

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a")


def test_jpeg_decode_handcrafted_dc_only_stream():
    """Independent ground truth (not a round trip): a grayscale SOF0
    stream built byte-by-byte here with its own Huffman tables, whose
    DC-only blocks have analytically known pixels — dequantized DC
    F = diff_sum * q, flat block value = F/8 + 128.  Also exercises the
    restart-interval path (DRI=1, RST0, DC predictor reset)."""
    import struct

    from rho_contracts_ray.stages.multimodal import decode_jpeg

    def headers(w, h, dri=None):
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
        out += struct.pack(">BBB", 1, 0x11, 0)
        # DC table: 12 symbols, all 4 bits (code == symbol)
        out += b"\xff\xc4" + struct.pack(">HB", 31, 0x00)
        out += bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
        # AC table: one symbol (EOB), 2 bits (code 00)
        out += b"\xff\xc4" + struct.pack(">HB", 20, 0x10)
        out += bytes([0, 1] + [0] * 14) + bytes([0x00])
        if dri is not None:
            out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00"
        return out

    # two blocks, no restarts: DC diffs +5 (category 3, bits 101) then
    # -3 (category 2, bits 00; -3 + 2^2-1 = 0) — running DC sums 5, 2.
    # bit stream: [0011 101 00] [0010 00 00] + 1-padding
    # = 00111010 00010000 0 -> 0x3A 0x10 0x7F
    jp = headers(16, 8) + bytes([0x3A, 0x10, 0x7F]) + b"\xff\xd9"
    out = decode_jpeg(bytes(jp))
    assert out.shape == (8, 16, 3)
    assert (out[:, :8] == 5 * 16 // 8 + 128).all()    # 138
    assert (out[:, 8:] == 2 * 16 // 8 + 128).all()    # 132
    # restart interval 1: RST0 between blocks resets the DC predictor,
    # so block 2 encodes +2 absolute (0010 10 00 = 0x28) -> same 132
    jp = headers(16, 8, dri=1) + bytes([0x3A, 0x7F]) + b"\xff\xd0" \
        + bytes([0x28]) + b"\xff\xd9"
    out = decode_jpeg(bytes(jp))
    assert (out[:, :8] == 138).all() and (out[:, 8:] == 132).all()


def test_jpeg_rejects_progressive():
    """SOF2 (progressive) is out of scope and must say so, not misparse."""
    import struct

    from rho_contracts_ray.stages.multimodal import decode_jpeg

    b = bytearray(b"\xff\xd8")
    b += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    b += struct.pack(">BBB", 1, 0x11, 0)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(b))


def test_jpeg_chroma_subsampling_and_grayscale_decode():
    """A 4:2:0 color stream (synthesized by re-tagging sampling factors
    is not valid — instead verify the generic path via a grayscale
    1-component stream and the encoder's 4:4:4 color stream on an image
    whose channels differ, pinning the YCbCr->RGB conversion."""
    from rho_contracts_ray.stages.multimodal import decode_jpeg, encode_jpeg

    px = np.zeros((8, 8, 3), np.uint8)
    px[..., 0] = 200                             # red-dominant block
    got = decode_jpeg(encode_jpeg(px))
    assert np.abs(got[..., 0].astype(int) - 200).max() <= 2
    assert got[..., 1].max() <= 2 and got[..., 2].max() <= 2


def test_group_approx_distinct_accuracy_and_determinism(ray_session):
    """HLL grouped count-distinct: within the p=12 error band of the
    exact answer per key, byte-identical across repartitionings, and
    null-val rows ignored (SQL COUNT(DISTINCT) semantics)."""
    from rho_contracts_ray.stages import group_approx_distinct

    rng = np.random.RandomState(7)
    true = {"a": 40, "b": 700, "c": 6000, "d": 1}
    ks, vs = [], []
    for k, n in true.items():
        draw = rng.randint(0, n, size=n * 3)  # repeats: distinct <= n
        true[k] = len(np.unique(draw))
        ks.extend([k] * draw.size)
        vs.extend((f"{k}:{v}" for v in draw))
    ks.append("a")
    vs.append(None)  # null val must not count
    t = pa.table({"k": pa.array(ks), "v": pa.array(vs, pa.string())})

    out = group_approx_distinct(rd.from_arrow(t).repartition(5), "k", "v",
                                p=12)
    got = {r["k"]: r["approx_distinct"]
           for r in out.take_all()}
    assert set(got) == set(true)
    for k, n in true.items():
        assert abs(got[k] - n) / n <= 0.06, (k, n, got[k])

    out2 = group_approx_distinct(rd.from_arrow(t).repartition(11), "k", "v",
                                 p=12)
    got2 = {r["k"]: r["approx_distinct"] for r in out2.take_all()}
    assert got == got2   # bit-identical: register max is order-free


def test_regex_extract_matches_duckdb(ray_session):
    import duckdb

    from rho_contracts_ray.stages import regex_extract

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["order 42 by alice", "no digits here",
                          None, "order 7 by bob"], pa.string()),
    })
    pat = r"order (?P<num>[0-9]+) by (?P<who>[a-z]+)"
    got = regex_extract(rd.from_arrow(t).repartition(2), pat) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ref = con.execute(
        "SELECT doc_id, regexp_extract(text, 'order ([0-9]+) by ([a-z]+)', 1)"
        " AS num, regexp_extract(text, 'order ([0-9]+) by ([a-z]+)', 2) AS who"
        " FROM t WHERE regexp_matches(text, 'order ([0-9]+) by ([a-z]+)')"
        " ORDER BY doc_id").df()
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["num"].tolist() == ref["num"].tolist()
    assert got["who"].tolist() == ref["who"].tolist()
    # keep-unmatched mode: all rows, nulls for non-matches
    keep = regex_extract(t, pat, drop_unmatched=False)
    assert keep.num_rows == 4 and keep["num"].null_count == 2
    with pytest.raises(ValueError):
        regex_extract(t, "no named groups")


def test_kmeans_distributed_matches_local_lloyd(ray_session, embeddings):
    """Distributed Lloyd == a single-process Lloyd run from the same
    seeded init (same assignment sequence; centroid float drift only),
    and assignment output is consistent with the returned centroids."""
    from rho_contracts_ray.stages import kmeans_assign, kmeans_fit

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    k, iters = 6, 6
    cent, inertia, n_rows = kmeans_fit(ds, k=k, iters=iters, seed=3)
    assert n_rows == embeddings.num_rows and cent.shape[1] == 64

    # local reference: same init path (kmeans_fit's init uses only the
    # deterministic sample), full Lloyd on the whole table
    x = np.stack([np.asarray(v, np.float64)
                  for v in embeddings["embedding"].to_pylist()])
    cent2, _, _ = kmeans_fit(rd.from_arrow(embeddings), k=k, iters=iters,
                             seed=3)
    # both runs see identical data -> identical clustering up to float
    # noise in the partial-sum order
    assert np.allclose(np.sort(cent, axis=0), np.sort(cent2, axis=0),
                       atol=1e-8)

    local_inertia = 0.0
    d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    local_inertia = d.min(axis=1).sum()
    # returned inertia is the PRE-update SSE of the last round; after
    # convergence-ish iters it is within a few percent of the final SSE
    assert inertia <= local_inertia * 1.25 + 1e-9

    out = kmeans_assign(ds, cent).to_pandas()
    assert len(out) == embeddings.num_rows
    assert set(out["cluster"]) <= set(range(k))
    want = d.argmin(axis=1)
    got = out.set_index("vec_id")["cluster"]
    ids = embeddings["vec_id"].to_pylist()
    agree = np.mean([got[i] == want[j] for j, i in enumerate(ids)])
    assert agree > 0.99, agree  # ties/f32-vs-f64 rounding only


def test_group_quantiles_sketch_accuracy(ray_session):
    """t-digest grouped quantiles land within a tight band of the exact
    per-group quantiles (tails especially); all-null groups yield nulls;
    null/NaN values are ignored."""
    import pandas as pd

    from rho_contracts_ray.stages import group_quantiles_sketch

    rng = np.random.RandomState(5)
    ks, vs = [], []
    for k, n in (("a", 20_000), ("b", 3_000), ("c", 7)):
        ks.extend([k] * n)
        vs.extend(rng.normal(100 * (ord(k) - 96), 15, n).tolist())
    ks.extend(["d"] * 5)
    vs.extend([None] * 5)                       # all-null group
    t = pa.table({"k": pa.array(ks), "v": pa.array(vs, pa.float64())})

    out = group_quantiles_sketch(rd.from_arrow(t).repartition(9), "k", "v",
                                 qs=(0.5, 0.99)).to_pandas() \
        .set_index("k").sort_index()
    assert list(out.index) == ["a", "b", "c", "d"]
    assert out.loc["d"].isna().all()
    df = pd.DataFrame({"k": ks, "v": vs})
    for k in ("a", "b", "c"):
        g = df[df.k == k]["v"].dropna()
        for q, col in ((0.5, "p50"), (0.99, "p99")):
            exact = g.quantile(q)
            spread = g.max() - g.min()
            assert abs(out.loc[k, col] - exact) <= 0.02 * spread + 1e-9, \
                (k, q, exact, out.loc[k, col])


def test_dedup_tumbling_matches_duckdb(ray_session):
    """First event per (user, tumbling window) — row set identical to the
    SQL row_number() form, across repartitionings; null ts raises."""
    import duckdb

    from rho_contracts_ray.stages import dedup_tumbling

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    W = 6 * 3600 * 1_000_000  # 6-hour windows, epoch micros
    out = dedup_tumbling(ds.repartition(7), ["user_id"], "ts", W,
                         tiebreak="event_id").to_pandas() \
        .sort_values("event_id")
    con = duckdb.connect()
    ref = con.execute(
        f"SELECT event_id, (epoch_us(ts) // {W}) * {W} AS window_start "
        f"FROM (SELECT *, row_number() OVER (PARTITION BY user_id, "
        f"epoch_us(ts) // {W} ORDER BY ts, event_id) AS rn "
        f"FROM read_parquet('{SF}/events.parquet')) WHERE rn = 1 "
        f"ORDER BY event_id").df()
    assert out["event_id"].tolist() == ref["event_id"].tolist()
    assert out["window_start"].tolist() == ref["window_start"].tolist()
    assert len(out) < ds.count()   # windows actually collapse something

    bad = pa.table({"k": pa.array([1], pa.int64()),
                    "ts": pa.array([None], pa.timestamp("us")),
                    "event_id": pa.array([1], pa.int64())})
    with pytest.raises((ValueError, Exception)):
        dedup_tumbling(rd.from_arrow(bad), ["k"], "ts", W).take_all()


def test_tfidf_top_terms_matches_local(ray_session):
    """Distributed TF-IDF == a local single-process computation with the
    same smoothed-idf formula, including tie order, min_df pruning and
    per-doc multiplicities."""
    from collections import Counter

    from rho_contracts_ray.stages import tfidf_top_terms

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    k = 4
    out = tfidf_top_terms(ds.repartition(5), k=k, min_df=2).to_pandas() \
        .sort_values(["doc_id", "tfidf", "term"],
                     ascending=[True, False, True]).reset_index(drop=True)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    N = len(docs)
    df = Counter()
    for r in docs:
        df.update(set((r["text"] or "").split(" ")))
    want = []
    for r in docs:
        tf = Counter((r["text"] or "").split(" "))
        scored = []
        for term, cnt in tf.items():
            d = df[term]
            if d < 2:
                continue
            s = cnt * (np.log((N + 1.0) / (d + 1.0)) + 1.0)
            if s > 0:
                scored.append((-s, term, cnt, d))
        scored.sort()
        for negs, term, cnt, d in scored[:k]:
            want.append((r["doc_id"], term, cnt, d, -negs))
    want.sort(key=lambda x: (x[0], -x[4], x[1]))
    got = list(zip(out["doc_id"], out["term"], out["tf"], out["df"],
                   out["tfidf"]))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4], (g, w)
        assert g[4] == w[4], (g, w)   # float64 formula identical


def test_new_ops_empty_inputs(ray_session):
    """Zero-row inputs: every round-4 op returns an empty result (no
    crash, no schema explosion)."""
    from rho_contracts_ray.stages import (
        dedup_tumbling, except_distinct, group_approx_distinct,
        group_quantiles_sketch, intersect_distinct, regex_extract,
        tfidf_top_terms, unnest_list, weighted_sample,
    )

    et = pa.table({"doc_id": pa.array([], pa.int64()),
                   "text": pa.array([], pa.string()),
                   "w": pa.array([], pa.float64()),
                   "ts": pa.array([], pa.timestamp("us")),
                   "arr": pa.array([], pa.list_(pa.int64()))})
    ds = lambda: rd.from_arrow(et)

    assert intersect_distinct(ds(), ds(), ["doc_id"]).count() == 0
    assert except_distinct(ds(), ds(), ["doc_id"]).count() == 0
    assert unnest_list(ds(), "arr").count() == 0
    assert regex_extract(ds(), r"(?P<x>[a-z]+)").count() == 0
    assert weighted_sample(ds(), "doc_id", "w", 0.5).count() == 0
    assert group_approx_distinct(ds(), "doc_id", "text").count() == 0
    assert group_quantiles_sketch(ds(), "doc_id", "w").count() == 0
    assert dedup_tumbling(ds(), ["doc_id"], "ts", 1000).count() == 0
    assert tfidf_top_terms(ds()).count() == 0


def test_ahash_cross_format_dedup(ray_session):
    from rho_contracts_ray.stages.multimodal import (
        ahash64_pixels, encode_bmp, encode_gif, encode_jpeg, encode_png,
        media_ahash_dedup)

    rng = np.random.default_rng(5)
    px_a = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    # a clearly different image (inverted)
    px_b = (255 - px_a)[::-1]
    t = pa.table({
        "media_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "kind": pa.array(["image"] * 5),
        "payload": pa.array([
            encode_bmp(px_a), encode_png(px_a),          # exact dups
            encode_jpeg(px_a),                           # lossy near-dup
            encode_bmp(px_b),                            # different
            b"not an image",                             # undecodable
        ], pa.large_binary()),
    })
    out = []
    res = media_ahash_dedup(rd.from_arrow(t), concurrency=(1, 2))
    for b in res.iter_batches(batch_size=None, batch_format="pyarrow"):
        tb = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if tb.num_rows:
            out.append(tb)
    got = pa.concat_tables(out).to_pandas().set_index("keep_id") \
        .sort_index()
    # BMP+PNG of the same pixels share one group kept at id 1
    assert int(got.loc[1, "cnt"]) >= 2
    assert 2 not in got.index
    # the different image is its own group; undecodable row dropped
    assert int(got.loc[4, "cnt"]) == 1
    assert 5 not in got.index
    # JPEG re-encode stays within a few aHash bits of the source
    h_exact = ahash64_pixels(px_a)
    from rho_contracts_ray.stages.multimodal import decode_jpeg
    h_jpeg = ahash64_pixels(decode_jpeg(encode_jpeg(px_a)))
    assert bin(h_exact ^ h_jpeg).count("1") <= 6


def test_ahash_raise_on_undecodable(ray_session):
    from rho_contracts_ray.stages.multimodal import AHashStage

    stage = AHashStage(on_undecodable="raise")
    bad = pa.table({"media_id": pa.array([9], pa.int64()),
                    "payload": pa.array([b"junk"], pa.large_binary())})
    with pytest.raises(ValueError):
        stage(bad)
    with pytest.raises(ValueError, match="method"):
        AHashStage(method="dhash")


def test_phash_cross_format_dedup_and_robustness(ray_session):
    from rho_contracts_ray.stages.multimodal import (
        decode_jpeg, encode_bmp, encode_jpeg, encode_png,
        media_ahash_dedup, phash64_pixels)

    rng = np.random.default_rng(11)
    base = rng.integers(40, 200, (24, 18, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["image"] * 3),
        "payload": pa.array([encode_bmp(base), encode_png(base),
                             encode_bmp(other)], pa.large_binary()),
    })
    res = media_ahash_dedup(rd.from_arrow(t), concurrency=(1, 2),
                            method="phash")
    parts = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
             for b in res.iter_batches(batch_size=None,
                                       batch_format="pyarrow")]
    got = pa.concat_tables([p for p in parts if p.num_rows]) \
        .to_pandas().set_index("keep_id").sort_index()
    assert "phash" in got.columns
    assert int(got.loc[1, "cnt"]) == 2 and 2 not in got.index
    assert int(got.loc[3, "cnt"]) == 1

    # the pHash differentiator: a global brightness shift flips few bits
    # (frequency-domain median threshold), and JPEG noise stays close
    h = phash64_pixels(base)
    brighter = np.clip(base.astype(np.int64) + 40, 0, 255) \
        .astype(np.uint8)
    assert bin(h ^ phash64_pixels(brighter)).count("1") <= 4
    h_jpeg = phash64_pixels(decode_jpeg(encode_jpeg(base)))
    assert bin(h ^ h_jpeg).count("1") <= 8
    # a genuinely different image is far in Hamming distance
    assert bin(h ^ phash64_pixels(other)).count("1") >= 16


def test_quality_buckets_planted_fence_ties(ray_session):
    """6 one-token docs with token counts 3/2/1 put BOTH fences exactly on
    data values (quantile_cont interpolates between equal neighbors), so
    this pins the tie rule: a doc ON a fence goes to the HIGHER bucket."""
    import math

    from rho_contracts_ray.stages.text import quality_buckets

    t = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array(["a", "a", "a", "b", "b", "c"]),
    })
    out = quality_buckets(rd.from_arrow(t)).to_pandas() \
        .set_index("doc_id").sort_index()
    exp_lp = {"a": round(math.log(3 / 6), 6),
              "b": round(math.log(2 / 6), 6),
              "c": round(math.log(1 / 6), 6)}
    exp = ["head", "head", "head", "middle", "middle", "tail"]
    toks = ["a", "a", "a", "b", "b", "c"]
    for i in range(6):
        assert out.loc[i, "bucket"] == exp[i], (i, out.loc[i].to_dict())
        assert out.loc[i, "avg_logprob"] == pytest.approx(exp_lp[toks[i]])


def test_gopher_rules_planted_cases(ray_session):
    """Hand-computed Gopher-rule verdicts: a passing doc, every single-rule
    failure mode, and the null/empty edge (n_words=0 -> ratios 0)."""
    from rho_contracts_ray.stages.text import gopher_rules

    good = ("the cat sat with that dog and they have gone " * 6).strip()
    few_words = "the cat have with"                      # < min_words
    short_words = ("a b c d the of to and have with " * 8).strip()
    symbols = " ".join(["#tag the with have"] * 20)      # 20 '#' / 80 words
    no_alpha = " ".join(["111 222 the with"] * 20)       # alpha 0.5
    no_stop = " ".join(["zyx wvu tsr qpo nml"] * 12)     # 0 stopwords
    t = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([good, few_words, short_words, symbols,
                          no_alpha, no_stop, "", None]),
    })
    out = gopher_rules(rd.from_arrow(t)).to_pandas() \
        .set_index("doc_id").sort_index()

    assert out.loc[0, "keep"] and out.loc[0, "n_words"] == 60
    assert not out.loc[1, "keep"] and out.loc[1, "n_words"] == 4
    assert not out.loc[2, "keep"]
    assert out.loc[2, "mean_word_len"] < 3.0
    assert not out.loc[3, "keep"]
    assert out.loc[3, "symbol_ratio"] == pytest.approx(20 / 80)
    assert not out.loc[4, "keep"]
    assert out.loc[4, "alpha_ratio"] == pytest.approx(0.5)
    assert not out.loc[5, "keep"] and out.loc[5, "n_stopwords"] == 0
    for i in (6, 7):  # empty and null: zero words, all ratios 0
        assert not out.loc[i, "keep"]
        assert out.loc[i, "n_words"] == 0
        assert out.loc[i, "mean_word_len"] == 0.0
        assert out.loc[i, "alpha_ratio"] == 0.0
    # stopword count is distinct-presence (the/with/that/and/have = 5),
    # not occurrence count (each appears 6 times in doc 0)
    assert out.loc[0, "n_stopwords"] == 5


def test_json_extract_vectorized_and_fallback(ray_session):
    """NDJSON fast path (typed nulls for null/blank rows), dotted-path
    struct extraction, and the per-batch slow fallback on malformed rows
    — all through a real Dataset."""
    import pandas as pd

    from rho_contracts_ray.stages.jsoncol import json_extract

    t = pa.table({
        "i": pa.array(list(range(6)), pa.int64()),
        "j": pa.array(['{"k": 87, "u": {"id": 3}}', '{"k": null}', None,
                       '  ', '{"u": {"id": 9}}', '{"k": -2}']),
    })
    out = json_extract(rd.from_arrow(t), "j",
                       {"k": pa.int64(), "u.id": pa.int64()},
                       keep_cols=("i",)).to_pandas().set_index("i")
    assert out.loc[0, "k"] == 87 and out.loc[0, "u_id"] == 3
    assert pd.isna(out.loc[1, "k"]) and pd.isna(out.loc[2, "k"])
    assert pd.isna(out.loc[3, "k"]) and out.loc[4, "u_id"] == 9
    assert out.loc[5, "k"] == -2

    # malformed row triggers the slow path for that batch only — same shape
    bad = pa.table({"i": pa.array([0, 1], pa.int64()),
                    "j": pa.array(['{"k": 1}', "NOT JSON"])})
    out2 = json_extract(bad, "j", {"k": pa.int64()}, keep_cols=("i",))
    assert out2["k"].to_pylist() == [1, None]

    # sliced (non-zero offset) arrays hit the buffer-window arithmetic
    out3 = json_extract(t.slice(3, 3), "j", {"k": pa.int64()},
                        keep_cols=("i",))
    assert out3["k"].to_pylist() == [None, None, -2]


def test_top_ngram_stats_planted(ray_session):
    """Hand-computed heaviest-gram masses, incl. overlapping occurrences
    (frac may exceed 1 — the documented count x chars statistic), sub-n
    docs, and empty/null texts."""
    from rho_contracts_ray.stages.text import top_ngram_stats

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b a",      # top2 'a b'x2 mass 4; top3 'a b a'x2 mass 6
                          "xx yy",           # single 2-gram mass 4; no 3-gram
                          "", None]),
    })
    out = top_ngram_stats(rd.from_arrow(t)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "top2_mass"] == 4 and out.loc[0, "top2_frac"] == 0.8
    assert out.loc[0, "top3_mass"] == 6 and out.loc[0, "top3_frac"] == 1.2
    assert out.loc[1, "top2_mass"] == 4 and out.loc[1, "top3_mass"] == 0
    for i in (2, 3):
        assert out.loc[i, "n_words"] == 0 and out.loc[i, "top2_frac"] == 0.0


def test_pmi_collocations_planted(ray_session):
    """Micro-corpus with one overwhelming collocation: 'new york' occurs
    together every time either word appears -> highest PMI; compare the
    full top-k against a local numpy reference."""
    import itertools
    import math

    from rho_contracts_ray.stages.text import pmi_top_collocations

    docs = ["new york " * 5 + "a b", "a c new york", "b c a a",
            "c b a new york"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array([d.strip() for d in docs])})
    out = pmi_top_collocations(rd.from_arrow(t), k=50, min_count=1) \
        .to_pandas()
    # local reference
    uni, bi = {}, {}
    for d in [x.strip() for x in docs]:
        w = d.split(" ")
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for x, y in zip(w, w[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
    n1, n2 = sum(uni.values()), sum(bi.values())
    ref = sorted(
        ((math.log((c / n2) / ((uni[x] / n1) * (uni[y] / n1))), x, y, c)
         for (x, y), c in bi.items()),
        key=lambda r: (-r[0], r[1], r[2]))
    got = list(zip(out["pmi"], out["w1"], out["w2"], out["pair_count"]))
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert (g[1], g[2], g[3]) == (r[1], r[2], r[3])
        assert g[0] == pytest.approx(r[0], abs=1e-12)
    assert (out.loc[0, "w1"], out.loc[0, "w2"]) == ("new", "york")


def test_vocab_growth_planted(ray_session):
    from rho_contracts_ray.stages.text import vocab_growth

    t = pa.table({
        "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
        "text": pa.array(["b c", "a b", None, "  a"], pa.string()),
    })
    # doc 1 introduces {a, b}; doc 2 null -> nothing; doc 3 adds {c};
    # doc 4 is only split artifacts + 'a' (seen) -> nothing
    for parts in (1, 3):
        out = vocab_growth(rd.from_arrow(t).repartition(parts)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(out["doc_id"]) == [1, 3]
        assert list(out["new_tokens"]) == [2, 1]
        assert list(out["cum_vocab"]) == [2, 3]


def test_vocab_growth_empty(ray_session):
    from rho_contracts_ray.stages.text import vocab_growth

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    assert vocab_growth(ds).count() == 0


def test_type_token_ratio_planted(ray_session):
    from rho_contracts_ray.stages.text import type_token_ratio

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b a", None, " "], pa.string())})
    out = type_token_ratio(rd.from_arrow(t)).to_pandas()
    assert list(out["doc_id"]) == [1]      # empty-token docs omitted
    assert list(out["n_tokens"]) == [3]
    assert list(out["n_types"]) == [2]
    assert out["ttr"].iloc[0] == pytest.approx(2 / 3, abs=1e-6)


def test_first_digit_counts_planted(ray_session):
    from rho_contracts_ray.stages.statistics import first_digit_counts

    t = pa.table({"v": pa.array(
        [1.0, 19.5, 0.23, 923.0, 9.0, -5.0, 0.0, None])})
    for parts in (1, 3):
        out = first_digit_counts(rd.from_arrow(t).repartition(parts),
                                 "v").to_pandas() \
            .sort_values("digit").reset_index(drop=True)
        # digits: 1, 1, 2, 9, 9 — negatives/zero/null dropped
        assert list(out["digit"]) == [1, 2, 9]
        assert list(out["n"]) == [2, 1, 2]


def test_group_weighted_median_planted(ray_session):
    from rho_contracts_ray.stages.statistics import group_weighted_median

    # group a: values 1..4 weights 1,1,1,10 -> half of 13 is 6.5,
    # crossing at v=4; group b: equal weights -> lower median 2 of [1,2,3]
    t = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 3),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 3.0, 1.0, 2.0]),
        "w": pa.array([1.0, 1.0, 1.0, 10.0, 1.0, 1.0, 1.0]),
    })
    for parts in (1, 3):
        out = group_weighted_median(
            rd.from_arrow(t).repartition(parts), "g", "v", "w") \
            .to_pandas().sort_values("g").reset_index(drop=True)
        assert list(out["wmedian"]) == [4.0, 2.0]


def test_group_weighted_median_null_and_nonpositive_weights(ray_session):
    from rho_contracts_ray.stages.statistics import group_weighted_median

    t = pa.table({"g": pa.array(["a"] * 4),
                  "v": pa.array([10.0, 1.0, 2.0, None]),
                  "w": pa.array([0.0, 1.0, 1.0, 5.0])})
    out = group_weighted_median(rd.from_arrow(t), "g", "v", "w") \
        .to_pandas()
    # zero-weight 10.0 and null value drop -> median of {1: 1, 2: 1} = 1
    assert list(out["wmedian"]) == [1.0]


def test_fuzzy_decontam_catches_edits_and_self(ray_session):
    from rho_contracts_ray.stages.dedup import fuzzy_decontam

    hold_txt = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
    near = hold_txt.replace("lazy", "sleepy")          # light edit
    other = "completely different content about spark window functions"
    train = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([hold_txt, near, other])})
    hold = pa.table({"doc_id": pa.array([100], pa.int64()),
                     "text": pa.array([hold_txt])})
    out = fuzzy_decontam(rd.from_arrow(train), rd.from_arrow(hold)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    flagged = set(out["doc_id"])
    assert 1 in flagged                  # exact copy always flags
    assert 2 in flagged                  # near-dup caught by banding
    assert 3 not in flagged
    # exact copy hits every band
    assert int(out.loc[out["doc_id"] == 1, "n_bands_hit"].iloc[0]) == 32


def test_fuzzy_decontam_empty_holdout(ray_session):
    from rho_contracts_ray.stages.dedup import fuzzy_decontam

    train = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["anything"])})
    hold = pa.table({"doc_id": pa.array([], pa.int64()),
                     "text": pa.array([], pa.string())})
    out = fuzzy_decontam(rd.from_arrow(train), rd.from_arrow(hold))
    assert out.count() == 0


def test_mann_kendall_planted(ray_session):
    from rho_contracts_ray.stages.statistics import mann_kendall_s

    # key 1: strictly increasing 4 values -> S = C(4,2) = 6;
    # key 2: strictly decreasing 3 -> S = -3; key 3: constant -> 0
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 2, 3, 3], pa.int64()),
        "o": pa.array([1, 2, 3, 4, 1, 2, 3, 1, 2], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 9.0, 5.0, 1.0, 7.0, 7.0]),
    })
    for parts in (1, 4):
        out = mann_kendall_s(rd.from_arrow(t).repartition(parts),
                             "k", ["o"], "v") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert list(out["s_stat"]) == [6, -3, 0]
        assert list(out["n_obs"]) == [4, 3, 2]


def test_mann_kendall_group_ceiling_raises(ray_session):
    import pytest as _pytest

    from rho_contracts_ray.stages.statistics import mann_kendall_s

    t = pa.table({"k": pa.array([1] * 10, pa.int64()),
                  "o": pa.array(range(10), pa.int64()),
                  "v": pa.array([float(i) for i in range(10)])})
    with _pytest.raises(Exception, match="max_group"):
        mann_kendall_s(rd.from_arrow(t), "k", ["o"], "v",
                       max_group=5).materialize()


def test_cusum_changepoint_planted(ray_session):
    from rho_contracts_ray.stages.statistics import cusum_changepoint

    # level shift after index 3: [0,0,0,0,10,10,10,10] ->
    # D_k = n*cum - k*tot peaks (in |.|) at k=4
    t = pa.table({
        "k": pa.array([1] * 8, pa.int64()),
        "o": pa.array(range(8), pa.int64()),
        "c": pa.array([0, 0, 0, 0, 10, 10, 10, 10], pa.int64()),
    })
    for parts in (1, 3):
        out = cusum_changepoint(rd.from_arrow(t).repartition(parts),
                                "k", ["o"], "c").to_pandas()
        assert list(out["cp_index"]) == [4]
        assert list(out["d_max"]) == [8 * 0 - 4 * 40]   # -160
        assert list(out["n_obs"]) == [8]


def test_theil_sen_planted(ray_session):
    from rho_contracts_ray.stages.statistics import theil_sen_slope

    # key 1: perfect line v = 3x + 1 -> slope exactly 3 (all pairs);
    # key 2: one wild outlier barely moves the median
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 2, 2, 2], pa.int64()),
        "x": pa.array([0.0, 1.0, 2.0, 3.0, 0.0, 1.0, 2.0, 3.0, 4.0]),
        "v": pa.array([1.0, 4.0, 7.0, 10.0, 0.0, 1.0, 2.0, 3.0, 100.0]),
    })
    for parts in (1, 3):
        out = theil_sen_slope(rd.from_arrow(t).repartition(parts),
                              "k", "x", "v") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert out.loc[0, "ts_slope"] == 3.0
        assert out.loc[0, "n_pairs"] == 6
        assert out.loc[1, "n_pairs"] == 10
        assert out.loc[1, "ts_slope"] == 1.0   # median resists outlier


def test_theil_sen_ties_and_ceiling(ray_session):
    import pytest as _pytest

    from rho_contracts_ray.stages.statistics import theil_sen_slope

    # equal-x pairs are excluded; a group with ONLY tied x drops
    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "x": pa.array([2.0, 2.0]),
                  "v": pa.array([1.0, 9.0])})
    assert theil_sen_slope(rd.from_arrow(t), "k", "x", "v").count() == 0
    big = pa.table({"k": pa.array([1] * 9, pa.int64()),
                    "x": pa.array([float(i) for i in range(9)]),
                    "v": pa.array([float(i) for i in range(9)])})
    with _pytest.raises(Exception, match="max_group"):
        theil_sen_slope(rd.from_arrow(big), "k", "x", "v",
                        max_group=5).materialize()


def test_pair_set_pr_confusion(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rho_contracts_ray.stages.dedup import pair_set_pr

    pred = pa.table({"id_a": [1, 1, 2, 5], "id_b": [2, 3, 3, 6]})
    truth = pa.table({"id_a": [1, 2, 7], "id_b": [2, 3, 8]})
    # tp = {(1,2),(2,3)}; fp = {(1,3),(5,6)}; fn = {(7,8)}
    for wrap in (lambda t: t, lambda t: rd.from_arrow(t).repartition(2)):
        out = pair_set_pr(wrap(pred), wrap(truth)).to_pylist()[0]
        assert out == {"n_pred": 4, "n_truth": 3, "tp": 2, "fp": 2,
                       "fn": 1, "precision": 0.5,
                       "recall": round(2 / 3, 6),
                       "f1": round(4 / 7, 6)}


def test_pair_set_pr_empty_sides(ray_session):
    import pyarrow as pa

    from rho_contracts_ray.stages.dedup import pair_set_pr

    e = pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())})
    p = pa.table({"id_a": [1], "id_b": [2]})
    out = pair_set_pr(p, e).to_pylist()[0]
    assert (out["n_pred"], out["n_truth"], out["tp"]) == (1, 0, 0)
    assert out["precision"] == 0.0 and out["recall"] is None
    out = pair_set_pr(e, e).to_pylist()[0]
    assert out["f1"] is None


def test_exact_dedup_nullable_int_schema_stable(ray_session):
    """exact_dedup buckets rebuild through pandas; a nullable int64
    column must come back int64 in EVERY block (schema pinned), not
    float64 in the buckets whose kept rows contain a null
    (code-review regression)."""
    import numpy as np

    from rho_contracts_ray.stages.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "key": pa.array([f"k{i % 10}" for i in range(100)]),
        "extra": pa.array([None if i % 7 == 0 else i for i in range(100)],
                          pa.int64()),
    })
    out = exact_dedup(rd.from_arrow(t).repartition(5), ["key"], "doc_id")
    tab = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in out.iter_batches(batch_size=None, batch_format="pyarrow"))
    assert tab.schema.field("extra").type == pa.int64()
    assert tab.num_rows == 10
    # min doc_id per key kept
    want = {f"k{i}": i for i in range(10)}
    got = dict(zip(tab["key"].to_pylist(), tab["doc_id"].to_pylist()))
    assert got == want


def test_rollup_all_null_values_grand_total_is_null(ray_session):
    """GROUP BY ROLLUP parity on an all-null value column: every level's
    sum — INCLUDING the grand total — is NULL with count 0, exactly what
    DuckDB returns (code-review regression: the grand total coerced to
    0)."""
    import duckdb

    from rho_contracts_ray.stages.agg import rollup_agg

    t = pa.table({
        "a": pa.array(["x", "x", "y"]),
        "v": pa.array([None, None, None], pa.int64()),
    })
    out = rollup_agg(rd.from_arrow(t), ["a"], "v").to_pandas() \
        .sort_values("a", na_position="last").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    ref = con.execute(
        "SELECT a, sum(v) AS sum_value, count(v) AS n FROM t "
        "GROUP BY ROLLUP(a) ORDER BY a NULLS LAST").df()
    assert out["sum_value"].isna().all() and ref["sum_value"].isna().all()
    assert out["a"].fillna("<null>").tolist() == \
        ref["a"].fillna("<null>").tolist()


def test_exact_dup_groups_string_ids_native_keep_id(ray_session):
    """min_count>=2 path with STRING ids: keep_id keeps the native type
    (code-review regression: an int64 cast crashed on string ids while
    the min_count=1 and pa.Table paths preserved them)."""
    from rho_contracts_ray.stages.dedup import exact_dup_groups

    t = pa.table({
        "text": pa.array(["a", "a", "b", "b", "b", "c"]),
        "uid": pa.array(["u5", "u1", "u9", "u2", "u8", "u0"]),
    })
    out = exact_dup_groups(rd.from_arrow(t).repartition(3),
                           ["text"], "uid", min_count=2).to_pandas()
    got = dict(zip(out["text"], out["keep_id"]))
    assert got == {"a": "u1", "b": "u2"}
    assert out["keep_id"].dtype == object        # string, not int


def test_minhash_bands_exceed_num_perm_raises(ray_session):
    from rho_contracts_ray.stages.dedup import minhash_dup_pairs

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["hello world test", "hello world test"])})
    import pytest
    with pytest.raises(ValueError, match="bands"):
        minhash_dup_pairs(rd.from_arrow(t), num_perm=16, bands=32)


def test_simhash_truncated_flag_surfaces(ray_session):
    """A band bucket larger than max_bucket truncates; every emitted pair
    from that bucket must carry truncated=True (code-review regression:
    the flag was silently dropped)."""
    from rho_contracts_ray.stages.dedup import simhash_dup_pairs

    n = 8
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["identical boilerplate text content here"] * n),
    })
    out = simhash_dup_pairs(rd.from_arrow(t), max_hamming=3,
                            max_bucket=4).to_pandas()
    assert "truncated" in out.columns
    assert len(out) > 0 and out["truncated"].all()
    # and an untruncated corpus reports False
    out2 = simhash_dup_pairs(rd.from_arrow(t), max_hamming=3,
                             max_bucket=100).to_pandas()
    assert len(out2) == n * (n - 1) // 2 and not out2["truncated"].any()


def test_distributed_components_sequential_ids_forced_exchange(ray_session):
    """Star rounds route on a HASH of the center (code-review regression:
    raw sequential ids all collapsed into hash-range bucket 0).  Forcing
    the distributed path on a sequential-id chain+clique graph must give
    the same components as the single-task union-find."""
    from rho_contracts_ray.stages.dedup import distributed_components

    edges = [(i, i + 1) for i in range(0, 40, 2)]          # 20 tiny comps
    edges += [(100 + i, 100 + i + 1) for i in range(30)]   # one chain
    t = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                  "id_b": pa.array([b for _, b in edges], pa.int64())})
    big = distributed_components(rd.from_arrow(t).repartition(4),
                                 small_rows=0, n_buckets=8).to_pandas()
    small = distributed_components(rd.from_arrow(t)).to_pandas()
    a = dict(zip(big["node"], big["component"]))
    b = dict(zip(small["node"], small["component"]))
    assert a == b and len(a) == 40 + 31

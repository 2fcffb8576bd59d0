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


def test_dsir_scores_match_single_process_reference(ray_session):
    """dsir_scores vs a single-process numpy reference on real sf0.001
    documents (target = lang=='en' slice): same hashed-gram histograms,
    same smoothed log-ratio weights, same per-doc means — bit-for-bit
    at the rounded 6dp output, partition-invariant."""
    import numpy as np
    import pyarrow.parquet as pq

    from rho_contracts_ray.functions.hashing import stable_hash64
    from rho_contracts_ray.stages.text import dsir_scores, gram_arrays

    SF = "/root/testdata/sf0.001"
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    raw = t.select(["doc_id", "text"])
    tgt = t.filter(pa.compute.equal(
        pa.compute.fill_null(t["lang"], ""), "en")).select(
        ["doc_id", "text"])

    # single-process reference
    k, alpha, n = 1 << 16, 1.0, 2
    mask = np.uint64(k - 1)

    def hist(tab):
        grams, _ = gram_arrays(tab["text"].combine_chunks(), n, " ")
        h = np.zeros(k, np.int64)
        if len(grams):
            idx = (stable_hash64(grams) & mask).astype(np.int64)
            np.add.at(h, idx, 1)
        return h, int(h.sum())

    th, tt = hist(tgt)
    rh, rt = hist(raw)
    w = ((np.log(th + alpha) - np.log(float(tt) + alpha * k))
         - (np.log(rh + alpha) - np.log(float(rt) + alpha * k)))
    grams, doc_idx = gram_arrays(raw["text"].combine_chunks(), n, " ")
    idx = (stable_hash64(grams) & mask).astype(np.int64)
    sums = np.bincount(doc_idx, weights=w[idx], minlength=raw.num_rows)
    cnts = np.bincount(doc_idx, minlength=raw.num_rows)
    want = {int(d): (None if c == 0 else round(float(s / c), 6))
            for d, s, c in zip(raw["doc_id"].to_pylist(), sums, cnts)}

    for parts in (2, 7):
        out = dsir_scores(rd.from_arrow(raw).repartition(parts),
                          rd.from_arrow(tgt)).to_pandas()
        assert len(out) == raw.num_rows
        got = {int(r.doc_id):
               (None if r.n_grams == 0 else round(float(r.dsir_score), 6))
               for r in out.itertuples()}
        assert got == want
    # en documents should, on average, outscore the rest (sanity of sign)
    out = dsir_scores(rd.from_arrow(raw), rd.from_arrow(tgt)).to_pandas()
    lang = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    en = [s for d, s in zip(out.doc_id, out.dsir_score)
          if lang.get(d) == "en" and s == s]
    rest = [s for d, s in zip(out.doc_id, out.dsir_score)
            if lang.get(d) != "en" and s == s]
    assert np.mean(en) > np.mean(rest)


def test_dsir_zero_gram_corpus_keeps_rows(ray_session):
    """A corpus with rows but no n-grams (every doc < n tokens) must
    still emit one (null score, n_grams=0) row per document, not an
    empty Dataset (code-review regression)."""
    from rho_contracts_ray.stages.text import dsir_scores

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["one", "word", None])})
    out = dsir_scores(rd.from_arrow(t), rd.from_arrow(t)).to_pandas()
    assert len(out) == 3
    assert out["n_grams"].tolist() == [0, 0, 0]
    assert out["dsir_score"].isna().all()


def test_text_ops_preserve_string_ids(ray_session):
    """decontaminate_ngrams / unigram_logprob / bigram_logprob /
    vocab_growth with a STRING id column: native type preserved end to
    end, no int64 cast crash or silent '007'->7 corruption
    (code-review regression batch)."""
    from rho_contracts_ray.stages.text import (bigram_logprob,
                                               decontaminate_ngrams,
                                               unigram_logprob,
                                               vocab_growth)

    t = pa.table({
        "doc_id": pa.array(["007", "7", "doc-a", "doc-b"]),
        "text": pa.array(["alpha beta gamma delta",
                          "alpha beta gamma delta",
                          "epsilon zeta eta theta",
                          "alpha beta unique words"]),
    })
    ds = rd.from_arrow(t).repartition(2)
    holdout = pa.table({"text": pa.array(["alpha beta gamma delta"])})
    out = decontaminate_ngrams(ds, rd.from_arrow(holdout), n=3,
                               min_shared=1).to_pandas()
    assert set(out["doc_id"]) == {"007", "7"}   # distinct ids preserved
    uni = unigram_logprob(ds).to_pandas()
    assert set(uni["doc_id"]) == {"007", "7", "doc-a", "doc-b"}
    bi = bigram_logprob(ds).to_pandas()
    assert set(bi["doc_id"]) == {"007", "7", "doc-a", "doc-b"}
    vg = vocab_growth(ds).to_pandas()
    assert vg["doc_id"].map(type).eq(str).all()


def test_regex_extract_null_text_never_matches(ray_session):
    """An empty-matchable pattern must not match the null-text
    placeholder: nulls drop under drop_unmatched and keep null groups
    otherwise (code-review regression)."""
    from rho_contracts_ray.stages.text import regex_extract

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["abc", None, ""])})
    out = regex_extract(t, r"(?P<word>\w*)")
    assert out["doc_id"].to_pylist() == [1, 3]   # null dropped, '' kept
    keep = regex_extract(t, r"(?P<word>\w*)", drop_unmatched=False)
    assert keep["doc_id"].to_pylist() == [1, 2, 3]
    assert keep["word"].to_pylist() == ["abc", None, ""]


def test_gopher_stopwords_regex_escaped(ray_session):
    from rho_contracts_ray.stages.text import gopher_rules

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["using c++ and a.b daily here now "
                                    "with many more words to pass rules"])})
    out = gopher_rules(rd.from_arrow(t), stopwords=("c++", "axb")) \
        .to_pandas()
    assert len(out) == 1   # 'c++' must not be an invalid RE2 repetition


def test_quality_buckets_validates_labels_and_fences(ray_session):
    import pytest

    from rho_contracts_ray.stages.text import quality_buckets

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["hello world"])}))
    with pytest.raises(ValueError, match="labels"):
        quality_buckets(ds, qs=(0.2, 0.4, 0.6, 0.8))
    with pytest.raises(ValueError, match="ascending"):
        quality_buckets(ds, qs=(0.6, 0.4), labels=("a", "b", "c"))


def test_pmi_empty_corpus_returns_dataset(ray_session):
    from rho_contracts_ray.stages.text import pmi_top_collocations

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array([""])}))
    out = pmi_top_collocations(ds, k=5)
    assert out.count() == 0     # Dataset API works on the empty path

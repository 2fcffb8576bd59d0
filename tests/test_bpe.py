"""BPE merge training (stages/bpe.py) vs a naive per-occurrence
reference that recounts every pair from scratch each merge."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.bpe import _EOW, bpe_merges, train_bpe_merges


def _naive_bpe(words, n_merges):
    """Reference: token list expanded per OCCURRENCE, full recount each
    round — O(corpus * merges), trusted-by-inspection."""
    seqs = [list(w) + [_EOW] for w in words]
    out = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += 1
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((rank, best[0], best[1], pc[best]))
        merged = best[0] + best[1]
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == best[0] and s[i + 1] == best[1]:
                    s[i:i + 2] = [merged]
                else:
                    i += 1
    return out


def _got_tuples(t: pa.Table):
    return list(zip(t["rank"].to_pylist(), t["left"].to_pylist(),
                    t["right"].to_pylist(), t["n"].to_pylist()))


def test_train_matches_naive_reference():
    words = ("low low low lower lower newest newest newest newest "
             "widest widest widest bob").split()
    wc = Counter(words)
    t = pa.table({"word": pa.array(list(wc.keys())),
                  "n": pa.array([wc[w] for w in wc], pa.int64())})
    got = _got_tuples(train_bpe_merges(t, 12))
    assert got == _naive_bpe(words, 12)


def test_incremental_index_stays_consistent_on_overlaps():
    # aaaa stresses overlapping-pair bookkeeping: (a,a) appears 3 times
    # in one word; after merging (a,a) the word is (aa, aa, eow)
    words = ["aaaa"] * 5 + ["aab"] * 2
    wc = Counter(words)
    t = pa.table({"word": pa.array(list(wc.keys())),
                  "n": pa.array([wc[w] for w in wc], pa.int64())})
    got = _got_tuples(train_bpe_merges(t, 6))
    assert got == _naive_bpe(words, 6)


def test_end_to_end_distributed_counts(ray_session):
    texts = ["low low lower", "newest newest", "newest widest",
             "widest newest widest", ""]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(3)
    got = _got_tuples(bpe_merges(ds, "text", 8))
    words = " ".join(texts).split()
    assert got == _naive_bpe(words, 8)
    # block-shape invariance
    got2 = _got_tuples(bpe_merges(
        rd.from_arrow(pa.table({"text": pa.array(texts)})), "text", 8))
    assert got2 == got

"""Interpolated bigram-LM scoring (stages/text.bigram_logprob) vs a
local float64 reference."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.text import bigram_logprob


def _ref(texts, lam=0.75):
    toks = [t.split(" ") if t is not None else [""] for t in texts]
    uni = Counter(w for ts in toks for w in ts)
    n = float(sum(uni.values()))
    big = Counter((ts[i], ts[i + 1]) for ts in toks
                  for i in range(len(ts) - 1))
    ctx = Counter()
    for (w1, _), c in big.items():
        ctx[w1] += c
    out = {}
    for d, ts in enumerate(toks):
        pairs = [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
        if not pairs:
            continue
        lp = sum(math.log(lam * (big[p] / ctx[p[0]])
                          + (1 - lam) * (uni[p[1]] / n)) for p in pairs)
        out[d] = (round(lp / len(pairs), 6), len(pairs))
    return out


def test_bigram_logprob_matches_reference(ray_session):
    rng = np.random.default_rng(21)
    vocab = ["a", "bb", "ccc", "dd", "e", ""]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 9)))
             for _ in range(80)] + [None, "solo"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = bigram_logprob(rd.from_arrow(t).repartition(5)).to_pandas()
    ref = _ref(texts)
    assert set(got["doc_id"]) == set(ref)
    for _, r in got.iterrows():
        exp_lp, exp_n = ref[r["doc_id"]]
        assert r["n_bigrams"] == exp_n
        assert abs(r["avg_logprob"] - exp_lp) <= 1e-6


def test_bigram_logprob_empty(ray_session):
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = bigram_logprob(rd.from_arrow(t))
    assert out.count() == 0

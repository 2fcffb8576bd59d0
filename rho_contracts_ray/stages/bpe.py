"""BPE merge training over a text column.

Byte-pair-encoding trainers (subword-nmt, HuggingFace tokenizers,
SentencePiece-BPE) never iterate the corpus: they make ONE pass to
build the word-frequency dictionary and run the merge loop on that
compressed form, because pair counts are linear in the *distinct* word
multiset.  The engine mirrors that split:

* the corpus-scale pass is distributed — per-batch whitespace word
  counts feed a `bucketed_sum`, so only (word, n) partials shuffle and
  the full text never moves;
* the merge loop runs where the dictionary lives.  `min_count` prunes
  the long tail first (standard practice; at web scale the surviving
  vocabulary is millions of rows, not billions of tokens) and the loop
  maintains an inverted pair->words index so each merge touches only
  the words containing the chosen pair — the subword-nmt incremental
  update, not a full recount per merge.

Tie-break is deterministic: highest count, then lexicographically
smallest (left, right) pair — so output is stable across cluster
shapes and runs.  Words get a trailing end-of-word marker so merges
distinguish word-final units, as in the original BPE paper
(Sennrich et al., 2016).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow as pa

_EOW = "▁"          # end-of-word marker appended to each word


def corpus_word_counts(ds, text_col: str, n_buckets=None):
    """Distributed (word, n) counts over whitespace-split text."""
    from .agg import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t[text_col].to_pylist():
            if txt:
                c.update(txt.split())
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                        ["word"], ["n"], n_buckets=n_buckets)


def _merge_word(sym: tuple, left: str, right: str) -> tuple:
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe_merges(word_counts: pa.Table, n_merges: int,
                     min_count: int = 1) -> pa.Table:
    """Merge loop over a (word, n) table -> (rank, left, right, n)
    table of the learned merges in order.  Stops early when no pair
    reaches min_count."""
    vocab = []   # [symbols tuple, freq]
    for w, n in zip(word_counts["word"].to_pylist(),
                    word_counts["n"].to_pylist()):
        if w:
            vocab.append([tuple(w) + (_EOW,), int(n)])

    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)   # pair -> vocab indices
    for idx, (sym, n) in enumerate(vocab):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += n
            where[(a, b)].add(idx)

    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(n_merges):
        if not pair_counts:
            break
        # max count, tie-break lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        cnt = pair_counts[best]
        if cnt < min_count:
            break
        ranks.append(rank)
        lefts.append(best[0])
        rights.append(best[1])
        counts.append(cnt)
        for idx in list(where[best]):
            sym, n = vocab[idx]
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= n
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                where[(a, b)].discard(idx)
            sym = _merge_word(sym, *best)
            vocab[idx][0] = sym
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += n
                where[(a, b)].add(idx)
    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "n": pa.array(counts, pa.int64())})


def bpe_merges(ds, text_col: str, n_merges: int,
               min_count: int = 1, min_word_count: int = 1,
               n_buckets=None) -> pa.Table:
    """End-to-end: distributed word counts, then the merge loop on the
    compressed dictionary.  `min_word_count` prunes the vocabulary tail
    before it is pulled from the cluster (the scale knob)."""
    wc_ds = corpus_word_counts(ds, text_col, n_buckets=n_buckets)
    parts = [b for b in wc_ds.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return train_bpe_merges(
            pa.table({"word": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())}), n_merges)
    wc = pa.concat_tables(parts)
    if min_word_count > 1:
        import pyarrow.compute as pc

        wc = wc.filter(pc.greater_equal(wc["n"], min_word_count))
    return train_bpe_merges(wc, n_merges, min_count=min_count)

"""Text-analysis stages over a `documents`-shaped table (doc_id, text, ...).

All hot-path counting uses pyarrow's C++ regex kernels
(`count_substring_regex`) — no Python row loop.  Language ID and quality
scoring are deterministic heuristics (n-gram/stopword evidence), suitable
as cheap first-pass filters in a training-data pipeline.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# minimal per-language stopword evidence (function words, highly frequent)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit"],
    "es": ["el", "la", "los", "que", "y", "en", "por", "una"],
    "fr": ["le", "la", "les", "et", "des", "que", "une", "dans"],
}
_CJK = r"[一-鿿぀-ヿ]"


def _count(col: pa.Array, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(col, pattern).to_numpy(zero_copy_only=False) \
        .astype(np.float64)


class TextFeaturesStage:
    """Actor-pool stage: stopword patterns compiled once per actor
    (__init__), vectorized counting per batch (__call__)."""

    def __init__(self, text_col: str = "text", langs: Optional[Sequence[str]] = None):
        self.text_col = text_col
        self.langs = list(langs or _STOPWORDS.keys())
        # word-bounded alternation per language, compiled to one RE2 pass each
        self.lang_patterns = {
            lang: r"(?i)\b(" + "|".join(_STOPWORDS[lang]) + r")\b"
            for lang in self.langs if lang in _STOPWORDS
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        n_chars = pc.utf8_length(filled).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        tokens = _count(filled, r"\S+")
        punct = _count(filled, r"[^\w\s]")
        digits = _count(filled, r"[0-9]")
        upper = _count(filled, r"[A-Z]")
        cjk = _count(filled, _CJK)

        safe_chars = np.maximum(n_chars, 1.0)
        safe_tokens = np.maximum(tokens, 1.0)

        # language ID: stopword hit-rate per language; CJK ratio trumps
        scores = np.zeros((len(self.lang_patterns) + 1, len(filled)))
        names = []
        for i, (lang, pat) in enumerate(self.lang_patterns.items()):
            scores[i] = _count(filled, pat) / safe_tokens
            names.append(lang)
        scores[-1] = np.where(cjk / safe_chars > 0.05, 1.0, 0.0)
        names.append("zh")
        best = np.argmax(scores, axis=0)
        confident = scores[best, np.arange(len(filled))] > 0.0
        lang_id = np.where(confident, np.array(names, dtype=object)[best],
                           "unknown")

        # quality score in [0,1]: length evidence, sane word length,
        # punctuation/digit moderation (deterministic, documented heuristic)
        mean_word_len = n_chars / safe_tokens
        len_score = np.clip(np.log1p(tokens) / np.log(500.0), 0, 1)
        word_score = np.clip(1.0 - np.abs(mean_word_len - 5.5) / 10.0, 0, 1)
        punct_score = np.clip(1.0 - (punct / safe_chars) * 4.0, 0, 1)
        digit_score = np.clip(1.0 - (digits / safe_chars) * 3.0, 0, 1)
        quality = (0.4 * len_score + 0.2 * word_score + 0.25 * punct_score
                   + 0.15 * digit_score)
        quality = np.where(n_chars == 0, 0.0, quality)

        out = batch.append_column("n_tokens", pa.array(tokens.astype(np.int64)))
        out = out.append_column("n_chars_txt", pa.array(n_chars.astype(np.int64)))
        out = out.append_column("n_punct", pa.array(punct.astype(np.int64)))
        out = out.append_column("n_digits", pa.array(digits.astype(np.int64)))
        out = out.append_column("punct_ratio", pa.array(punct / safe_chars))
        out = out.append_column("upper_ratio", pa.array(upper / safe_chars))
        out = out.append_column("lang_id", pa.array(lang_id, type=pa.string()))
        out = out.append_column("quality", pa.array(np.round(quality, 6)))
        return out


def text_features(ds, text_col: str = "text", concurrency=None):
    from ..validate import stateless_stage

    return ds.map_batches(
        stateless_stage(TextFeaturesStage, text_col=text_col),
        batch_format="pyarrow",
    )


def winnowing_fingerprints(text: str, k: int = 8, w: int = 16) -> np.ndarray:
    """Document fingerprint via winnowing (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): k-gram rolling hashes, minimum per sliding window of w —
    a deterministic, position-robust signature for copy detection."""
    from .dedup import _shingle_hashes

    h = _shingle_hashes(text, k)
    if h.size <= w:
        return np.unique(h)
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(wins.min(axis=1))


def doc_fingerprints(ds_or_table, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 8, w: int = 16):
    """(id, n_fingerprints, fp_min, fp_xor) per document — the compact
    winnowing summary used for fast copy detection."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "").to_pylist()
        n, mn, xr = [], [], []
        for t in texts:
            fp = winnowing_fingerprints(t, k, w)
            n.append(int(fp.size))
            mn.append(int(fp.min()) if fp.size else 0)
            x = np.bitwise_xor.reduce(fp) if fp.size else np.uint64(0)
            xr.append(int(x))
        return pa.table({
            id_col: batch[id_col],
            "n_fingerprints": pa.array(n, pa.int64()),
            "fp_min": pa.array(mn, pa.uint64()),
            "fp_xor": pa.array(xr, pa.uint64()),
        })

    if isinstance(ds_or_table, pa.Table):
        return fn(ds_or_table)
    return ds_or_table.map_batches(fn, batch_format="pyarrow")


def token_counts(ds_or_table, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_tokens) with Python str.split() semantics: whitespace runs,
    no empty tokens — matches `len(list_filter(string_split_regex(...)))`
    in SQL for the oracle."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = pc.count_substring_regex(pc.fill_null(col, ""), r"\S+")
        return pa.table({id_col: batch[id_col],
                         "n_tokens": pc.cast(n, pa.int64())})

    if isinstance(ds_or_table, pa.Table):
        return fn(ds_or_table)
    return ds_or_table.map_batches(fn, batch_format="pyarrow")


def ngram_top_k(ds, n: int = 2, k: int = 20, text_col: str = "text",
                sep: str = " "):
    """Corpus-wide top-k word n-grams with counts -> Dataset[ngram, cnt].

    Scale shape: each batch emits its LOCAL (ngram, cnt) combine — the
    all-to-all groupby only ever moves one row per distinct n-gram per
    batch, never tokens — then a tiny sort+limit.  Tokenization is exactly
    `split(sep)` (empties kept) so a SQL oracle using string_split can
    reproduce the counts bit-for-bit."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts: Counter = Counter()
        for s in pc.fill_null(col, "").to_pylist():
            toks = s.split(sep)
            if len(toks) >= n:
                counts.update(
                    sep.join(toks[i:i + n])
                    for i in range(len(toks) - n + 1))
        if not counts:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        items = list(counts.items())
        return pa.table({"ngram": pa.array([g for g, _ in items]),
                         "cnt": pa.array([c for _, c in items],
                                         pa.int64())})

    total = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("ngram").sum("cnt")

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["ngram", "cnt"])

    return total.map_batches(finish, batch_format="pyarrow") \
        .sort(key=["cnt", "ngram"], descending=[True, False]).limit(k)


def decontaminate_ngrams(train_ds, holdout_ds, n: int = 3,
                         min_shared: int = 1, text_col: str = "text",
                         id_col: str = "doc_id", sep: str = " "):
    """Training-set decontamination: flag train docs sharing >= min_shared
    DISTINCT word n-grams with the holdout set ->
    Dataset[doc_id, n_shared].

    Scale shape: the holdout side (always the small side — eval sets) is
    reduced to its distinct n-gram set ONCE and broadcast via ray.put;
    each train batch then counts per-doc overlap locally — no join, no
    shuffle, one streaming pass over the training corpus.  Tokenization is
    exactly `split(sep)` so a SQL oracle reproduces the counts."""
    import ray

    def grams(s: str):
        toks = s.split(sep)
        return {sep.join(toks[i:i + n])
                for i in range(len(toks) - n + 1)} if len(toks) >= n else set()

    # 1. distinct holdout n-grams (small) — per-batch combine, driver union
    def hold_partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out: set = set()
        for s in pc.fill_null(col, "").to_pylist():
            out |= grams(s)
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    hold_set: set = set()
    for b in holdout_ds.map_batches(hold_partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        hold_set.update(t["gram"].to_pylist())
    ref = ray.put(frozenset(hold_set))

    # 2. per-doc distinct-overlap count over the train stream.  The gram
    # set deserializes ONCE PER WORKER (closure cache) — a frozenset is
    # not zero-copy, so a per-batch ray.get would re-unpickle it every
    # batch.
    _cache: dict = {}

    def overlap(batch: pa.Table) -> pa.Table:
        hs = _cache.get("grams")
        if hs is None:
            hs = _cache["grams"] = ray.get(ref)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch[id_col].to_pylist()
        out_id, out_n = [], []
        for did, s in zip(ids, pc.fill_null(col, "").to_pylist()):
            k = len(grams(s) & hs)
            if k >= min_shared:
                out_id.append(did)
                out_n.append(k)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "n_shared": pa.array(out_n, pa.int64())})

    return train_ds.map_batches(overlap, batch_format="pyarrow")

"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F2).

The authoritative input shape (BASELINE.json input_hint):
    repo:string, path:string, commit:string, lang:string, content:string

Seeded, vectorized synthesis with violations injected at computable rates:
null repos, malformed commits, out-of-enum langs, null content, duplicate
(repo,path,commit) triples concentrated on one hot repo (the skew case),
and dangling repo/commit keys absent from the dimension tables.  An `epoch`
parameter shifts the content-length distribution and lang frequencies to
produce drift-test snapshot pairs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO_FILES_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.large_string()),
])

LANGS = ["py", "js", "ts", "go", "rs", "java", "c", "md"]
COMMIT_HEX = np.array(list("0123456789abcdef"))

_WORDS = ("def return import class for while if else elif try except "
          "fn let const var func struct impl trait pub mod use match "
          "public static void int string bool map list vec println printf "
          "lambda yield async await with open read write close parse "
          "batch stream shuffle partition commit merge rebase branch").split()


def make_repo_files_table(n_rows: int, seed: int = 42, epoch: int = 0,
                          n_repos: int = 50, n_commits: int = 200,
                          violation_rate: float = 1.0,
                          dim_seed: int = 42) -> pa.Table:
    """One deterministic shard.  violation_rate scales every injection rate
    (0 disables all violations).  dim_seed pins the repo/commit key pools so
    every shard agrees with the dimension tables regardless of shard seed."""
    rng = np.random.default_rng(seed + 1_000_003 * epoch)

    # skewed repo distribution: zipf-ish, a few repos hold ~half the rows
    repo_ids = rng.zipf(1.5, size=n_rows) % n_repos
    repo_names = np.array([f"org_{i // 10:03d}/repo_{i:03d}"
                           for i in range(n_repos)], dtype=object)
    repos = repo_names[repo_ids]

    dirs = rng.integers(0, 20, n_rows)
    files = rng.integers(0, 500, n_rows)
    exts = rng.integers(0, len(LANGS), n_rows)
    paths = np.array([
        f"src/m{d}/file_{f}.{LANGS[e]}" for d, f, e in zip(dirs, files, exts)
    ])

    commit_ids = rng.integers(0, n_commits, n_rows)
    commit_pool = np.array(["".join(COMMIT_HEX[rng2]) for rng2 in
                            np.random.default_rng(dim_seed).integers(
                                0, 16, size=(n_commits, 40))])
    commits = commit_pool[commit_ids]

    # lang frequencies shift with epoch (drift fixture)
    base = np.array([0.3, 0.2, 0.1, 0.1, 0.08, 0.12, 0.06, 0.04])
    shift = np.roll(base, epoch % len(base))
    probs = (base + 0.5 * epoch * shift)
    probs = probs / probs.sum()
    langs = rng.choice(np.array(LANGS), size=n_rows, p=probs)

    # content: word soup, log-normal-ish length; epoch shifts the mean.
    # Vectorized construction: one flat word draw, ONE C-level join, delete
    # the inter-row separator bytes in one numpy op, then build the Arrow
    # LargeStringArray straight from (offsets, bytes) — no per-row Python
    # loop (matters for multi-million-row bench corpora).
    lens = np.clip(rng.lognormal(3.0 + 0.25 * epoch, 0.8, n_rows), 1, 2000
                   ).astype(np.int64)
    word_arr = np.array(_WORDS)
    word_bytelen = np.array([len(w) for w in _WORDS], dtype=np.int64)
    draw = rng.integers(0, len(word_arr), int(lens.sum()))
    wl = word_bytelen[draw]
    row_ends = np.cumsum(lens)
    cw = np.concatenate(([0], np.cumsum(wl)))
    # row byte length = its words + (n_words - 1) single-space separators
    row_char = cw[row_ends] - cw[row_ends - lens] + (lens - 1)
    big = np.frombuffer(" ".join(word_arr[draw].tolist()).encode("ascii"),
                        dtype=np.uint8)
    sep_pos = np.cumsum(row_char + 1)[:-1] - 1  # the space between rows
    values = np.delete(big, sep_pos)
    offsets = np.concatenate(([0], np.cumsum(row_char))).astype(np.int64)
    content_arr = pa.LargeStringArray.from_buffers(
        n_rows, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes()))

    repo_col = repos.astype(object)
    commit_col = commits.astype(object)
    lang_col = langs.astype(object)
    path_col = paths.astype(object)
    content_nulls = np.zeros(n_rows, dtype=bool)

    vr = violation_rate
    if vr > 0:
        # null repo ~0.5%
        idx = rng.random(n_rows) < 0.005 * vr
        repo_col[idx] = None
        # malformed commit ~1% (uppercase or short)
        idx = rng.random(n_rows) < 0.01 * vr
        commit_col[idx] = np.where(rng.random(int(idx.sum())) < 0.5,
                                   "DEADBEEF", "abc123")
        # lang outside the enum ~1%
        idx = rng.random(n_rows) < 0.01 * vr
        lang_col[idx] = "cobol"
        # null content ~0.5%
        content_nulls = rng.random(n_rows) < 0.005 * vr
        # duplicate triples ~0.2%, concentrated on the hottest repo
        n_dup = int(n_rows * 0.002 * vr)
        if n_dup:
            hot = rng.integers(0, n_rows, n_dup)
            dst = rng.integers(0, n_rows, n_dup)
            for s, d in zip(hot, dst):
                repo_col[d] = "org_000/repo_000"
                repo_col[s] = "org_000/repo_000"
                path_col[d] = path_col[s]
                commit_col[d] = commit_col[s]
        # dangling dim keys ~0.5%
        idx = rng.random(n_rows) < 0.005 * vr
        repo_col[idx & (repo_col != None)] = "org_999/repo_999"  # noqa: E711

    if content_nulls.any():
        content_arr = pc.if_else(
            pa.array(content_nulls),
            pa.scalar(None, pa.large_string()), content_arr)

    return pa.table({
        "repo": pa.array(repo_col, type=pa.string()),
        "path": pa.array(path_col, type=pa.string()),
        "commit": pa.array(commit_col, type=pa.string()),
        "lang": pa.array(lang_col, type=pa.string()),
        "content": content_arr,
    })


def repos_dim_table(n_repos: int = 50, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = np.arange(n_repos)
    repos = [f"org_{i // 10:03d}/repo_{i:03d}" for i in ids]
    return pa.table({
        "repo": repos,
        "owner": [f"owner_{i % 7}" for i in ids],
        "stars": rng.integers(0, 50_000, n_repos),
    })


def commits_dim_table(n_commits: int = 200, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    pool = ["".join(COMMIT_HEX[r]) for r in rng.integers(0, 16, (n_commits, 40))]
    ts = pa.array((1_600_000_000_000_000 + rng.integers(0, 10**12, n_commits)),
                  type=pa.timestamp("us"))
    return pa.table({
        "commit": pool,
        "author": [f"dev_{i % 13}" for i in range(n_commits)],
        "ts": ts,
    })


def write_repo_files(out_dir: str, n_rows: int, n_shards: int = 8,
                     seed: int = 42, epoch: int = 0) -> list[str]:
    """Partitioned parquet layout — one file per shard so reads parallelize
    and the checkpoint planner can resume per input fragment."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = n_rows // n_shards
    for s in range(n_shards):
        t = make_repo_files_table(per, seed=seed + s, epoch=epoch)
        p = os.path.join(out_dir, f"part-{s:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def repo_contract(strict: bool = False):
    """The row contract under test (FIXTURES.md F1)."""
    from ..contracts import c

    obj = c.object({
        "repo": c.string,
        "path": c.string,
        "commit": c.and_(c.string, c.matches("^[0-9a-f]{40}$")),
        "lang": c.oneOf(*LANGS),
        "content": c.optional(c.string),
    })
    return obj.strict() if strict else obj


"""SemDeDup-style semantic dedup (stages/ann.semdedup)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from rho_contracts_ray.stages.ann import semdedup


def _corpus(rng, n=120, dim=8, n_dup_groups=6):
    """Random unit-ish vectors plus planted near-duplicate groups."""
    base = rng.normal(size=(n, dim)).astype(np.float32)
    ids = list(range(n))
    rows = [base[i] for i in range(n)]
    nid = n
    planted = []
    for g in range(n_dup_groups):
        src = rng.integers(0, n)
        group = [int(src)]
        for _ in range(2):
            dup = base[src] + rng.normal(scale=1e-4, size=dim) \
                .astype(np.float32)
            rows.append(dup)
            ids.append(nid)
            group.append(nid)
            nid += 1
        planted.append(group)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, r))
                                         for r in rows],
                                        pa.list_(pa.float32()))})
    return t, planted


def test_semdedup_removes_planted_dups(ray_session):
    rng = np.random.default_rng(13)
    t, planted = _corpus(rng)
    ds = rd.from_arrow(t).repartition(5)
    out = semdedup(ds, k=8, threshold=0.999).to_pandas()
    assert len(out) == t.num_rows
    keep = dict(zip(out["id"], out["keep"]))
    for group in planted:
        kept = [i for i in group if keep[i]]
        # the planted copies are ~identical: exactly one survivor —
        # the smallest id — IF kmeans put them in one cluster (it
        # should: they're the same point); assert at least dedup
        # happened and the survivor is the group minimum
        assert len(kept) == 1
        assert kept[0] == min(group)


def test_semdedup_deterministic_and_no_false_kills(ray_session):
    rng = np.random.default_rng(3)
    # well-separated orthogonal-ish vectors: nothing reaches 0.999
    x = np.eye(12, 12, dtype=np.float32) + \
        rng.normal(scale=1e-3, size=(12, 12)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(12), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    a = semdedup(rd.from_arrow(t), k=3, threshold=0.999).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    b = semdedup(rd.from_arrow(t).repartition(4), k=3,
                 threshold=0.999).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert a["keep"].all()
    assert a[["id", "keep"]].equals(b[["id", "keep"]])


def test_semdedup_string_ids_native(ray_session):
    """semdedup with STRING ids: native type preserved, '007' and '7'
    stay distinct (code-review regression — the int64 cast renumbered
    numeric-looking strings and crashed on others)."""
    import numpy as np

    from rho_contracts_ray.stages.ann import semdedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=8).astype(np.float32)
    vecs = [base, base + 1e-4, rng.normal(size=8).astype(np.float32)]
    t = pa.table({
        "vec_id": pa.array(["007", "7", "doc_x"]),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = semdedup(rd.from_arrow(t), k=1,
                   threshold=0.999).to_pandas()
    assert set(out["id"]) == {"007", "7", "doc_x"}
    kept = set(out[out["keep"]]["id"])
    # the two near-identical vectors collapse to ONE kept id ('007' <
    # '7' lexicographically); the distinct vector survives
    assert "doc_x" in kept and len(kept) == 2

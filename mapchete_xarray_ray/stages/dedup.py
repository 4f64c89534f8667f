"""Deduplication operators (SURVEY.md §2.7 graft + training-data ops).

- exact dedup: content-hash partition + per-group first (the classic
  ``groupby(hash).map_groups`` shape; within a hash group, grouping is
  by the exact content so hash collisions cannot merge distinct texts).
- MinHash + LSH near-dup: per-batch vectorized shingle->minhash
  signatures, banded into (band_id, band_hash) keys, ``groupby`` over
  bands yields candidate pairs, exact Jaccard verify. All hash
  parameters are fixed constants so the sequential oracle in
  tests/test_dedup.py reproduces identical pairs.
- SimHash near-dup: 64-bit signatures, blocked into 4x16-bit chunks
  (two signatures within Hamming distance<=3 share at least one chunk),
  verified by exact Hamming distance.

Every kernel is numpy-vectorized per batch; signatures are tiny
(8-64 bytes/doc) so the shuffles move signature projections, never the
documents themselves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mapchete_xarray_ray.functions.geocode import stable_hash64

# --- MinHash parameters (fixed; shared with the test oracle) -------------
_MERSENNE = np.uint64((1 << 61) - 1)
_N_PERM = 64
_N_BANDS = 16  # 16 bands x 4 rows
_ROWS_PER_BAND = _N_PERM // _N_BANDS
_RNG = np.random.default_rng(0xC0FFEE)
PERM_A = _RNG.integers(1, _MERSENNE, size=_N_PERM, dtype=np.uint64)
PERM_B = _RNG.integers(0, _MERSENNE, size=_N_PERM, dtype=np.uint64)


def shingle_hashes(text: str, width: int = 3) -> np.ndarray:
    """Word-``width``-gram shingles -> uint64 hashes (deterministic)."""
    words = text.split()
    if len(words) < width:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + width]) for i in range(len(words) - width + 1)]
    return stable_hash64(np.array(grams, dtype=object))


def minhash_signature(text: str) -> np.ndarray:
    """(64,) uint64 signature: min over shingles of (a*h + b) mod p."""
    h = shingle_hashes(text)
    # (shingles, perms) — modmul in python ints would be slow; stay in
    # uint64 with overflow-safe 128-bit emulation via float is unsafe, so
    # use modular arithmetic on uint64 pairs
    vals = (h[:, None] * PERM_A[None, :] + PERM_B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def batch_minhash_signatures(texts: list[str]) -> np.ndarray:
    """(n, 64) signatures, vectorized across the whole batch:

    one ``stable_hash64`` call over ALL shingles, then one
    ``np.minimum.reduceat`` per permutation — O(64 * total_shingles)
    with O(total_shingles) memory (never the (shingles x perms)
    matrix). Bit-identical to per-doc :func:`minhash_signature`
    (asserted in tests/test_dedup.py)."""
    grams: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for i, t in enumerate(texts):
        words = t.split()
        if len(words) < 3:
            grams.append(" ".join(words) if words else "")
        else:
            grams.extend(" ".join(words[j:j + 3]) for j in range(len(words) - 2))
        offsets[i + 1] = len(grams)
    h = stable_hash64(np.array(grams, dtype=object))
    sigs = np.empty((len(texts), _N_PERM), dtype=np.uint64)
    starts = offsets[:-1]
    for p in range(_N_PERM):
        vals = (h * PERM_A[p] + PERM_B[p]) % _MERSENNE
        sigs[:, p] = np.minimum.reduceat(vals, starts)
    return sigs


def minhash_stage(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """doc -> one row per band: (id, band_id, band_hash)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    sigs = batch_minhash_signatures(texts)  # (n, 64)
    bands = sigs.reshape(len(ids), _N_BANDS, _ROWS_PER_BAND)
    # band hash: fold rows with a stable mix
    bh = bands[:, :, 0]
    for r in range(1, _ROWS_PER_BAND):
        bh = (bh * np.uint64(1099511628211)) ^ bands[:, :, r]
    n = len(ids)
    return pa.table({
        id_col: pa.array(np.repeat(ids, _N_BANDS), pa.int64()),
        "band_id": pa.array(np.tile(np.arange(_N_BANDS, dtype=np.int64), n)),
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
    })


def jaccard(a: str, b: str, width: int = 3) -> float:
    sa, sb = set(shingle_hashes(a, width).tolist()), set(shingle_hashes(b, width).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def candidate_pairs_from_bands(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Within one (band_id, band_hash) bucket: all id pairs (a < b)."""
    ids = np.unique(group.column(id_col).to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pa.table({"id_a": pa.array(ids[ia], pa.int64()),
                     "id_b": pa.array(ids[ib], pa.int64())})


def candidate_pairs_bucketed(group: pa.Table, key_cols: tuple[str, str],
                             id_col: str = "doc_id") -> pa.Table:
    """Pair generation over a COARSE bucket holding many complete
    (key_cols) groups — one python call per bucket, pair expansion per
    segment (only segments with >= 2 members do work)."""
    k1 = group.column(key_cols[0]).to_numpy(zero_copy_only=False)
    k2 = group.column(key_cols[1]).to_numpy(zero_copy_only=False)
    ids = group.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, k2, k1))
    k1, k2, ids = k1[order], k2[order], ids[order]
    new_seg = np.ones(len(ids), dtype=bool)
    new_seg[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
    starts = np.flatnonzero(new_seg)
    lens = np.diff(np.append(starts, len(ids)))
    out_a, out_b = [], []
    for s, L in zip(starts[lens >= 2], lens[lens >= 2]):
        seg = np.unique(ids[s:s + L])
        if len(seg) < 2:
            continue
        ia, ib = np.triu_indices(len(seg), k=1)
        out_a.append(seg[ia])
        out_b.append(seg[ib])
    if not out_a:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    return pa.table({
        "id_a": pa.array(np.concatenate(out_a), pa.int64()),
        "id_b": pa.array(np.concatenate(out_b), pa.int64()),
    })


# --- SimHash -------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unweighted)."""
    toks = text.split()
    if not toks:
        return 0
    h = stable_hash64(np.array(toks, dtype=object))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    # votes must be SIGNED: uint64 arithmetic would wrap for score < 0
    score = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)  # (+1 / -1 votes)
    return int(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def batch_simhash64(texts: list[str]) -> np.ndarray:
    """(n,) uint64 SimHash signatures, vectorized across the batch:
    one token-hash call + one ``add.reduceat`` per bit. Bit-identical
    to per-doc :func:`simhash64`."""
    toks: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    n_toks = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        w = t.split()
        if not w:
            w = [""]  # placeholder; zeroed below
            n_toks[i] = 0
        else:
            n_toks[i] = len(w)
        toks.extend(w)
        offsets[i + 1] = len(toks)
    h = stable_hash64(np.array(toks, dtype=object))
    starts = offsets[:-1]
    sigs = np.zeros(len(texts), dtype=np.uint64)
    for b in range(64):
        votes = np.add.reduceat(((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64),
                                starts)
        score = votes * 2 - n_toks
        sigs |= (score > 0).astype(np.uint64) << np.uint64(b)
    sigs[n_toks == 0] = np.uint64(0)
    return sigs


def simhash_stage(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sigs = batch_simhash64(batch.column(text_col).to_pylist())
    n = len(ids)
    chunks = np.stack([(sigs >> np.uint64(16 * i)) & np.uint64(0xFFFF)
                       for i in range(4)], axis=1).astype(np.int64)
    return pa.table({
        id_col: pa.array(np.repeat(ids, 4), pa.int64()),
        "sig": pa.array(np.repeat(sigs.astype(np.int64), 4)),
        "chunk_id": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
        "chunk_val": pa.array(chunks.reshape(-1)),
    })


def connected_components(pairs: "pa.Table", max_rounds: int = 30) -> pa.Table:
    """Near-dup pairs -> duplicate clusters: (doc_id, cluster_id) where
    cluster_id = the smallest doc_id in the component (the canonical
    representative to KEEP; everything else in the cluster is a dup).

    Iterative min-label propagation over the candidate subgraph. The
    subgraph (only docs that appear in some near-dup pair) is orders of
    magnitude smaller than the corpus, so labels live in one numpy
    array per round — the scale assumption (documented; the LSH
    candidate stage upstream is what keeps this side small). Converges
    in O(component diameter) rounds; ``max_rounds`` bounds pathological
    chains.
    """
    a = pairs.column("id_a").to_numpy(zero_copy_only=False)
    b = pairs.column("id_b").to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src = inv[:len(a)]
    dst = inv[len(a):]
    # undirected: propagate both ways
    e_src = np.concatenate([src, dst])
    e_dst = np.concatenate([dst, src])
    labels = np.arange(len(nodes), dtype=np.int64)
    for _ in range(max_rounds):
        new = labels.copy()
        np.minimum.at(new, e_dst, labels[e_src])
        # pointer-doubling contraction: follow label chains to their
        # current root so convergence is O(log diameter), not O(diameter)
        while True:
            contracted = new[new]
            if (contracted == new).all():
                break
            new = contracted
        if (new == labels).all():
            labels = new
            break
        labels = new
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({len(nodes)} nodes) — raise max_rounds"
        )
    return pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "cluster_id": pa.array(nodes[labels], pa.int64()),
    })


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt

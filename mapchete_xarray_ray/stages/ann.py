"""Similarity search over an embedding column (training-data ops).

- :func:`brute_topk` — exact cosine top-k: the query matrix is
  broadcast ONCE via ``ray.put`` (L2-normalized float64), every batch
  does one numpy matmul against it. This is the correctness baseline
  and is itself the right scale shape when the query side is small
  (queries x corpus streamed per batch).
- :class:`LSHBucketedANN` pieces — the scale path: random-hyperplane
  sign signatures bucket the corpus (``groupby(bucket)``); queries
  probe their own bucket (+ optional multi-probe), so each group does
  a small local matmul. Approximate; tests measure recall vs brute
  force and determinism (fixed hyperplanes).

All distances are computed on float64 with a fixed expression order so
reruns and the sequential oracle agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_HP_SEED = 0x5EED
N_PLANES = 12  # 4096 buckets


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    lists = batch.column(col)
    arr = np.asarray(lists.to_pylist(), dtype=np.float64)
    return arr


def normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return m / n


def brute_topk_stage(query_ref, k: int, id_col: str = "vec_id",
                     emb_col: str = "embedding"):
    """map_batches fn factory: each corpus batch scores against the
    broadcast query matrix; emits per-(query, candidate) partial top-k
    rows which a later per-query merge reduces to global top-k.

    ``query_ref``: ``ray.put((query_ids, normalized_query_matrix))``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(query_ref)
        c_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        c_mat = normalize_rows(_embedding_matrix(batch, emb_col))
        sims = q_mat @ c_mat.T  # (Q, C)
        out_q, out_c, out_s = [], [], []
        take = min(k + 1, sims.shape[1])  # +1: self may be present
        for qi in range(sims.shape[0]):
            s = sims[qi]
            mask = c_ids != q_ids[qi]
            sm, cm = s[mask], c_ids[mask]
            t = min(k, len(sm))
            if t == 0:
                continue
            order = np.lexsort((cm, -sm))[:t]
            out_q.extend([q_ids[qi]] * t)
            out_c.extend(cm[order].tolist())
            out_s.extend(sm[order].tolist())
        del take
        return pa.table({
            "vec_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_c, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    return fn


def merge_topk_per_query(k: int):
    """map_groups fn: merge per-batch partial candidate lists."""

    def fn(group: pa.Table) -> pa.Table:
        q = group.column("vec_id").to_numpy(zero_copy_only=False)
        c = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        _, uidx = np.unique(c, return_index=True)
        c, s = c[uidx], s[uidx]
        order = np.lexsort((c, -s))[: min(k, len(c))]
        n = len(order)
        return pa.table({
            "vec_id": pa.array(np.full(n, q[0]), pa.int64()),
            "neighbor_id": pa.array(c[order], pa.int64()),
            "rank": pa.array(np.arange(1, n + 1), pa.int64()),
            "cosine": pa.array(s[order], pa.float64()),
        })

    return fn


def ann_brute_pipeline(corpus: ray.data.Dataset, query_ids: np.ndarray,
                       query_mat: np.ndarray, k: int) -> ray.data.Dataset:
    """Exact cosine top-k of each query against the corpus Dataset."""
    ref = ray.put((query_ids, normalize_rows(query_mat.astype(np.float64))))
    partial = corpus.map_batches(brute_topk_stage(ref, k), batch_format="pyarrow")
    return partial.groupby("vec_id").map_groups(merge_topk_per_query(k),
                                                batch_format="pyarrow")


# --- LSH-bucketed variant (scale path) -----------------------------------

def hyperplanes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    """Fresh fixed-seed generator per call: repeated pipelines get
    identical planes (determinism requirement)."""
    return np.random.default_rng(_HP_SEED).standard_normal((n_planes, dim))


def bucket_stage(planes: np.ndarray, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
    """map_batches fn: add the sign-pattern bucket id."""

    def fn(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, emb_col)
        signs = (m @ planes.T) > 0  # (n, planes)
        bucket = (signs.astype(np.int64)
                  << np.arange(planes.shape[0], dtype=np.int64)[None, :]).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket))

    return fn


def bucket_local_topk(k: int, emb_col: str = "embedding"):
    """map_groups fn: exact cosine top-k WITHIN one bucket."""

    def fn(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        m = normalize_rows(_embedding_matrix(group, emb_col))
        sims = m @ m.T
        out_q, out_c, out_r, out_s = [], [], [], []
        for i in range(len(ids)):
            mask = ids != ids[i]
            sm, cm = sims[i][mask], ids[mask]
            t = min(k, len(sm))
            if t == 0:
                continue
            order = np.lexsort((cm, -sm))[:t]
            out_q.extend([ids[i]] * t)
            out_c.extend(cm[order].tolist())
            out_r.extend(range(1, t + 1))
            out_s.extend(sm[order].tolist())
        return pa.table({
            "vec_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_c, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    return fn


def ann_lsh_pipeline(corpus: ray.data.Dataset, dim: int, k: int,
                     n_planes: int = N_PLANES) -> ray.data.Dataset:
    """Approximate all-pairs top-k: bucket by hyperplane signs, exact
    top-k within each bucket. Recall measured in tests vs brute force.
    Size ``n_planes`` so expected bucket occupancy is tens-to-hundreds
    of vectors (2^n_planes buckets): too fine and recall collapses,
    too coarse and the local matmul dominates."""
    planes = hyperplanes(dim, n_planes)
    bucketed = corpus.map_batches(bucket_stage(planes), batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(bucket_local_topk(k),
                                                 batch_format="pyarrow")

"""kNN join (J5): k-ring candidate gather + exact refinement.

Semantics: for every point, the k nearest OTHER points by squared
planar distance ``dx^2 + dy^2``, ties broken by neighbor id ascending —
row-exact vs a brute-force oracle (SQL ``row_number() over (partition
by id order by dist2, neighbor_id)``).

Distributed shape (SURVEY.md J5, the classic replicate-and-partition
spatial join of the MapReduce spatial-join literature — cf. "Processing
multi-way spatial joins on map-reduce", EDBT 2013):

- candidates: every point lands in exactly ONE cell group (its home
  cell — the same Morton/tile grid the sink partitions by).
- queries: replicated to every cell within Chebyshev radius R of their
  home cell (R=1 first; only the NEW shell cells in later rounds).
- ``groupby(cell).map_groups``: per cell, top-k of each query copy vs
  the cell's candidates (vectorized distance matrix).
- ``groupby(id).map_groups``: merge partial top-k lists across a
  query's cells with the running best-so-far, emit ``resolved`` =
  (count >= k) AND (kth dist2 < (R * cell_span)^2) — the geometric
  guarantee that no unseen cell can hold a closer neighbor.
- unresolved queries loop with doubled R (cell-edge points, sparse
  neighborhoods); terminates at grid extent. Each round ships only the
  new shell, so total replication is O(cells visited), not O(R^2) per
  round.

Scale notes: the shuffle key is the flat cell index (one int64);
queries/candidates carry only (id, x, y) — the wide payload never
enters the join. Unresolved-id broadcast is an 8-byte-per-id numpy
array via ``ray.put`` (at 10^12-doc scale this would stay a Dataset
and the filter becomes a hash semi-join; same structure).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.scale import nblocks_for_cluster


def _shell_offsets(lo: int, hi: int):
    """Offsets with lo < Chebyshev distance <= hi (lo=0 includes home)."""
    offs = np.arange(-hi, hi + 1, dtype=np.int64)
    dr, dc = np.meshgrid(offs, offs, indexing="ij")
    dr, dc = dr.ravel(), dc.ravel()
    cheb = np.maximum(np.abs(dr), np.abs(dc))
    keep = (cheb > lo) & (cheb <= hi)
    if lo == 0:
        keep |= cheb == 0
    return dr[keep], dc[keep]


_EMPTY = pa.table({
    "id": pa.array([], pa.int64()),
    "x": pa.array([], pa.float64()),
    "y": pa.array([], pa.float64()),
    "grp": pa.array([], pa.int64()),
    "is_query": pa.array([], pa.bool_()),
})


def _replicate(ncols: int, nrows: int, lo: int, hi: int, as_query: bool):
    dr, dc = _shell_offsets(lo, hi)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _EMPTY
        crow = batch.column("crow").to_numpy(zero_copy_only=False)
        ccol = batch.column("ccol").to_numpy(zero_copy_only=False)
        rows = crow[:, None] + dr[None, :]
        cols = (ccol[:, None] + dc[None, :]) % ncols
        valid = (rows >= 0) & (rows < nrows)
        idx = np.broadcast_to(np.arange(n)[:, None], rows.shape)[valid]
        grp = rows[valid] * ncols + cols[valid]
        return pa.table({
            "id": batch.column("id").take(pa.array(idx)),
            "x": batch.column("x").take(pa.array(idx)),
            "y": batch.column("y").take(pa.array(idx)),
            "grp": pa.array(grp),
            "is_query": pa.array(np.full(len(grp), as_query)),
        })

    return fn


def _cell_topk(k: int):
    """Per-cell: top-k of each query copy vs the cell's candidates."""

    def fn(group: pa.Table) -> pa.Table:
        from mapchete_xarray_ray.stages.ann import rowwise_topk

        isq = group.column("is_query").to_numpy(zero_copy_only=False)
        ids = group.column("id").to_numpy(zero_copy_only=False)
        xs = group.column("x").to_numpy(zero_copy_only=False)
        ys = group.column("y").to_numpy(zero_copy_only=False)
        cid, cx, cy = ids[~isq], xs[~isq], ys[~isq]
        qid, qx, qy = ids[isq], xs[isq], ys[isq]
        # full (Q, C) distance matrix + one vectorized lexsort — same
        # float64 expression per pair as the scalar oracle
        d2 = (qx[:, None] - cx[None, :]) ** 2 + (qy[:, None] - cy[None, :]) ** 2
        q_sel, c_sel, _rank = rowwise_topk(d2, qid, cid, k)
        return pa.table({
            "id": pa.array(qid[q_sel], pa.int64()),
            "neighbor_id": pa.array(cid[c_sel], pa.int64()),
            "dist2": pa.array(d2[q_sel, c_sel], pa.float64()),
        })

    return fn


_MERGE_BUCKETS = 64


def _merge_topk(k: int, guaranteed_d2: float, need: int):
    """Merge partial candidate lists to per-query global top-k + resolved
    flag. Runs per ID BUCKET (id % 64), fully vectorized inside the
    bucket — one python call per bucket, not per query."""

    def fn(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_numpy(zero_copy_only=False)
        nbs = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        d2s = group.column("dist2").to_numpy(zero_copy_only=False)
        # global ordering: by (id, d2, neighbor); then per-id dedup of
        # neighbors and rank assignment via segment arithmetic
        order = np.lexsort((nbs, d2s, ids))
        ids, nbs, d2s = ids[order], nbs[order], d2s[order]
        # drop duplicate (id, neighbor) pairs, keeping the first (=lowest
        # d2 — but d2 per pair is deterministic, so any copy is fine)
        first = np.ones(len(ids), dtype=bool)
        if len(ids) > 1:
            # a duplicate pair is adjacent only within equal-id runs after
            # a secondary sort by neighbor; re-sort per (id, nb) to detect
            o2 = np.lexsort((d2s, nbs, ids))
            dup = np.zeros(len(ids), dtype=bool)
            dup[1:] = (ids[o2][1:] == ids[o2][:-1]) & (nbs[o2][1:] == nbs[o2][:-1])
            keep_mask = np.ones(len(ids), dtype=bool)
            keep_mask[o2[dup]] = False
            first = keep_mask
        ids, nbs, d2s = ids[first], nbs[first], d2s[first]
        # ranks within each id run (rows still sorted by (id, d2, nb))
        new_run = np.ones(len(ids), dtype=bool)
        new_run[1:] = ids[1:] != ids[:-1]
        run_starts = np.flatnonzero(new_run)
        rank = np.arange(len(ids)) - np.repeat(run_starts, np.diff(
            np.append(run_starts, len(ids)))) + 1
        keep = rank <= k
        ids, nbs, d2s, rank = ids[keep], nbs[keep], d2s[keep], rank[keep]
        # resolution per id: count kept >= need AND kth d2 < guarantee
        new_run = np.ones(len(ids), dtype=bool)
        new_run[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, len(ids)))
        last_d2 = d2s[starts + counts - 1]
        res_per_id = (counts >= need) & (last_d2 < guaranteed_d2)
        resolved = np.repeat(res_per_id, counts)
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "neighbor_id": pa.array(nbs, pa.int64()),
            "rank": pa.array(rank, pa.int64()),
            "dist2": pa.array(d2s, pa.float64()),
            "resolved": pa.array(resolved),
        })

    return fn


def knn_pipeline(points: ray.data.Dataset, k: int, cell_span: float,
                 ncols: int, nrows: int, origin_x: float = 0.0,
                 origin_y: float = 0.0, max_rounds: int = 16) -> ray.data.Dataset:
    """Exact kNN over a Dataset with columns (id:int64, x, y:float64).

    Returns a Dataset (id, neighbor_id, rank, dist2). The cell grid is
    ``nrows x ncols`` cells of edge ``cell_span`` anchored at
    (origin_x, origin_y), y growing DOWN (pixel/tile row order).
    """

    def add_cells(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        ccol = np.clip(((x - origin_x) // cell_span).astype(np.int64), 0, ncols - 1)
        crow = np.clip(((y - origin_y) // cell_span).astype(np.int64), 0, nrows - 1)
        return (batch.append_column("crow", pa.array(crow))
                     .append_column("ccol", pa.array(ccol)))

    pts = points.map_batches(add_cells, batch_format="pyarrow").materialize()
    n_total = pts.count()
    need = min(k, max(n_total - 1, 0))
    # lazy: in the common case the loop runs ONE round, so materializing
    # the candidate layout would cost an extra execution for nothing; a
    # second round recomputes it from the (materialized) pts — cheap
    cand = pts.map_batches(_replicate(ncols, nrows, 0, 0, as_query=False),
                           batch_format="pyarrow")

    finals = []
    unresolved = pts
    prev_r, radius, rounds = -1, 1, 0
    partial: ray.data.Dataset | None = None
    while True:
        rounds += 1
        rep = unresolved.map_batches(
            _replicate(ncols, nrows, max(prev_r, 0), radius, as_query=True),
            batch_format="pyarrow",
        )
        # consolidate before each sort-shuffle: the exchange cost is
        # per-block, and the union of replicate stages arrives as many
        # small blocks
        cell_partial = (cand.union(rep)
                        .repartition(nblocks_for_cluster())
                        .groupby("grp")
                        .map_groups(_cell_topk(k), batch_format="pyarrow")
                        .select_columns(["id", "neighbor_id", "dist2"]))
        if partial is not None:
            cell_partial = cell_partial.union(partial)

        def add_bucket(batch: pa.Table) -> pa.Table:
            if "id" not in batch.column_names:
                return pa.table({
                    "id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.float64()),
                    "id_bucket": pa.array([], pa.int64()),
                })
            b = batch.column("id").to_numpy() % _MERGE_BUCKETS
            return batch.append_column("id_bucket", pa.array(b.astype(np.int64)))

        done_all = radius >= max(ncols, nrows) or rounds >= max_rounds
        guaranteed = float("inf") if done_all else (radius * cell_span) ** 2
        merged = (cell_partial.map_batches(add_bucket, batch_format="pyarrow")
                  .repartition(nblocks_for_cluster())
                  .groupby("id_bucket")
                  .map_groups(_merge_topk(k, guaranteed, need),
                              batch_format="pyarrow")).materialize()

        import pyarrow.compute as pc

        # lazy filter over the MATERIALIZED merged dataset: consuming the
        # final union re-runs only this cheap filter, not the shuffles
        finals.append(
            merged.map_batches(
                lambda b: b.filter(b.column("resolved")).drop_columns(["resolved"]),
                batch_format="pyarrow",
            )
        )
        if done_all:
            break
        # ids still unresolved (driver gets only the id column — small)
        unres_tabs = [
            ray.get(r) for r in merged.map_batches(
                lambda b: b.filter(pc.invert(b.column("resolved"))).select(["id"]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ]
        unres_tabs = [t for t in unres_tabs if t.num_columns > 0]
        if not unres_tabs:
            break
        unres_tbl = pa.concat_tables(unres_tabs)
        unres_ids = np.unique(unres_tbl.column("id").to_numpy())
        if len(unres_ids) == 0:
            break
        ref = ray.put(unres_ids)

        def keep_unres(batch: pa.Table, _ref=ref) -> pa.Table:
            arr = ray.get(_ref)
            return batch.filter(pa.array(np.isin(batch.column("id").to_numpy(), arr)))

        unresolved = pts.map_batches(keep_unres, batch_format="pyarrow")
        partial = merged.map_batches(
            lambda b, _ref=ref: b.filter(pa.array(np.isin(
                b.column("id").to_numpy(), ray.get(_ref)))).select(
                ["id", "neighbor_id", "dist2"]),
            batch_format="pyarrow",
        ).materialize()
        prev_r, radius = radius, radius * 2

    out = finals[0]
    for f in finals[1:]:
        out = out.union(f)
    return out

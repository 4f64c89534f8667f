"""Point-in-polygon join (J4): broadcast map-side join, actor pool.

The polygon side is small (admin/region polygons — FIXTURES.md F2 caps
it at broadcast size); the page side is the 100 TB stream. So this is
a map-side broadcast join, NOT a shuffle join: polygons are shipped
once per actor (``ray.put`` ref or constructor kwarg), preprocessed in
``__init__`` (ST3 — per-actor edge arrays + bbox "tree"), and every
batch is tested vectorized.

Boundary tie rule (FIXTURES.md F5, applied identically by
oracle.point_in_ring): a point on an edge/vertex is INSIDE; a point in
several regions gets the lowest ``region_id``. The engine iterates
polygons in ascending region_id and assigns where still unassigned —
bit-identical to the oracle because both evaluate the same float64
expressions (cross product for on-edge, the ray-casting x-intersection
formula) in the same order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class PIPJoiner:
    """map_batches actor: adds ``region_id`` (int64, -1 = no region).

    ``regions``: pyarrow Table (region_id, name, ring_xy) or a pylist of
    (region_id, ring) pairs. ``x_col``/``y_col`` name the point columns.
    ``keep_unmatched``: emit unmatched rows with region_id -1 instead of
    filtering them.
    """

    def __init__(self, regions, x_col: str = "lon", y_col: str = "lat",
                 keep_unmatched: bool = False):
        if isinstance(regions, pa.Table):
            rids = regions.column("region_id").to_pylist()
            rings = regions.column("ring_xy").to_pylist()
        else:
            rids = [r[0] for r in regions]
            rings = [r[1] for r in regions]
        order = np.argsort(rids, kind="stable")
        self.polys = []
        for i in order:
            ring = np.asarray(rings[i], dtype=np.float64)
            x1, y1 = ring[:-1, 0], ring[:-1, 1]
            x2, y2 = ring[1:, 0], ring[1:, 1]
            bbox = (ring[:, 0].min(), ring[:, 1].min(),
                    ring[:, 0].max(), ring[:, 1].max())
            self.polys.append((int(rids[i]), x1, y1, x2, y2, bbox))
        self.x_col, self.y_col = x_col, y_col
        self.keep_unmatched = keep_unmatched

    def _contains(self, x: np.ndarray, y: np.ndarray, poly) -> np.ndarray:
        """Vectorized over points; same float64 expressions as the scalar
        oracle (oracle.point_in_ring)."""
        _rid, x1, y1, x2, y2, bbox = poly
        n = len(x)
        cand = (x >= bbox[0]) & (x <= bbox[2]) & (y >= bbox[1]) & (y <= bbox[3])
        inside = np.zeros(n, dtype=bool)
        on_edge = np.zeros(n, dtype=bool)
        if not cand.any():
            return inside
        xc, yc = x[cand], y[cand]
        ins = np.zeros(len(xc), dtype=bool)
        edge = np.zeros(len(xc), dtype=bool)
        for i in range(len(x1)):
            a, b, c, d = x1[i], y1[i], x2[i], y2[i]
            cross = (c - a) * (yc - b) - (d - b) * (xc - a)
            seg = ((cross == 0.0)
                   & (xc >= min(a, c)) & (xc <= max(a, c))
                   & (yc >= min(b, d)) & (yc <= max(b, d)))
            edge |= seg
            crossing = (b > yc) != (d > yc)
            if crossing.any():
                xin = (c - a) * (yc - b) / (d - b) + a
                ins ^= crossing & (xc < xin)
        inside[cand] = ins | edge
        return inside

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(self.y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        assigned = np.full(len(x), -1, dtype=np.int64)
        todo = np.ones(len(x), dtype=bool)
        for poly in self.polys:  # ascending region_id -> lowest id wins
            if not todo.any():
                break
            hit = self._contains(x, y, poly) & todo
            assigned[hit] = poly[0]
            todo &= ~hit
        batch = batch.append_column("region_id", pa.array(assigned))
        if self.keep_unmatched:
            return batch
        return batch.filter(pa.array(assigned >= 0))


class ZonalStats(PIPJoiner):
    """map_batches actor: per-REGION aggregation of the points inside it
    (zonal statistics, the raster<->vector A-family counterpart of the
    PIP join). Unlike PIPJoiner (each point -> its lowest-id region),
    zonal semantics count a point in EVERY region containing it, so
    overlapping admin levels each see their full population.

    Emits constant-size partials — one row per (region, value column)
    per batch: ``region_id, n_pts, sum_<col>...`` — so the downstream
    exchange moves O(regions x blocks) rows, never points. Same
    broadcast-small-side shape as the join (ST3: edge arrays built once
    per actor in ``__init__``).
    """

    def __init__(self, regions, x_col: str = "lon", y_col: str = "lat",
                 value_cols: tuple[str, ...] = ()):
        super().__init__(regions, x_col=x_col, y_col=y_col)
        self.value_cols = tuple(value_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        cols: dict = {"region_id": pa.array([], pa.int64()),
                      "n_pts": pa.array([], pa.int64())}
        for v in self.value_cols:
            cols[f"sum_{v}"] = pa.array([], pa.int64())
        if self.x_col not in batch.column_names or batch.num_rows == 0:
            return pa.table(cols)
        x = batch.column(self.x_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        y = batch.column(self.y_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        vals = {}
        for v in self.value_cols:
            arr = batch.column(v).to_numpy(zero_copy_only=False)
            if not np.issubdtype(arr.dtype, np.integer):
                # silent astype(int64) would truncate floats toward
                # zero; int-quantize upstream (repo convention:
                # floor(f64*1e6)) and pass the integer column instead
                raise TypeError(
                    f"ZonalStats value column {v!r} has dtype "
                    f"{arr.dtype}; integer required — int-quantize "
                    "floats before the zonal sum")
            vals[v] = arr.astype(np.int64)
        rids, ns, sums = [], [], {v: [] for v in self.value_cols}
        for poly in self.polys:
            hit = self._contains(x, y, poly)
            n = int(hit.sum())
            if n == 0:
                continue  # empty zones never materialize
            rids.append(poly[0])
            ns.append(n)
            for v in self.value_cols:
                sums[v].append(int(vals[v][hit].sum()))
        out = {"region_id": pa.array(rids, pa.int64()),
               "n_pts": pa.array(ns, pa.int64())}
        for v in self.value_cols:
            out[f"sum_{v}"] = pa.array(sums[v], pa.int64())
        return pa.table(out)

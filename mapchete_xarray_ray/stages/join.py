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

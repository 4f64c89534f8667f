"""Cross-generation archive diff — the incremental-recompute primitive.

A 100 TB daily pipeline re-derives ONLY the tiles whose inputs changed;
deciding *which* tiles changed must itself be distributed and exact.
This module byte-compares two archive generations tile by tile:

- work list = UNION of both archives' chunk listings (two LISTs, no
  data reads at the driver);
- each task reads its tile from BOTH stores (a chunk missing in either
  generation reads back as fill — reference test_driver.py:39-46
  semantics — so creations and deletions surface as "changed");
- comparison is RAW-BYTE equality (``tobytes()``), not checksum
  equality and not ``np.array_equal``: lineage crc32 is the resume
  hint, but a diff that gates recompute cannot accept hash-collision
  false-negatives — and array_equal treats NaN != NaN, which would
  report every NaN-bearing float tile as changed forever.

Scale shape: no shuffle at all — the tile grid is the partitioning,
each task's read set is disjoint, and the output is one tiny row per
tile.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.grid import pack_tile_id
from mapchete_xarray_ray.scale import nblocks_for_cluster
from mapchete_xarray_ray.sinks.zarr import ZarrTileStore
from mapchete_xarray_ray.sources.zarr_input import spec_from_archive


def archive_diff_ds(cur_path: str, old_path: str) -> ray.data.Dataset:
    """Dataset of (tile_id, tile_row, tile_col, changed) over the union
    of both archives' written tiles. Archives must share grid/zoom/
    bands (different zooms are different pyramids — diff per level)."""
    cur_spec = spec_from_archive(cur_path)
    old_spec = spec_from_archive(old_path)
    # time and nodata are part of the compare contract too: a time-axis
    # mismatch changes the grid SHAPE (every tile would byte-differ),
    # and nodata drives the missing-chunk fill read-back
    for attr in ("zoom", "grid", "tile_size", "metatiling", "band_names",
                 "dtype", "time", "nodata"):
        if getattr(cur_spec, attr) != getattr(old_spec, attr):
            raise ValueError(
                f"archives incompatible for diff: {attr} "
                f"{getattr(cur_spec, attr)!r} != {getattr(old_spec, attr)!r}")
    tiles = sorted(ZarrTileStore(cur_spec).existing_tiles()
                   | ZarrTileStore(old_spec).existing_tiles())
    cur_ref, old_ref = ray.put(cur_spec), ray.put(old_spec)
    zoom = cur_spec.zoom

    def diff_tiles(batch: pa.Table) -> pa.Table:
        cur = ZarrTileStore(ray.get(cur_ref))
        old = ZarrTileStore(ray.get(old_ref))
        rows = batch.column("tile_row").to_numpy(zero_copy_only=False)
        cols = batch.column("tile_col").to_numpy(zero_copy_only=False)
        tid, chg = [], []
        for r, c in zip(rows, cols):
            a = cur.read_tile(int(r), int(c))
            b = old.read_tile(int(r), int(c))
            tid.append(int(pack_tile_id(zoom, int(r), int(c))))
            # raw bytes, not np.array_equal: NaN != NaN would mark
            # byte-identical float tiles changed (shape/dtype already
            # match via the spec guard)
            chg.append(0 if np.ascontiguousarray(a).tobytes()
                       == np.ascontiguousarray(b).tobytes() else 1)
        return pa.table({"tile_id": pa.array(tid, pa.int64()),
                         "tile_row": batch.column("tile_row").cast(pa.int64()),
                         "tile_col": batch.column("tile_col").cast(pa.int64()),
                         "changed": pa.array(chg, pa.int64())})

    work = pa.table({
        "tile_row": pa.array([t[0] for t in tiles], pa.int64()),
        "tile_col": pa.array([t[1] for t in tiles], pa.int64())})
    return (ray.data.from_arrow(work)
            .repartition(nblocks_for_cluster(1.0, lo=4))
            .map_batches(diff_tiles, batch_format="pyarrow"))

"""E3 — process-output-as-input: build zoom z-1 from zoom z.

The reference's self-referential path (output driver as input,
_output.py:146-163 + get_raw_output at :556, mosaic at :165-200) maps
to: enumerate parent tiles at z-1 (driver), prune against the input
footprint (J3), then one ``map_batches`` stage whose tasks each read
their 2x2 child window from the source archive (mosaic read) and write
the downsampled parent tile + lineage — no shuffle at all: the tile
grid itself is the partitioning, each task's read set is disjoint.
"""

from __future__ import annotations

import time
import uuid
import zlib

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.grid import pack_tile_id
from mapchete_xarray_ray.spec import JobSpec
from mapchete_xarray_ray.sinks.zarr import ZarrTileStore
from mapchete_xarray_ray.sources.zarr_input import (
    archive_bbox,
    check_grid_compatible,
    prune_tiles,
    read_window,
    spec_from_archive,
)
from mapchete_xarray_ray.state.lineage import completed_tiles, write_record


def _downsample2(arr: np.ndarray, how: str = "sum", nodata=0) -> np.ndarray:
    """2x block-reduce the last two axes (vectorized reshape trick).

    Nodata-aware: nodata children contribute 0 (sum) / -inf-like (max)
    instead of their fill value; a parent pixel whose 2x2 children are
    ALL nodata stays nodata. Integer inputs accumulate in int64; float
    inputs keep float64 (no truncation)."""
    *lead, h, w = arr.shape
    acc_dtype = np.float64 if np.issubdtype(arr.dtype, np.floating) else np.int64
    r = arr.reshape(*lead, h // 2, 2, w // 2, 2).astype(acc_dtype)
    nd = r == nodata
    all_nd = nd.all(axis=(-3, -1))
    if how == "sum":
        out = np.where(nd, 0, r).sum(axis=(-3, -1))
    elif how == "max":
        lowest = np.finfo(acc_dtype).min if acc_dtype is np.float64 \
            else np.iinfo(np.int64).min
        out = np.where(nd, lowest, r).max(axis=(-3, -1))
    else:
        raise ValueError(how)
    out[all_nd] = nodata
    return out


def _clip_to_dtype(arr: np.ndarray, dtype) -> np.ndarray:
    dt = np.dtype(dtype)
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        arr = arr.clip(info.min, info.max)
    return arr.astype(dt)


class PyramidReducer:
    """Per-worker stage state: child-window read -> 2x downsample ->
    parent write (constructed once per worker per step via
    :func:`_cached_reducer_fn`)."""

    def __init__(self, in_path: str, out_spec: JobSpec, how: str = "sum"):
        self.in_spec = spec_from_archive(in_path)
        self.in_store = ZarrTileStore(self.in_spec)
        self.out_spec = out_spec
        self.out_store = ZarrTileStore(out_spec)
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"tile_id": [], "tile_row": [], "tile_col": [], "checksum": []}
        for r, c in zip(batch.column("tile_row").to_pylist(),
                        batch.column("tile_col").to_pylist()):
            tb = self.out_spec.pyramid.tile_bounds(self.out_spec.zoom, r, c)
            window = read_window(self.in_store, tuple(tb))
            tensor = _clip_to_dtype(
                _downsample2(window, self.how, nodata=self.in_spec.nodata),
                self.out_spec.dtype,
            )
            # time only the store write (same "write_ms" meaning as the
            # flagship records — reads/downsample are not write cost)
            w0 = time.perf_counter()
            time_idxs = None
            if self.in_store.has_time:
                ts = self.in_spec.timestamps
                # the overview covers the FULL time coordinate and the
                # tile is being (re)derived from the child level, so the
                # existing chunk bytes are never merge-worthy: rebuild
                # from fill (repair semantics, same as the flagship
                # writer) and record the coverage so the audit can
                # re-derive the crc instead of calling it legacy
                self.out_store.write_tile(r, c, tensor, timestamps=ts,
                                          assume_fresh=True)
                time_idxs = list(range(len(ts)))
            else:
                self.out_store.write_tile(r, c, tensor)
            write_ms = int((time.perf_counter() - w0) * 1000)
            checksum = zlib.crc32(np.ascontiguousarray(tensor).tobytes())
            rec = {
                "tile_id": int(pack_tile_id(self.out_spec.zoom, r, c)),
                "zoom": self.out_spec.zoom, "tile_row": r, "tile_col": c,
                "rows_in": 0, "chunks_written": len(self.out_spec.band_names),
                "checksum": int(checksum),
                "input_fragments": [f"{self.in_spec.path}@z{self.in_spec.zoom}"],
                "metrics": {"write_ms": write_ms,
                            "bytes": int(tensor.nbytes)},
            }
            if time_idxs is not None:
                rec["time_idxs"] = time_idxs
            write_record(self.out_spec.path, rec)
            out["tile_id"].append(int(pack_tile_id(self.out_spec.zoom, r, c)))
            out["tile_row"].append(r)
            out["tile_col"].append(c)
            out["checksum"].append(int(checksum))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def run_pyramid_step(in_path: str, out_path: str, how: str = "sum",
                     mode: str = "continue",
                     compressor: int | str | None = 1) -> ray.data.Dataset:
    in_spec = spec_from_archive(in_path)
    out_spec = JobSpec(
        path=out_path,
        zoom=in_spec.zoom - 1,
        bounds=tuple(in_spec.bounds),
        grid=in_spec.grid,
        metatiling=in_spec.metatiling,
        tile_size=in_spec.tile_size,
        # sum overviews need headroom: widen ints to uint32, floats to
        # float64; max never outgrows the input dtype
        dtype=(in_spec.dtype if how == "max"
               else ("float64" if np.issubdtype(np.dtype(in_spec.dtype),
                                                np.floating) else "uint32")),
        nodata=in_spec.nodata,
        band_names=list(in_spec.band_names),
        time=in_spec.time,
    )
    check_grid_compatible(in_spec, out_spec)
    # compressor applies only when this call CREATES the archive; an
    # existing one keeps its on-disk layout (write_tile syncs from
    # .zarray metadata)
    out_store = ZarrTileStore(out_spec, compressor=compressor)
    out_store.prepare()

    r0, r1, c0, c1 = out_spec.tile_range()
    # enumerate parents from the CHILD archive's existing chunks (one
    # LIST per band prefix), not the full grid: a sparse z-level keeps
    # the work list at O(written tiles), and a skipped parent reads
    # back as fill anyway — same semantics, none of the empty writes
    in_store = ZarrTileStore(in_spec)
    parents = {(cr // 2, cc // 2) for cr, cc in in_store.existing_tiles()}
    tiles = [(r, c) for r, c in sorted(parents)
             if r0 <= r <= r1 and c0 <= c <= c1]
    tiles = prune_tiles(tiles, out_spec, archive_bbox(in_spec))
    if mode == "continue":
        done = completed_tiles(out_store)
        tiles = [(r, c) for r, c in tiles
                 if int(pack_tile_id(out_spec.zoom, r, c)) not in done]

    items = pa.table({
        "tile_row": pa.array([t[0] for t in tiles], pa.int64()),
        "tile_col": pa.array([t[1] for t in tiles], pa.int64()),
    })
    ds = ray.data.from_arrow(items)
    # spread the tile work-list across blocks so the task pool fills
    ds = ds.repartition(max(1, len(tiles) // 4))
    # Task pool, NOT an actor pool: a pyramid chain runs one stage per
    # level, and actor-pool spin-up dominates the coarse tail levels
    # (observed 2.2-2.7s wall for <50ms of remote work on a 32-tile z2
    # level; tasks on prewarmed workers run the same level in ~0.3s).
    # The per-worker-process reducer cache (_cached_reducer_fn) keeps
    # ST1's amortization — one store-metadata read per worker, not per
    # batch — which is what the actor's __init__ bought. num_cpus=0.5:
    # the reducers are IO-bound (chunk read/write); a full CPU per slot
    # can starve upstream operators when the pool size equals the
    # session's CPU count (deadlock observed at 4 slots on a 4-CPU
    # session — the guide's pool-sizing pitfall).
    return ds.map_batches(
        _cached_reducer_fn(in_path, out_spec, how, uuid.uuid4().hex),
        batch_format="pyarrow",
        batch_size=4,
        num_cpus=0.5,
    )


# Single-slot per-worker reducer cache. Keyed by a per-run_pyramid_step
# token, NOT by paths: an archive recreated at the same path with a
# different layout (compressor/dtype) must never be served by a store
# handle synced to the OLD .zarray metadata, and a path-keyed dict
# would also grow by one entry per tmpdir ever seen. One slot == the
# actor-pool lifetime semantics this replaced (state scoped to one
# stage execution), amortized per worker process.
_REDUCER_SLOT: list = [None, None]  # [token, reducer]


def _cached_reducer_fn(in_path: str, out_spec: JobSpec, how: str,
                       token: str):
    """Task-pool variant of :class:`PyramidReducer` with a per-worker-
    process reducer cache, so repeated batches of the SAME step on the
    same worker reuse the store handles (one metadata read per worker
    per step, not per batch)."""
    def fn(batch: pa.Table) -> pa.Table:
        if _REDUCER_SLOT[0] != token:
            # construct FIRST, publish after: claiming the token before
            # a failed __init__ would make the retry reuse the PREVIOUS
            # step's reducer (wrong archives) instead of rebuilding
            red = PyramidReducer(in_path=in_path, out_spec=out_spec,
                                 how=how)
            _REDUCER_SLOT[1] = red
            _REDUCER_SLOT[0] = token
        return _REDUCER_SLOT[1](batch)

    return fn


def run_pyramid_chain(src_path: str, min_zoom: int, how: str = "sum",
                      mode: str = "continue",
                      compressor: int | str | None = 1) -> list[dict]:
    """E3 iterated: chain :func:`run_pyramid_step` z -> z-1 -> ... ->
    ``min_zoom`` (the reference's self-referential overview build,
    _output.py:146-163 + get_raw_output at :556, applied until the
    coarsest level). Level z's archive is ``<src base>_z{z}.zarr``.

    Per-level lineage + resume come from the step itself: every tile
    write appends a lineage record, and ``mode="continue"`` skips
    parents already recorded at that level — so a re-run (or a run
    resumed after a mid-chain failure) re-derives only the missing
    tiles of the incomplete level and reports 0 writes for finished
    ones. Consuming each step's Dataset (``count()``) is the write
    barrier level z+1 hands level z."""
    base = src_path.removesuffix(".zarr")
    results, src = [], src_path
    while (z := spec_from_archive(src).zoom - 1) >= min_zoom:
        dst = f"{base}_z{z}.zarr"
        n = run_pyramid_step(src, dst, how=how, mode=mode,
                             compressor=compressor).count()
        results.append({"zoom": z, "tiles_written": int(n), "path": dst})
        src = dst
    return results

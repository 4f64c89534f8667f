"""E1 — the flagship pipeline: pages -> extract -> assign -> per-tile
rasterize -> zarr-layout tile archive (+ lineage), Ray-Data-first.

Shape (SURVEY.md §3 E1):

    read pages (parquet fragments / in-memory table)
    -> map_batches(extract_stage)            # html->text, html dropped
    -> map_batches(assign)                   # lon/lat + tile_id/cell_id
    -> map_batches(compact)                  # NARROW the shuffle rows
    -> [continue mode] filter out done tiles # broadcast done-set
    -> groupby(tile_id).map_groups(write_tile)  # dedup+rasterize+sink
    -> Dataset of per-tile summaries

One tile = one group = one chunk file per band, so concurrent writers
never share a chunk (the reference's safe_chunks invariant,
_output.py:365-382). Exact url-dedup is free inside the group: the
geocode key IS the url, so all re-crawls of a url land in the same
tile group and are dropped there — no extra shuffle.

Scale decisions measured at 2-4M pages (see BASELINE.md):
- the compact stage precomputes band masks + the flat local pixel
  index so a shuffled row is (url, ts, 2 bools, tile_id, pix:int32) —
  the all-to-all never carries text/html/geo floats (2x end-to-end);
- block count into the groupby ~1.5-3x the CPU count (Ray's sort
  exchange cost is per-block; see run_pipeline's repartition_blocks);
- the done-tile set and hot-tile set are ray.put broadcasts, computed
  once on the driver from directory listings.

:func:`run_pipeline_salted` is the explicit-skew variant (A5 hot-tile
pre-count, url-hash salting that preserves exact dedup, associative
partial-grid merge); it is row-identical to the straight path
(tests/test_skew.py) and differs only in the physical plan.

A user ``process_fn(tile, pages, spec)`` (SURVEY §2.10) replaces the
default count-rasterize per tile; its return value is normalized per
the reference's output_cleaned (2-D/3-D/4-D numpy, "empty" sentinel).
"""

from __future__ import annotations

import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.fixtures import DEFAULT_BOUNDS, DEFAULT_ZOOM, make_pages
from mapchete_xarray_ray.grid import unpack_tile_id
from mapchete_xarray_ray.spec import JobSpec
from mapchete_xarray_ray.sinks.zarr import ZarrTileStore
from mapchete_xarray_ray.stages.assign import assign_pages_fn
from mapchete_xarray_ray.stages.text import extract_stage
from mapchete_xarray_ray.state.lineage import completed_tiles, write_record


def default_spec(out_path: str, time: dict | None = None, **kw) -> JobSpec:
    return JobSpec(
        path=out_path,
        zoom=kw.pop("zoom", DEFAULT_ZOOM),
        bounds=kw.pop("bounds", tuple(DEFAULT_BOUNDS)),
        band_names=kw.pop("band_names", ["count", "count_en", "count_long"]),
        dtype=kw.pop("dtype", "uint16"),
        time=time,
        **kw,
    )


class TileContext:
    """The per-tile surface a user process sees (the reference's
    ``mp.tile`` BufferedTile: .id/.bounds/.shape — tests/conftest.py:38,
    tests/testdata/generate_array.py:26)."""

    def __init__(self, spec: JobSpec, zoom: int, row: int, col: int):
        self.zoom, self.row, self.col = zoom, row, col
        self.id = (zoom, row, col)
        tb = spec.pyramid.tile_bounds(zoom, row, col)
        self.bounds = (float(tb.left), float(tb.bottom),
                       float(tb.right), float(tb.top))
        self.shape = (spec.chunk_px, spec.chunk_px)


# metadata keys the reference's output_cleaned strips from Dataset
# returns before writing (_output.py:467-481): the archive's own
# attrs would clash with stale copies coming back from a process
_RESERVED_ATTRS = ("mapchete", "_FillValue", "AREA_OR_POINT", "_CRS", "attrs")


def output_cleaned(data, spec: JobSpec) -> np.ndarray:
    """Normalize a process return value (reference output_cleaned,
    _output.py:441-492, M1-M3): (bands,h,w) passes; (h,w) promotes to
    one band; with a time axis a 4-D array is interpreted as
    ``(time, bands, h, w)`` — time and band cardinalities must match
    the archive exactly (_output.py:420-430) — and transposed to
    band-first (_output.py:432); other types raise.

    A dict return is the engine's ``xr.Dataset`` analogue (no xarray in
    this stack): ``{band_name: (h, w) | (T, h, w) array}``. Reserved
    metadata keys (``mapchete``, ``_FillValue``, ``AREA_OR_POINT``,
    ``_CRS``, ``attrs``) are stripped exactly like the reference strips
    Dataset/DataArray attrs (_output.py:467-481); the remaining keys
    must equal the archive's band names and are stacked band-first.

    True xarray returns are accepted by DUCK TYPE (xarray isn't in
    this stack, so there is no import to gate on): any object with a
    ``.data_vars`` mapping (``xr.Dataset``) routes through the dict
    path with per-variable ``.values`` extracted, and any non-ndarray
    with ``.dims`` + ``.values`` (``xr.DataArray``) routes through the
    ndarray path — so a process written against the reference driver
    (_output.py:455-492) returns its Dataset/DataArray unchanged.
    """
    if hasattr(data, "data_vars"):  # xr.Dataset (or any lookalike)
        data = {str(k): np.asarray(getattr(v, "values", v))
                for k, v in dict(data.data_vars).items()}
    elif (not isinstance(data, (np.ndarray, dict))
          and hasattr(data, "dims") and hasattr(data, "values")):
        data = np.asarray(data.values)  # xr.DataArray
    if isinstance(data, dict):
        bands = {k: v for k, v in data.items() if k not in _RESERVED_ATTRS}
        if set(bands) != set(spec.band_names):
            raise ValueError(
                f"process output bands {sorted(bands)} do not match archive "
                f"band names {spec.band_names}"
            )
        stacked = np.stack([np.asarray(bands[b]) for b in spec.band_names])
        if stacked.ndim == 4:
            # dict values carried a (T, h, w) time axis -> already
            # band-first after the stack; route through the 4-D check
            # in (time, bands, h, w) order like an ndarray return
            return output_cleaned(np.transpose(stacked, (1, 0, 2, 3)), spec)
        return output_cleaned(stacked, spec)
    if not isinstance(data, np.ndarray):
        raise TypeError(
            f"process output must be a numpy array, a {{band: array}} dict "
            f"or 'empty', not {type(data)}"
        )
    if data.ndim == 2:
        data = data[None, ...]
    if data.ndim == 4:
        if spec.time is None:
            raise ValueError("4-D process output requires a time axis in the spec")
        slices, bands = data.shape[:2]
        if slices != len(spec.timestamps):
            raise ValueError(
                f"NumPy array ({slices} slices) does not fit into archive "
                f"on time axis ({len(spec.timestamps)} slices)."
            )
        if bands != len(spec.band_names):
            raise ValueError(
                f"NumPy array ({bands} bands) does not fit into archive "
                f"on band axis ({len(spec.band_names)} bands)."
            )
        return np.transpose(data, (1, 0, 2, 3)).astype(spec.dtype)
    if data.ndim != 3:
        raise ValueError(f"expected (bands, h, w) or (h, w), got {data.shape}")
    if data.shape[0] != len(spec.band_names):
        raise ValueError(
            f"process output has {data.shape[0]} bands, spec declares "
            f"{len(spec.band_names)}"
        )
    return data.astype(spec.dtype)



def _narrow_compact(spec: JobSpec):
    """The ONE narrow shuffle projection (url, warc_ts, band masks,
    tile_id, pix) shared by the straight and salted plans — a change to
    the shuffle row shape happens here exactly once."""
    from mapchete_xarray_ray.stages.rasterize import local_pixel_indices

    def compact(batch: pa.Table) -> pa.Table:
        tl = pc.utf8_length(batch.column("text")).cast(pa.int64())
        iy, ix = local_pixel_indices(
            batch.column("lon").to_numpy(zero_copy_only=False),
            batch.column("lat").to_numpy(zero_copy_only=False),
            batch.column("tile_row").to_numpy(zero_copy_only=False),
            batch.column("tile_col").to_numpy(zero_copy_only=False),
            spec)
        return pa.table({
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "is_en": pc.equal(batch.column("lang"), "en"),
            "long_text": pc.greater_equal(tl, 80),
            "tile_id": batch.column("tile_id"),
            "pix": pa.array((iy * spec.chunk_px + ix).astype(np.int32)),
        })

    return compact


def _process_compact(spec: JobSpec):
    """Projection for user-process runs: keeps ``text`` (the documented
    hook contract gives the process the page content) plus geometry."""
    cols = ["url", "warc_ts", "lang", "text", "lon", "lat",
            "tile_row", "tile_col", "tile_id", "cell_id"]

    def compact(batch: pa.Table) -> pa.Table:
        tl = pc.utf8_length(batch.column("text")).cast(pa.int64())
        return batch.select(cols).append_column("text_len", tl)

    return compact


def _tile_writer(spec: JobSpec, process_fn=None):
    """map_groups fn: one tile's pages -> process (default: count
    rasterize) -> chunk write -> lineage. ``process_fn(tile, pages,
    spec)`` is the user-extension hook (SURVEY.md §2.10); returning
    "empty" skips the tile (no chunk written — reference
    tests/test_driver.py:39-46 semantics)."""

    _EMPTY_SUMMARY = pa.table({
        "tile_id": pa.array([], pa.int64()),
        "tile_row": pa.array([], pa.int64()),
        "tile_col": pa.array([], pa.int64()),
        "n_pages": pa.array([], pa.int64()),
        "chunks_written": pa.array([], pa.int64()),
        "checksum": pa.array([], pa.int64()),
    })

    def fn(group: pa.Table) -> pa.Table:
        # exact dedup per url (re-crawls co-locate here; keep first by warc_ts)
        order = pc.sort_indices(
            group, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
        )
        group = group.take(order)
        keep = np.ones(group.num_rows, dtype=bool)
        urls = group.column("url").to_numpy(zero_copy_only=False)
        keep[1:] = urls[1:] != urls[:-1]
        group = group.filter(pa.array(keep))

        tile_id = int(group.column("tile_id")[0].as_py())
        zoom, row, col = (int(x) for x in unpack_tile_id(tile_id))
        store = ZarrTileStore(spec)

        if process_fn is not None:
            data = process_fn(TileContext(spec, zoom, row, col), group, spec)
            if isinstance(data, str) and data == "empty":
                return _EMPTY_SUMMARY
            tensor = output_cleaned(data, spec)
            w0 = time.perf_counter()
            if tensor.ndim == 4:
                # tiles reaching the writer have no valid lineage record
                # (fresh / torn / invalidated) — never merge with the
                # untrusted existing chunk bytes (repair semantics)
                n_chunks = store.write_tile(row, col, tensor,
                                            timestamps=spec.timestamps,
                                            assume_fresh=True)
            else:
                n_chunks = store.write_tile(row, col, tensor)
            write_ms = int((time.perf_counter() - w0) * 1000)
            checksum = zlib.crc32(np.ascontiguousarray(tensor).tobytes())
            rec = {
                "tile_id": tile_id, "zoom": zoom, "tile_row": row,
                "tile_col": col, "rows_in": group.num_rows,
                "chunks_written": n_chunks, "checksum": int(checksum),
                "metrics": {"write_ms": write_ms,
                            "bytes": int(tensor.nbytes)},
            }
            if tensor.ndim == 4:
                # full time coverage — record it, or the audit can only
                # say legacy_unverifiable instead of catching real
                # corruption on this tile
                rec["time_idxs"] = list(range(len(spec.timestamps)))
            write_record(spec.path, rec)
            return pa.table({
                "tile_id": pa.array([tile_id], pa.int64()),
                "tile_row": pa.array([row], pa.int64()),
                "tile_col": pa.array([col], pa.int64()),
                "n_pages": pa.array([group.num_rows], pa.int64()),
                "chunks_written": pa.array([n_chunks], pa.int64()),
                "checksum": pa.array([int(checksum)], pa.int64()),
            })

        # narrow fast path: masks and flat pixel index were precomputed
        # BEFORE the shuffle (see _compact_narrow), so the writer does
        # three bincounts and the chunk write — no string/geo work here
        pix = group.column("pix").to_numpy(zero_copy_only=False)
        en = group.column("is_en").to_numpy(zero_copy_only=False)
        lt = group.column("long_text").to_numpy(zero_copy_only=False)
        npx = spec.chunk_px * spec.chunk_px

        def grids(p, e, l):
            g = np.zeros((3, npx), dtype=np.int64)
            np.add.at(g[0], p, 1)
            np.add.at(g[1], p[e], 1)
            np.add.at(g[2], p[l], 1)
            info = np.iinfo(np.dtype(spec.dtype))
            return (g.reshape(3, spec.chunk_px, spec.chunk_px)
                     .clip(info.min, info.max).astype(spec.dtype))

        # build first, then time ONLY the store write: "write_ms" must
        # mean the same thing in every record (a compute-skewed tile is
        # identifiable from rows_in/bytes; a slow STORE from write_ms)
        time_idxs = None
        if spec.time is not None:
            ts = group.column("warc_ts").to_numpy(zero_copy_only=False)
            uniq = np.array(sorted(set(ts.tolist())), dtype="datetime64[us]")
            per_t = [grids(pix[ts == t], en[ts == t], lt[ts == t]) for t in uniq]
            written_arr = np.stack(per_t, axis=1)  # (bands, T, h, w)
            # positions written into the archive's time coordinate —
            # recorded in lineage so the audit (pipelines/audit.py) can
            # re-read EXACTLY the written slices and re-derive the crc;
            # the STORE's mapping, so record and write cannot diverge
            time_idxs = store.time_indices(uniq)
            w0 = time.perf_counter()
            n_chunks = store.write_tile(row, col, written_arr,
                                        timestamps=uniq, assume_fresh=True)
        else:
            written_arr = grids(pix, en, lt)
            w0 = time.perf_counter()
            n_chunks = store.write_tile(row, col, written_arr)
        write_ms = int((time.perf_counter() - w0) * 1000)

        checksum = zlib.crc32(np.ascontiguousarray(written_arr).tobytes())
        from mapchete_xarray_ray.grid import cell_encode

        tile_cell = int(cell_encode(np.array([row]), np.array([col]),
                                    spec.zoom).astype(np.int64)[0])
        rec = {
            "tile_id": tile_id, "zoom": zoom, "tile_row": row, "tile_col": col,
            "rows_in": group.num_rows, "chunks_written": n_chunks,
            "checksum": int(checksum),
            "cell_range": [tile_cell, tile_cell],
            "metrics": {"write_ms": write_ms,
                        "bytes": int(written_arr.nbytes)},
        }
        if time_idxs is not None:
            rec["time_idxs"] = time_idxs
        write_record(spec.path, rec)
        return pa.table({
            "tile_id": pa.array([tile_id], pa.int64()),
            "tile_row": pa.array([row], pa.int64()),
            "tile_col": pa.array([col], pa.int64()),
            "n_pages": pa.array([group.num_rows], pa.int64()),
            "chunks_written": pa.array([n_chunks], pa.int64()),
            "checksum": pa.array([int(checksum)], pa.int64()),
        })

    return fn


def run_pipeline(ds: ray.data.Dataset, spec: JobSpec, mode: str = "continue",
                 already_extracted: bool = False,
                 process_fn=None,
                 repartition_blocks: int | None = None) -> ray.data.Dataset:
    """Run E1 over a pages Dataset. ``mode``: 'continue' (skip complete
    tiles — reference tests/test_driver.py:107-118 semantics) or
    'overwrite' (recompute all). ``process_fn``: optional user process
    (see processes/convert.py) applied per tile instead of the default
    count rasterize. ``repartition_blocks``: block count going into the
    groupby shuffle — None picks ~3x the cluster CPUs; pass 0 to skip
    (when the caller already sized blocks, e.g. via
    ``read_parquet(override_num_blocks=...)``, skipping avoids the
    repartition barrier entirely)."""
    if process_fn is None and len(spec.band_names) != 3:
        raise ValueError(
            "the default process writes exactly 3 bands (count, en count, "
            "long-text count); declare 3 band_names or pass a process_fn"
        )
    store = ZarrTileStore(spec)
    store.prepare()

    if not already_extracted:
        ds = ds.map_batches(extract_stage, batch_format="pyarrow")
    ds = ds.map_batches(
        assign_pages_fn(spec.snapped_bounds, spec.zoom, spec.grid, spec.cell_zoom,
                        pyramid=spec.pyramid),
        batch_format="pyarrow",
    )

    # project rows down BEFORE the shuffle (SURVEY.md §7 hard part 6):
    # text/html never enter the all-to-all exchange. The default path
    # goes further and precomputes everything the writer needs — band
    # masks as bools and the flat local pixel index — so a shuffled row
    # is (url, warc_ts, 2 bools, tile_id, pix:int32): measured 2x faster
    # end-to-end than shipping lon/lat/lang/text_len at 2M pages.
    compact = (_process_compact(spec) if process_fn is not None
               else _narrow_compact(spec))
    ds = ds.map_batches(compact, batch_format="pyarrow")

    if mode == "continue":
        done = completed_tiles(store)
        if done:
            done_ref = ray.put(np.array(sorted(done), dtype=np.int64))

            def drop_done(batch: pa.Table) -> pa.Table:
                done_arr = ray.get(done_ref)
                tid = batch.column("tile_id").to_numpy()
                keep = ~np.isin(tid, done_arr)
                return batch.filter(pa.array(keep))

            ds = ds.map_batches(drop_done, batch_format="pyarrow")

    # consolidate blocks before the groupby shuffle: the sort's cost is
    # dominated by per-block overhead (S blocks -> S^2 shuffle objects);
    # ~3 blocks per CPU keeps the sort parallel without drowning the
    # object store in tiny transfers (measured 40s -> 7s at 200k pages)
    if repartition_blocks is None:
        from mapchete_xarray_ray.scale import nblocks_for_cluster

        repartition_blocks = nblocks_for_cluster(3.0, lo=8)
    if repartition_blocks:
        ds = ds.repartition(repartition_blocks)

    return ds.groupby("tile_id").map_groups(_tile_writer(spec, process_fn),
                                            batch_format="pyarrow")


def _salted_partial_writer(spec: JobSpec):
    """map_groups fn over a BUCKET of (tile_id, salt) segments:
    vectorized dedup-by-url + partial rasterize per segment; emits one
    row per segment carrying its partial grid as int32 bytes.

    Salt = stable_hash(url) % n_salt, so every re-crawl of a url lands
    in the SAME (tile, salt) segment — first-by-warc_ts dedup stays
    exact under salting. Grouping by a coarse bucket (not per segment)
    keeps Ray's per-group call overhead off the critical path when MANY
    tiles are hot (measured 252s -> seconds at 8192 all-hot segments).
    """

    def fn(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("tile_id", "ascending"), ("salt", "ascending"),
            ("url", "ascending"), ("warc_ts", "ascending")])
        group = group.take(order)
        tid = group.column("tile_id").to_numpy(zero_copy_only=False)
        salt = group.column("salt").to_numpy(zero_copy_only=False)
        urls = group.column("url").to_numpy(zero_copy_only=False)
        keep = np.ones(group.num_rows, dtype=bool)
        keep[1:] = ((tid[1:] != tid[:-1]) | (salt[1:] != salt[:-1])
                    | (urls[1:] != urls[:-1]))
        group = group.filter(pa.array(keep))
        tid = group.column("tile_id").to_numpy(zero_copy_only=False)
        salt = group.column("salt").to_numpy(zero_copy_only=False)
        pix = group.column("pix").to_numpy(zero_copy_only=False).astype(np.int64)
        en = group.column("is_en").to_numpy(zero_copy_only=False)
        lt = group.column("long_text").to_numpy(zero_copy_only=False)

        new_seg = np.ones(len(tid), dtype=bool)
        new_seg[1:] = (tid[1:] != tid[:-1]) | (salt[1:] != salt[:-1])
        seg_idx = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        lens = np.diff(np.append(starts, len(tid)))
        n_segs = len(starts)
        npx = spec.chunk_px * spec.chunk_px
        # flat (segment, band, pixel) accumulation — three add.at calls
        # total for the whole bucket, regardless of segment count
        grids = np.zeros((n_segs, 3, npx), dtype=np.int32)
        flat = grids.reshape(-1)
        base = seg_idx * (3 * npx)
        np.add.at(flat, base + pix, 1)
        np.add.at(flat, base[en] + npx + pix[en], 1)
        np.add.at(flat, base[lt] + 2 * npx + pix[lt], 1)
        # SPARSE partial encoding: a salted partial touches ~rows/n_salt
        # pixels of the 65k grid, so shipping (pix, c0, c1, c2) rows is
        # orders of magnitude lighter than the dense tensor (the dense
        # all-hot case moved GBs through the merge shuffle). Format:
        # int32 array [nnz, pix..., c0..., c1..., c2...].
        bufs = []
        for i in range(n_segs):
            nz = np.flatnonzero(grids[i].any(axis=0))
            rec = np.concatenate([
                np.array([len(nz)], dtype=np.int32),
                nz.astype(np.int32),
                grids[i, 0, nz], grids[i, 1, nz], grids[i, 2, nz],
            ])
            bufs.append(rec.tobytes())
        return pa.table({
            "tile_id": pa.array(tid[starts], pa.int64()),
            "n_pages": pa.array(lens.astype(np.int64)),
            "grid": pa.array(bufs, pa.large_binary()),
        })

    return fn


def _salted_merge_writer(spec: JobSpec):
    """map_groups fn over a BUCKET of tiles: '+'-merge each tile's
    salted partial grids, clip to the output dtype, write chunk +
    lineage per tile. The python loop per tile does real IO work, so
    the coarse bucket only amortizes Ray's per-group dispatch."""

    def fn(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("tile_id", "ascending")])
        group = group.take(order)
        tid = group.column("tile_id").to_numpy(zero_copy_only=False)
        n_pages_col = group.column("n_pages").to_numpy(zero_copy_only=False)
        bufs = group.column("grid").to_pylist()
        h = w = spec.chunk_px
        info = np.iinfo(np.dtype(spec.dtype))
        store = ZarrTileStore(spec)
        new_seg = np.ones(len(tid), dtype=bool)
        new_seg[1:] = tid[1:] != tid[:-1]
        starts = np.flatnonzero(new_seg)
        lens = np.diff(np.append(starts, len(tid)))
        out = {"tile_id": [], "tile_row": [], "tile_col": [], "n_pages": [],
               "chunks_written": [], "checksum": []}
        for s, L in zip(starts, lens):
            tile_id = int(tid[s])
            zoom, row, col = (int(x) for x in unpack_tile_id(tile_id))
            total = np.zeros((3, h * w), dtype=np.int64)
            for j in range(s, s + L):
                rec = np.frombuffer(bufs[j], dtype=np.int32)
                nnz = int(rec[0])
                nz = rec[1:1 + nnz]
                for b in range(3):
                    np.add.at(total[b], nz, rec[1 + nnz * (b + 1):1 + nnz * (b + 2)])
            total = total.reshape(3, h, w)
            tensor = total.clip(info.min, info.max).astype(spec.dtype)
            w0 = time.perf_counter()
            n_chunks = store.write_tile(row, col, tensor)
            write_ms = int((time.perf_counter() - w0) * 1000)
            checksum = zlib.crc32(np.ascontiguousarray(tensor).tobytes())
            n_pages = int(n_pages_col[s:s + L].sum())
            write_record(spec.path, {
                "tile_id": tile_id, "zoom": zoom, "tile_row": row,
                "tile_col": col, "rows_in": n_pages, "chunks_written": n_chunks,
                "checksum": int(checksum), "salted_partials": int(L),
                "metrics": {"write_ms": write_ms,
                            "bytes": int(tensor.nbytes)},
            })
            out["tile_id"].append(tile_id)
            out["tile_row"].append(row)
            out["tile_col"].append(col)
            out["n_pages"].append(n_pages)
            out["chunks_written"].append(n_chunks)
            out["checksum"].append(int(checksum))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return fn


def run_pipeline_salted(ds: ray.data.Dataset, spec: JobSpec,
                        hot_threshold: int = 50_000, n_salt: int = 8,
                        mode: str = "continue",
                        already_extracted: bool = False) -> ray.data.Dataset:
    """E1 with explicit skew handling (SURVEY.md §4 skew row, A5):

    1. extract/assign/compact as in :func:`run_pipeline`, then
       ``materialize()`` the narrow projection (it is re-read twice);
    2. A5 pre-count rows per tile with a partial-then-small ``groupby``;
       tiles above ``hot_threshold`` are HOT (driver holds only the
       per-tile counts — tiny);
    3. hot tiles' rows get ``salt = stable_hash(url) % n_salt`` (cold
       tiles salt 0) and the expensive dedup+rasterize group work runs
       per (tile_id, salt) — a hot tile is processed by ``n_salt``
       parallel tasks instead of one straggler;
    4. the per-tile merge ('+' of partial count grids) moves only
       ``n_salt`` small grid payloads per tile, then writes chunk +
       lineage exactly once per tile.

    Output is row-identical to :func:`run_pipeline` (asserted in
    tests/test_skew.py) — salting changes the physical plan only.
    """
    store = ZarrTileStore(spec)
    store.prepare()

    if not already_extracted:
        ds = ds.map_batches(extract_stage, batch_format="pyarrow")
    ds = ds.map_batches(
        assign_pages_fn(spec.snapped_bounds, spec.zoom, spec.grid, spec.cell_zoom,
                        pyramid=spec.pyramid),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(_narrow_compact(spec), batch_format="pyarrow")

    if mode == "continue":
        done = completed_tiles(store)
        if done:
            done_ref = ray.put(np.array(sorted(done), dtype=np.int64))

            def drop_done(batch: pa.Table) -> pa.Table:
                keep = ~np.isin(batch.column("tile_id").to_numpy(),
                                ray.get(done_ref))
                return batch.filter(pa.array(keep))

            ds = ds.map_batches(drop_done, batch_format="pyarrow")

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    ds = ds.repartition(max(8, ncpu * 3)).materialize()

    # A5: per-tile counts (partial per batch -> small groupby -> driver)
    def tile_counts(batch: pa.Table) -> pa.Table:
        t = batch.group_by("tile_id").aggregate([("tile_id", "count")])
        return t.rename_columns(["tile_id", "n"])

    counts = (ds.map_batches(tile_counts, batch_format="pyarrow")
                .groupby("tile_id").sum("n"))
    counts_tbl = pa.concat_tables(
        [t for t in (ray.get(r) for r in arrow_block_refs(counts))
         if t.num_columns > 0])
    hot = counts_tbl.filter(
        pc.greater(counts_tbl.column("sum(n)"), hot_threshold)
    ).column("tile_id").to_numpy().astype(np.int64)
    hot_ref = ray.put(hot)

    from mapchete_xarray_ray.functions.geocode import stable_hash64

    def add_salt(batch: pa.Table) -> pa.Table:
        tid = batch.column("tile_id").to_numpy()
        is_hot = np.isin(tid, ray.get(hot_ref))
        salt = np.zeros(len(tid), dtype=np.int64)
        if is_hot.any():
            urls = batch.column("url").to_numpy(zero_copy_only=False)
            salt[is_hot] = (stable_hash64(urls[is_hot]) %
                            np.uint64(n_salt)).astype(np.int64)
        batch = batch.append_column("salt", pa.array(salt))
        # coarse shuffle keys: whole (tile, salt) segments per bucket —
        # Ray's per-group dispatch is amortized over many segments
        pb = ((tid * 8191 + salt) % 256).astype(np.int64)
        return batch.append_column("pbucket", pa.array(pb))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby("pbucket").map_groups(
        _salted_partial_writer(spec), batch_format="pyarrow")

    def add_tbucket(batch: pa.Table) -> pa.Table:
        if "tile_id" not in batch.column_names:
            return pa.table({"tile_id": pa.array([], pa.int64()),
                             "n_pages": pa.array([], pa.int64()),
                             "grid": pa.array([], pa.large_binary()),
                             "tbucket": pa.array([], pa.int64())})
        tb = (batch.column("tile_id").to_numpy() % 64).astype(np.int64)
        return batch.append_column("tbucket", pa.array(tb))

    return (partials.map_batches(add_tbucket, batch_format="pyarrow")
            .groupby("tbucket")
            .map_groups(_salted_merge_writer(spec), batch_format="pyarrow"))


def run_flagship(sf_dir: str, out_path: str | None = None, n_pages: int = 2000,
                 mode: str = "overwrite") -> ray.data.Dataset:
    """Driver entry: deterministic pages table (input_hint shape) ->
    full E1 -> per-tile summary Dataset. ``sf_dir`` only scales n."""
    if out_path is None:
        out_path = f"/tmp/mxr_flagship_{os.getpid()}.zarr"
    if mode == "overwrite" and os.path.exists(out_path):
        import shutil

        shutil.rmtree(out_path)
    pages = make_pages(n=n_pages)
    spec = default_spec(out_path)
    ds = ray.data.from_arrow(pages)
    return run_pipeline(ds, spec, mode="continue")

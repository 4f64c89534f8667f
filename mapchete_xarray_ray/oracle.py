"""Sequential pure-python/numpy oracle (FIXTURES.md F5).

Computes golden outputs for the pages pipelines WITHOUT Ray — simple,
obviously-correct loops. The Ray engine's distributed results must
match these row-exactly (set equality on rows; byte equality on text).
Where a kernel must be byte-identical (text extraction, geocoding) the
oracle *shares* the kernel module — determinism then only requires the
engine to be order-independent, which the tests verify by comparing
sorted rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mapchete_xarray_ray.functions.extract import extract_text
from mapchete_xarray_ray.functions.geocode import geocode_url
from mapchete_xarray_ray.grid import Bounds, TilePyramid, cell_encode, pack_tile_id


def oracle_tile_assign(pages: pa.Table, bounds: Bounds, zoom: int,
                       grid: str = "geodetic") -> pa.Table:
    """Per-page (url, zoom, tile_row, tile_col, tile_id, cell_id)."""
    pyramid = TilePyramid(grid)
    urls = pages.column("url").to_numpy(zero_copy_only=False)
    lon, lat = geocode_url(urls, bounds, zoom, pyramid)
    rows, cols = [], []
    tx, ty = pyramid.tile_x_size(zoom), pyramid.tile_y_size(zoom)
    for x, y in zip(lon, lat):  # deliberate scalar loop: independent of the
        # vectorized path so float/trunc bugs in either implementation show up
        c = min(int((x - pyramid.left) / tx), pyramid.matrix_width(zoom) - 1)
        r = min(int((pyramid.top - y) / ty), pyramid.matrix_height(zoom) - 1)
        rows.append(max(r, 0))
        cols.append(max(c, 0))
    rows = np.array(rows, dtype=np.int64)
    cols = np.array(cols, dtype=np.int64)
    return pa.table({
        "url": pages.column("url"),
        "zoom": pa.array(np.full(len(rows), zoom, dtype=np.int64)),
        "tile_row": pa.array(rows),
        "tile_col": pa.array(cols),
        "tile_id": pa.array(pack_tile_id(zoom, rows, cols)),
        "cell_id": pa.array(cell_encode(rows, cols, zoom).astype(np.int64)),
    })


def oracle_extracted(pages: pa.Table) -> dict[str, str]:
    """url -> byte-identical extracted text (first occurrence wins)."""
    out: dict[str, str] = {}
    for url, html in zip(pages.column("url").to_pylist(),
                         pages.column("html").to_pylist()):
        if url not in out:
            out[url] = extract_text(html)
    return out


# --- point-in-polygon ----------------------------------------------------

def point_in_ring(x: float, y: float, ring: list) -> bool:
    """Scalar even-odd ray-casting PIP with the documented boundary rule:
    a point exactly on an edge or vertex counts as INSIDE. Shared tie
    rule (FIXTURES.md F5): when a point is inside several regions it is
    assigned the lowest region_id; both oracle and engine apply it.
    """
    n = len(ring) - 1  # closed ring: last == first
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        # on-edge check (collinear + within bbox) -> inside by rule
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        if cross == 0.0 and min(x1, x2) <= x <= max(x1, x2) and min(y1, y2) <= y <= max(y1, y2):
            return True
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return inside


def oracle_pip_join(pages: pa.Table, regions: pa.Table, bounds: Bounds,
                    zoom: int, grid: str = "geodetic") -> pa.Table:
    """(url, region_id) — one row per page inside a region; a page in
    several regions gets the lowest region_id; pages in none are absent."""
    pyramid = TilePyramid(grid)
    urls = pages.column("url").to_numpy(zero_copy_only=False)
    lon, lat = geocode_url(urls, bounds, zoom, pyramid)
    rings = regions.column("ring_xy").to_pylist()
    rids = regions.column("region_id").to_pylist()
    out_urls, out_rids = [], []
    for u, x, y in zip(urls, lon, lat):
        best = None
        for rid, ring in sorted(zip(rids, rings)):
            if point_in_ring(float(x), float(y), ring):
                best = rid
                break
        if best is not None:
            out_urls.append(u)
            out_rids.append(best)
    return pa.table({"url": pa.array(out_urls, pa.string()),
                     "region_id": pa.array(out_rids, pa.int64())})


def oracle_knn(pages: pa.Table, bounds: Bounds, zoom: int, k: int = 3,
               grid: str = "geodetic") -> pa.Table:
    """(url, neighbor_url, rank, dist2) — k nearest distinct-url pages by
    squared planar degree distance; ties by neighbor id (stable url
    hash) ascending — the engine's documented tie rule."""
    from mapchete_xarray_ray.functions.geocode import stable_hash64

    pyramid = TilePyramid(grid)
    urls = pages.column("url").to_numpy(zero_copy_only=False)
    # dedup urls (first occurrence) so re-crawls don't produce self-pairs
    seen, uu = set(), []
    for u in urls:
        if u not in seen:
            seen.add(u)
            uu.append(u)
    uu = np.array(uu, dtype=object)
    lon, lat = geocode_url(uu, bounds, zoom, pyramid)
    hid = stable_hash64(uu).astype(np.int64)
    out = {"url": [], "neighbor_url": [], "rank": [], "dist2": []}
    for i in range(len(uu)):
        cand = []
        for j in range(len(uu)):
            if uu[j] == uu[i]:
                continue
            d2 = (lon[i] - lon[j]) ** 2 + (lat[i] - lat[j]) ** 2
            cand.append((d2, int(hid[j]), uu[j]))
        cand.sort()
        for rank, (d2, _h, nu) in enumerate(cand[:k], start=1):
            out["url"].append(uu[i])
            out["neighbor_url"].append(nu)
            out["rank"].append(rank)
            out["dist2"].append(d2)
    return pa.table({
        "url": pa.array(out["url"], pa.string()),
        "neighbor_url": pa.array(out["neighbor_url"], pa.string()),
        "rank": pa.array(out["rank"], pa.int64()),
        "dist2": pa.array(out["dist2"], pa.float64()),
    })

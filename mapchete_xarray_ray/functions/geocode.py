"""Deterministic geocoding kernels (vectorized).

Two kernels, both pure and order-independent:

- :func:`geocode_url` — stable 64-bit hash of the url string (pandas
  ``hash_array``, fixed key, deterministic across processes) mapped to
  a pixel of the snapped process region; used by the pages pipelines
  and their sequential oracle.
- :func:`geocode_doc_id` — integer-arithmetic geocode of an int64 id
  onto the global pixel grid of a zoom level. Expressible in ANSI SQL
  (``(doc_id * 2654435761) % width``), which is what lets the DuckDB
  oracle reproduce tile assignments bit-exactly: everything stays in
  int64 space until the final (optional) lon/lat conversion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mapchete_xarray_ray.grid import Bounds, TilePyramid

# SQL-expressible multipliers (Knuth / odd constants)
_PX_MULT = 2654435761
_PY_MULT = 40503


def geocode_doc_id(doc_id: np.ndarray, zoom: int, pyramid: TilePyramid | None = None):
    """int64 ids -> (px, py) global pixel coords at ``zoom``; int64-exact.

    SQL equivalent (geodetic, tile_size 256)::

        px = (doc_id * 2654435761) % (2**(zoom+1) * 256)
        py = (doc_id * 40503)      % (2**zoom     * 256)

    Supported domain: ``0 <= doc_id < 2**31``. Beyond that the int64
    product ``doc_id * 2654435761`` overflows; numpy would silently
    wrap (C semantics) while the SQL twin errors or differs, so the
    int64-exact engine/SQL equivalence claim is bounded and enforced
    here. (10^12-doc corpora shard ids per partition; the per-shard id
    space stays well under 2^31.)
    """
    pyramid = pyramid or TilePyramid("geodetic")
    width = pyramid.matrix_width(zoom) * pyramid.tile_size * pyramid.metatiling
    height = pyramid.matrix_height(zoom) * pyramid.tile_size * pyramid.metatiling
    d = np.asarray(doc_id, dtype=np.int64)
    if d.size and (d.min() < 0 or d.max() >= 2**31):
        raise ValueError(
            "geocode_doc_id requires 0 <= doc_id < 2**31 (int64-exact "
            f"SQL-twin domain); got range [{d.min()}, {d.max()}]"
        )
    px = (d * _PX_MULT) % width
    py = (d * _PY_MULT) % height
    return px, py


def pixel_to_lonlat(px, py, zoom: int, pyramid: TilePyramid | None = None):
    """Global pixel index -> pixel-center lon/lat (float64)."""
    pyramid = pyramid or TilePyramid("geodetic")
    sx = pyramid.pixel_x_size(zoom)
    sy = pyramid.pixel_y_size(zoom)
    lon = pyramid.left + (np.asarray(px, dtype=np.float64) + 0.5) * sx
    lat = pyramid.top - (np.asarray(py, dtype=np.float64) + 0.5) * sy
    return lon, lat


def stable_hash64(values) -> np.ndarray:
    """Deterministic uint64 hash of a string array (fixed key, vectorized)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def geocode_url(urls, bounds: Bounds, zoom: int, pyramid: TilePyramid | None = None):
    """urls -> (lon, lat) pixel centers inside ``bounds`` (snapped region).

    Hash-uniform over the region's pixel grid; pure function of the url
    bytes so the engine and the sequential oracle agree regardless of
    row order or partitioning.
    """
    pyramid = pyramid or TilePyramid("geodetic")
    h = stable_hash64(urls)
    sx = pyramid.pixel_x_size(zoom)
    sy = pyramid.pixel_y_size(zoom)
    width = int(round((bounds.right - bounds.left) / sx))
    height = int(round((bounds.top - bounds.bottom) / sy))
    px = (h % np.uint64(width)).astype(np.int64)
    py = ((h >> np.uint64(32)) % np.uint64(height)).astype(np.int64)
    lon = bounds.left + (px.astype(np.float64) + 0.5) * sx
    lat = bounds.top - (py.astype(np.float64) + 0.5) * sy
    return lon, lat

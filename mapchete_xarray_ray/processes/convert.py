"""Bundled example processes (reference parity:
mapchete_xarray/processes/convert_to_xarray.py:6-49).

A *process* is the user-extension hook of the engine (SURVEY.md §2.10):
a plain function ``fn(tile, pages, spec) -> np.ndarray | "empty"``
called once per tile inside the tile ``map_groups`` task, where

- ``tile`` is a :class:`TileContext` (``.zoom/.row/.col/.bounds/
  .shape/.id`` — the BufferedTile surface the reference exposes as
  ``mp.tile``),
- ``pages`` is the tile's deduplicated pyarrow Table (the "input" the
  reference reaches via ``mp.open(...)``),
- the return value is normalized exactly like the reference's
  ``output_cleaned`` (_output.py:441-492): ``(bands, h, w)`` ndarray
  passes through; ``(h, w)`` is promoted to one band; the string
  ``"empty"`` (reference convention, processes/convert_to_xarray.py:22)
  skips the tile — nothing is written, reading it later yields
  fill_value; any other type raises TypeError.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mapchete_xarray_ray.spec import JobSpec
from mapchete_xarray_ray.stages.rasterize import rasterize_counts


def convert_to_tensor(tile, pages: pa.Table, spec: JobSpec):
    """Default bundled process: per-pixel page-count grids.

    Band semantics mirror the flagship bands: total count, lang == "en"
    count, long-text count. Early-returns "empty" on an empty tile,
    like the reference process does for empty/masked raster input
    (processes/convert_to_xarray.py:20-24).
    """
    if pages.num_rows == 0:
        return "empty"
    lang = pages.column("lang").to_numpy(zero_copy_only=False)
    text_len = pages.column("text_len").to_numpy(zero_copy_only=False)
    return rasterize_counts(pages, spec, [None, lang == "en", text_len >= 80])


def hillshade_like(tile, pages: pa.Table, spec: JobSpec):
    """Second bundled example: single-band log-scaled density (shows a
    (h, w) return being promoted to one band by output_cleaned)."""
    if pages.num_rows == 0:
        return "empty"
    grid = rasterize_counts(pages, spec, [None])[0].astype(np.float64)
    return np.log1p(grid).astype(spec.dtype)

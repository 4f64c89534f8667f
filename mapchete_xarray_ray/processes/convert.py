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


def index_feature_attrs(features, index_field: str = "index",
                        slice_id_field: str = "slice_id") -> dict:
    """Vector-feature index lookup (reference
    processes/convert_to_xarray.py:26-33): map each feature's slice id
    to its index value, e.g. granule ids per time slice."""
    return {
        f["properties"][slice_id_field]: f["properties"][index_field]
        for f in features
    }


def make_convert_process(band_names=None, index=None, index_band=None,
                         index_field: str = "index",
                         slice_id_field: str = "slice_id"):
    """Configured variant of the bundled process, mirroring the
    reference's ``execute(mp, band_names=..., index_band=...,
    index_field=..., slice_id_field=...)`` signature
    (processes/convert_to_xarray.py:6-12) including its guards:
    ``index`` without ``index_band`` raises; ``band_names`` cardinality
    must match the output. Returns a process fn producing the engine's
    Dataset analogue — a ``{band_name: array}`` dict with an ``attrs``
    entry carrying the feature-index json (stripped by output_cleaned
    before the write, like the reference strips Dataset attrs).
    """
    import json

    if index is not None and index_band is None:
        raise ValueError("index_band has to be specified if indexes are provided")

    def process(tile, pages: pa.Table, spec: JobSpec):
        if pages.num_rows == 0:
            return "empty"
        if band_names is not None and len(band_names) != len(spec.band_names):
            raise ValueError(
                "band_names has to be the same length than input array")
        lang = pages.column("lang").to_numpy(zero_copy_only=False)
        text_len = pages.column("text_len").to_numpy(zero_copy_only=False)
        tensor = rasterize_counts(pages, spec,
                                  [None, lang == "en", text_len >= 80])
        names = list(band_names) if band_names is not None else list(
            spec.band_names)
        if len(names) != tensor.shape[0]:
            raise ValueError(
                f"process produced {tensor.shape[0]} bands but "
                f"{len(names)} band names are declared"
            )
        out = dict(zip(names, tensor))
        attrs = {}
        if index is not None:
            attrs["slice_ids"] = index_feature_attrs(
                index, index_field, slice_id_field)
        out["attrs"] = {"json": json.dumps(attrs)}
        return out

    return process


def hillshade_like(tile, pages: pa.Table, spec: JobSpec):
    """Second bundled example: single-band log-scaled density (shows a
    (h, w) return being promoted to one band by output_cleaned)."""
    if pages.num_rows == 0:
        return "empty"
    grid = rasterize_counts(pages, spec, [None])[0].astype(np.float64)
    return np.log1p(grid).astype(spec.dtype)

"""Driver registration parity + e2e runs over the wider config space
(metatiling, mercator grid) the reference supports."""

import numpy as np
import pyarrow as pa
import ray
from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.fixtures import make_pages
from mapchete_xarray_ray.formats import (
    available_output_formats,
    driver_from_extension,
    driver_from_file,
)
from mapchete_xarray_ray.pipelines.flagship import default_spec, run_pipeline
from mapchete_xarray_ray.sinks.zarr import ZarrTileStore
from mapchete_xarray_ray.spec import JobSpec


def _collect(ds) -> pa.Table:
    tabs = [t for t in (ray.get(r) for r in arrow_block_refs(ds))
            if t.num_columns > 0]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def test_driver_registration():
    # mirrors reference tests/test_driver.py:9-14
    assert "xarray" in available_output_formats()
    assert driver_from_extension("zarr") == "xarray"
    assert driver_from_extension(".zarr") == "xarray"
    assert driver_from_file("/x/y/out.zarr") == "xarray"


def test_e2e_metatiling_2(tmp_path):
    """metatiling=2: chunk = 512 px, matrix halves; counts preserved."""
    pages = make_pages(n=400)
    spec = JobSpec(
        path=str(tmp_path / "meta2.zarr"),
        zoom=5,
        bounds=(-180.0, 45.0, -135.0, 90.0),
        metatiling=2,
        band_names=["count", "count_en", "count_long"],
        dtype="uint16",
    )
    assert spec.chunk_px == 512
    out = _collect(run_pipeline(ray.data.from_arrow(pages), spec))
    assert out.num_rows > 0
    assert out.column("tile_row").to_numpy().max() <= 3  # 4x4 metatiles
    store = ZarrTileStore(spec)
    total = sum(int(store.read_tile(r, c, bands=["count"]).sum())
                for r, c in store.existing_tiles())
    n_unique = len(set(pages.column("url").to_pylist()))
    assert total == n_unique
    # chunk shape in metadata is 512
    import json
    import os

    za = json.load(open(os.path.join(spec.path, "count", ".zarray")))
    assert za["chunks"] == [512, 512]
    assert za["shape"] == [2048, 2048]


def test_e2e_mercator_grid(tmp_path):
    """mercator grid end-to-end: square matrix, meters-based bounds."""
    from mapchete_xarray_ray.grid import MERC_R

    # one quadrant of the mercator world at z3 (8x8 tiles globally)
    bounds = (0.0, 0.0, MERC_R, MERC_R)
    spec = JobSpec(
        path=str(tmp_path / "merc.zarr"),
        zoom=3,
        bounds=bounds,
        grid="mercator",
        band_names=["count", "count_en", "count_long"],
        dtype="uint16",
    )
    pages = make_pages(n=300)
    out = _collect(run_pipeline(ray.data.from_arrow(pages), spec))
    assert out.num_rows > 0
    store = ZarrTileStore(spec)
    total = sum(int(store.read_tile(r, c, bands=["count"]).sum())
                for r, c in store.existing_tiles())
    assert total == len(set(pages.column("url").to_pylist()))
    # tiles stay in the requested quadrant (rows 0..3, cols 4..7)
    rows = out.column("tile_row").to_numpy()
    cols = out.column("tile_col").to_numpy()
    assert rows.max() <= 3 and cols.min() >= 4

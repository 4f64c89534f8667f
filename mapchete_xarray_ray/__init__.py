"""mapchete_xarray_ray — a Ray-Data-native tiling + spatial-join engine.

Brand-new engine with the query/data-processing capabilities of the
``ungarj/mapchete_xarray`` reference plugin (deterministic (zoom, row,
col) tile assignment, tile-aligned chunked zarr-layout output,
tile-window reads, band/time selection, resume from chunk existence),
re-expressed as ``ray.data.Dataset`` pipelines over Parquet tables of
Common-Crawl-style web pages, plus the spatial-join operators
(point-in-polygon, kNN, raster<->vector) and training-data-pipeline
operators (dedup, ANN, text analysis) the north rule adds.

Nothing in this package calls ``ray.init()`` — sessions are owned by
the caller (bench.py / CLI / test fixture / the driver).
"""

from mapchete_xarray_ray.grid import (
    Bounds,
    TilePyramid,
    cell_decode,
    cell_encode,
    cell_parent,
    k_ring,
    pack_tile_id,
    unpack_tile_id,
)

__version__ = "0.1.0"

__all__ = [
    "Bounds",
    "TilePyramid",
    "cell_decode",
    "cell_encode",
    "cell_parent",
    "k_ring",
    "pack_tile_id",
    "unpack_tile_id",
]

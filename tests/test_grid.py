"""Grid-math conformance tests (FIXTURES.md F3).

Pinned vectors derive from the reference fixtures:
- /root/reference/tests/testdata/s2_stack.zarr/.zmetadata (delimiters)
- /root/reference/tests/testdata/output_3d.mapchete (bounds [-180,45,-135,90] z5)
- mapchete_xarray/_output.py:76-91, 202-205, 281-297 formulas.
"""

import numpy as np
import pytest

from mapchete_xarray_ray.grid import (
    Bounds,
    TilePyramid,
    bounds_to_ranges,
    cell_decode,
    cell_encode,
    cell_parent,
    k_ring,
    output_shape,
    pack_tile_id,
    unpack_tile_id,
    zarr_chunk_from_xy,
)

GEO = TilePyramid("geodetic")


def test_pyramid_basic_shape():
    assert (GEO.matrix_height(0), GEO.matrix_width(0)) == (1, 2)
    assert (GEO.matrix_height(5), GEO.matrix_width(5)) == (32, 64)
    assert GEO.tile_x_size(5) == 5.625
    assert GEO.pixel_x_size(5) == 180 / (2**5 * 256)
    assert GEO.pixel_x_size(5) == 0.02197265625


def test_snap_bounds_s2_stack_fixture():
    # s2_stack.zarr .zmetadata: process_bounds -> effective_bounds
    snapped = GEO.snap_bounds((15.0064, 47.7604, 16.4863, 48.7485), 5)
    assert tuple(snapped) == (11.25, 45.0, 16.875, 50.625)


def test_snap_bounds_already_snapped():
    snapped = GEO.snap_bounds((-180, 45, -135, 90), 5)
    assert tuple(snapped) == (-180.0, 45.0, -135.0, 90.0)


def test_point_to_tile_s2_fixture_tile():
    # the single tile of the s2_stack fixture is (zoom=5, row=7, col=34)
    row, col = GEO.point_to_tile(np.array([11.25 + 2.8]), np.array([45.0 + 2.8]), 5)
    assert (row[0], col[0]) == (7, 34)


def test_output_shape_3d_fixture():
    # output_3d.mapchete: bounds [-180,45,-135,90] @ z5 -> 8x8 tiles -> 2048x2048
    shp = output_shape(Bounds(-180, 45, -135, 90), GEO, 5)
    assert shp == (2048, 2048)


def test_bounds_to_ranges_tile_aligned():
    b = Bounds(-180, 45, -135, 90)
    px = GEO.pixel_x_size(5)
    # tile (5, row=1, col=2) relative to snapped origin (-180, top=90)
    tb = GEO.tile_bounds(5, 1, 2)
    minrow, maxrow, mincol, maxcol = bounds_to_ranges(
        tuple(tb), b.left, b.top, px, px
    )
    assert (minrow, maxrow, mincol, maxcol) == (256, 512, 512, 768)


def test_zarr_chunk_from_xy_centroids():
    # every tile centroid in the 8x8 snapped region must map to its own chunk
    b = Bounds(-180, 45, -135, 90)
    shp = output_shape(b, GEO, 5)
    rows, cols = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    tb = GEO.tile_bounds(5, rows.ravel() + 0, cols.ravel() + 0)
    # centroid of global tile (row r, col c) where region origin is row 0, col 0
    cx = (np.asarray(tb.left) + np.asarray(tb.right)) / 2
    cy = (np.asarray(tb.top) + np.asarray(tb.bottom)) / 2
    crow, ccol = zarr_chunk_from_xy(cx, cy, b, shp, 256, 1)
    np.testing.assert_array_equal(crow, rows.ravel())
    np.testing.assert_array_equal(ccol, cols.ravel())


def test_tile_id_roundtrip():
    zoom = np.array([5, 12, 28])
    row = np.array([7, 4095, 2**28 - 1])
    col = np.array([34, 8191, 2**29 - 1])
    z, r, c = unpack_tile_id(pack_tile_id(zoom, row, col))
    np.testing.assert_array_equal(z, zoom)
    np.testing.assert_array_equal(r, row)
    np.testing.assert_array_equal(c, col)


def test_cell_roundtrip():
    rng = np.random.default_rng(42)
    zoom = 15
    row = rng.integers(0, 2**zoom, 1000)
    col = rng.integers(0, 2**(zoom + 1), 1000)
    r, c, z = cell_decode(cell_encode(row, col, zoom))
    np.testing.assert_array_equal(r, row)
    np.testing.assert_array_equal(c, col)
    assert (z == zoom).all()


def test_cell_parent_matches_tile_parent():
    rng = np.random.default_rng(7)
    zoom = 10
    row = rng.integers(0, 2**zoom, 500)
    col = rng.integers(0, 2**(zoom + 1), 500)
    parents = cell_parent(cell_encode(row, col, zoom))
    r, c, z = cell_decode(parents)
    np.testing.assert_array_equal(r, row >> 1)
    np.testing.assert_array_equal(c, col >> 1)
    assert (z == zoom - 1).all()
    # two levels at once
    r2, c2, z2 = cell_decode(cell_parent(cell_encode(row, col, zoom), steps=2))
    np.testing.assert_array_equal(r2, row >> 2)
    assert (z2 == zoom - 2).all()


def test_cell_prefix_is_spatial():
    # all 4 children of a cell share the parent's morton prefix
    zoom = 8
    parent_row, parent_col = 13, 57
    children_rows = np.array([2 * parent_row, 2 * parent_row, 2 * parent_row + 1, 2 * parent_row + 1])
    children_cols = np.array([2 * parent_col, 2 * parent_col + 1, 2 * parent_col, 2 * parent_col + 1])
    kids = cell_encode(children_rows, children_cols, zoom + 1)
    parents = cell_parent(kids)
    expected = cell_encode(np.array([parent_row]), np.array([parent_col]), zoom)
    assert (parents == expected[0]).all()


def test_k_ring_interior():
    zoom = 5
    center = cell_encode(np.array([7]), np.array([34]), zoom)
    ring, owner = k_ring(center, k=1)
    assert len(ring) == 9
    assert (owner == 0).all()
    r, c, _ = cell_decode(ring)
    assert set(zip(r.tolist(), c.tolist())) == {
        (rr, cc) for rr in (6, 7, 8) for cc in (33, 34, 35)
    }


def test_k_ring_antimeridian_wrap_and_pole_clamp():
    zoom = 3  # 8 rows x 16 cols
    # top-left corner cell: rows above 0 dropped, col wraps to 15
    corner = cell_encode(np.array([0]), np.array([0]), zoom)
    ring, _ = k_ring(corner, k=1)
    r, c, _ = cell_decode(ring)
    got = set(zip(r.tolist(), c.tolist()))
    assert got == {(rr, cc) for rr in (0, 1) for cc in (15, 0, 1)}


def test_mercator_grid():
    merc = TilePyramid("mercator")
    assert (merc.matrix_height(3), merc.matrix_width(3)) == (8, 8)
    row, col = merc.point_to_tile(np.array([0.0]), np.array([0.0]), 1)
    assert (row[0], col[0]) == (1, 1)


def test_metatiling_chunk_math():
    p2 = TilePyramid("geodetic", metatiling=2)
    # chunk size = tile_size * metatiling (reference _output.py:270)
    assert p2.tile_size * p2.metatiling == 512
    assert (p2.matrix_height(5), p2.matrix_width(5)) == (16, 32)
    assert p2.tile_x_size(5) == 11.25


def test_invalid_grid():
    with pytest.raises(ValueError):
        TilePyramid("utm")


def test_k_ring_rejects_mixed_zoom():
    cells = np.concatenate([cell_encode(np.array([0]), np.array([0]), 5),
                            cell_encode(np.array([0]), np.array([0]), 3)])
    with pytest.raises(ValueError, match="same zoom"):
        k_ring(cells, k=1)


def test_reproject_bounds_roundtrip_and_known_points():
    """Cross-grid footprint transform (reference InputData.bbox(out_crs),
    _input.py:85-104): spherical-mercator forward/inverse agree, known
    anchor points land exactly, and out-of-band latitudes clamp."""
    import numpy as np

    from mapchete_xarray_ray.grid import (
        MERC_LAT_MAX,
        MERC_R,
        Bounds,
        geodetic_to_mercator_xy,
        mercator_to_geodetic_xy,
        reproject_bounds,
    )

    # anchors: origin and the mercator-square corners
    x, y = geodetic_to_mercator_xy([0.0, 180.0], [0.0, MERC_LAT_MAX])
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    assert abs(x[1] - MERC_R) < 1e-6 and abs(y[1] - MERC_R) < 1e-6

    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-85, 85, 200)
    lon2, lat2 = mercator_to_geodetic_xy(*geodetic_to_mercator_xy(lon, lat))
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)

    # whole geodetic world -> the full mercator square (poles clamp)
    b = reproject_bounds(Bounds(-180, -90, 180, 90), "geodetic", "mercator")
    np.testing.assert_allclose(list(b), [-MERC_R, -MERC_R, MERC_R, MERC_R],
                               atol=1e-6)
    # and back: the square covers the clamped latitude band
    g = reproject_bounds(b, "mercator", "geodetic")
    np.testing.assert_allclose(list(g), [-180, -MERC_LAT_MAX, 180,
                                         MERC_LAT_MAX], atol=1e-9)
    # same-grid passthrough
    same = reproject_bounds(Bounds(1, 2, 3, 4), "geodetic", "geodetic")
    assert list(same) == [1.0, 2.0, 3.0, 4.0]


def test_archive_bbox_out_grid_prunes_mercator_job(tmp_path):
    """A geodetic archive's footprint expressed in mercator prunes a
    mercator job's tile list (footprint-only cross-CRS; data reads
    across grids stay forbidden)."""
    from mapchete_xarray_ray.grid import Bounds
    from mapchete_xarray_ray.sources.zarr_input import prune_tiles
    from mapchete_xarray_ray.spec import JobSpec

    src = JobSpec(path=str(tmp_path / "a.zarr"), zoom=5,
                  bounds=(0.0, 40.0, 45.0, 70.0), grid="geodetic",
                  band_names=["count"], dtype="uint16")
    from mapchete_xarray_ray.sources.zarr_input import archive_bbox

    fp = archive_bbox(src, out_grid="mercator")
    assert fp.left == 0.0 and fp.right > 4e6  # 45 deg ~ 5.009e6 m
    job = JobSpec(path=str(tmp_path / "b.zarr"), zoom=3,
                  bounds=(-20037508.342789244, -20037508.342789244,
                          20037508.342789244, 20037508.342789244),
                  grid="mercator", band_names=["count"], dtype="uint16")
    r0, r1, c0, c1 = job.tile_range()
    tiles = [(r, c) for r in range(r0, r1 + 1) for c in range(c0, c1 + 1)]
    kept = prune_tiles(tiles, job, fp)
    assert 0 < len(kept) < len(tiles)
    # every kept tile really intersects; every dropped tile doesn't
    for r, c in tiles:
        tb = job.pyramid.tile_bounds(job.zoom, r, c)
        inter = Bounds(*[float(v) for v in tb]).intersects(fp)
        assert inter == ((r, c) in kept)

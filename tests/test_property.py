"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapchete_xarray_ray.grid import (
    Bounds,
    TilePyramid,
    cell_decode,
    cell_encode,
    cell_parent,
    output_shape,
    pack_tile_id,
    unpack_tile_id,
    zarr_chunk_from_xy,
)
from mapchete_xarray_ray.functions.extract import extract_text
from mapchete_xarray_ray.oracle import point_in_ring

GEO = TilePyramid("geodetic")


@given(zoom=st.integers(0, 15),
       lon=st.floats(-180, 179.999, allow_nan=False),
       lat=st.floats(-89.999, 90, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_point_to_tile_in_range_and_contains(zoom, lon, lat):
    row, col = GEO.point_to_tile(np.array([lon]), np.array([lat]), zoom)
    assert 0 <= row[0] < GEO.matrix_height(zoom)
    assert 0 <= col[0] < GEO.matrix_width(zoom)
    tb = GEO.tile_bounds(zoom, int(row[0]), int(col[0]))
    # the point lies inside its tile up to float64 boundary quantization
    # (a point within ~1 ULP of a tile edge rounds across it — the
    # reference's own float division has the same property)
    tol = 1e-9
    assert tb.left - tol <= lon <= tb.right + tol
    assert tb.bottom - tol <= lat <= tb.top + tol


@given(zoom=st.integers(1, 10))
@settings(max_examples=30, deadline=None)
def test_snap_bounds_idempotent_and_covering(zoom):
    raw = (-171.3, 12.7, -100.1, 55.9)
    snapped = GEO.snap_bounds(raw, zoom)
    assert snapped.left <= raw[0] and snapped.right >= raw[2]
    assert snapped.bottom <= raw[1] and snapped.top >= raw[3]
    again = GEO.snap_bounds(tuple(snapped), zoom)
    assert tuple(again) == tuple(snapped)


@given(zoom=st.integers(0, 26),
       data=st.data())
@settings(max_examples=200, deadline=None)
def test_morton_roundtrip_and_parent(zoom, data):
    row = data.draw(st.integers(0, 2**zoom - 1))
    col = data.draw(st.integers(0, 2**(zoom + 1) - 1))
    c = cell_encode(np.array([row]), np.array([col]), zoom)
    r2, c2, z2 = cell_decode(c)
    assert (r2[0], c2[0], z2[0]) == (row, col, zoom)
    if zoom > 0:
        pr, pc_, pz = cell_decode(cell_parent(c))
        assert (pr[0], pc_[0], pz[0]) == (row >> 1, col >> 1, zoom - 1)


@given(zoom=st.integers(0, 28), data=st.data())
@settings(max_examples=200, deadline=None)
def test_tile_id_pack_roundtrip(zoom, data):
    row = data.draw(st.integers(0, 2**min(zoom, 28) - 1 if zoom else 0))
    col = data.draw(st.integers(0, 2**min(zoom + 1, 29) - 1))
    z, r, c = unpack_tile_id(pack_tile_id(zoom, row, col))
    assert (int(z), int(r), int(c)) == (zoom, row, col)


@given(st.integers(0, 7), st.integers(0, 7))
@settings(max_examples=64, deadline=None)
def test_chunk_assignment_matches_tile_for_interior_points(trow, tcol):
    """Reference-exact chunk math == canonical tile math for interior
    points of every tile of the snapped 3-D fixture region."""
    b = Bounds(-180, 45, -135, 90)
    shp = output_shape(b, GEO, 5)
    tb = GEO.tile_bounds(5, trow, tcol)
    x = (float(tb.left) + float(tb.right)) / 2 + 0.31
    y = (float(tb.top) + float(tb.bottom)) / 2 - 0.17
    crow, ccol = zarr_chunk_from_xy(np.array([x]), np.array([y]), b, shp, 256, 1)
    prow, pcol = GEO.point_to_tile(np.array([x]), np.array([y]), 5)
    assert (crow[0], ccol[0]) == (prow[0], pcol[0])


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_extract_deterministic_and_clean(text):
    html = f"<html><body><p>{text}</p></body></html>"
    out1 = extract_text(html.encode("utf-8", errors="ignore"))
    out2 = extract_text(html.encode("utf-8", errors="ignore"))
    assert out1 == out2
    assert "<p>" not in out1


@given(st.floats(-10, 10), st.floats(-10, 10))
@settings(max_examples=200, deadline=None)
def test_pip_square(x, y):
    ring = [(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0), (-5.0, -5.0)]
    inside = point_in_ring(x, y, ring)
    want = (-5 <= x <= 5) and (-5 <= y <= 5)
    assert inside == want

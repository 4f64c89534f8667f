"""User-extension surface (§2.10): custom per-tile process functions."""

import numpy as np
import pyarrow as pa
import pytest
import ray
from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.fixtures import make_pages
from mapchete_xarray_ray.pipelines.flagship import (
    default_spec,
    output_cleaned,
    run_pipeline,
)
from mapchete_xarray_ray.processes.convert import convert_to_tensor, hillshade_like
from mapchete_xarray_ray.sinks.zarr import ZarrTileStore


def _collect(ds) -> pa.Table:
    tabs = [t for t in (ray.get(r) for r in arrow_block_refs(ds))
            if t.num_columns > 0]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def test_bundled_process_equals_default(tmp_path):
    """convert_to_tensor IS the default process: same archives."""
    pages = make_pages(n=400)
    spec_a = default_spec(str(tmp_path / "a.zarr"))
    spec_b = default_spec(str(tmp_path / "b.zarr"))
    _collect(run_pipeline(ray.data.from_arrow(pages), spec_a))
    _collect(run_pipeline(ray.data.from_arrow(pages), spec_b,
                          process_fn=convert_to_tensor))
    sa, sb = ZarrTileStore(spec_a), ZarrTileStore(spec_b)
    assert sa.existing_tiles() == sb.existing_tiles()
    for r, c in sa.existing_tiles():
        np.testing.assert_array_equal(sa.read_tile(r, c), sb.read_tile(r, c))


def test_single_band_process_and_empty(tmp_path):
    """A (h, w) return is promoted to one band; 'empty' skips tiles."""
    pages = make_pages(n=300)
    spec = default_spec(str(tmp_path / "h.zarr"), band_names=["density"])

    def sparse_process(tile, pages_tbl, spec_):
        if pages_tbl.num_rows < 5:
            return "empty"
        return hillshade_like(tile, pages_tbl, spec_)

    out = _collect(run_pipeline(ray.data.from_arrow(pages), spec,
                                process_fn=sparse_process))
    store = ZarrTileStore(spec)
    written = store.existing_tiles()
    assert 0 < len(written)
    assert out.num_rows == len(written)
    # skipped tiles read back as fill (reference test_driver.py:39-46)
    all_tiles = {(r, c) for r in range(8) for c in range(8)}
    skipped = all_tiles - written
    if skipped:
        r, c = next(iter(skipped))
        assert (store.read_tile(r, c) == spec.nodata).all()


def test_output_cleaned_validation(tmp_path):
    spec = default_spec(str(tmp_path / "v.zarr"))
    with pytest.raises(TypeError, match="process output"):
        output_cleaned([[1, 2]], spec)
    with pytest.raises(ValueError, match="bands"):
        output_cleaned(np.zeros((2, 256, 256)), spec)  # spec has 3 bands
    t = output_cleaned(np.zeros((256, 256)), spec.__class__(
        path=str(tmp_path / "w.zarr"), zoom=5, bounds=tuple(spec.bounds),
        band_names=["one"]))
    assert t.shape == (1, 256, 256)


def test_4d_numpy_process_output(tmp_path):
    """Reference M3 semantics: 4-D (time, bands, h, w) process output is
    validated and transposed to band-first; wrong cardinality raises."""
    pages = make_pages(n=200)
    time_cfg = {"start": "2022-06-01", "end": "2022-06-11",
                "steps": ["2022-06-01", "2022-06-04", "2022-06-06",
                          "2022-06-09", "2022-06-11"]}
    spec = default_spec(str(tmp_path / "t4.zarr"), time=time_cfg)

    def process_4d(tile, pages_tbl, spec_):
        n = len(spec_.timestamps)
        data = np.zeros((n, 3, 256, 256), dtype=np.uint16)
        data[:, 0] = tile.row  # slice constant per band
        return data

    out = _collect(run_pipeline(ray.data.from_arrow(pages), spec,
                                process_fn=process_4d))
    assert out.num_rows > 0
    store = ZarrTileStore(spec)
    r, c = next(iter(store.existing_tiles()))
    data = store.read_tile(r, c)
    assert data.shape == (3, 5, 256, 256)
    assert (data[0] == r).all()

    # wrong time cardinality raises
    with pytest.raises(ValueError, match="time axis"):
        output_cleaned(np.zeros((3, 3, 256, 256)), spec)
    # 4-D without a time axis raises
    with pytest.raises(ValueError, match="requires a time axis"):
        output_cleaned(np.zeros((5, 3, 256, 256)),
                       default_spec(str(tmp_path / "no_t.zarr")))


def test_dict_of_bands_process_output(tmp_path):
    """Dataset-shaped (dict) returns: named bands + reserved-attrs
    stripping (reference _output.py:455-492 Dataset branch)."""
    spec = default_spec(str(tmp_path / "d.zarr"))
    h = w = spec.chunk_px
    arrs = {name: np.full((h, w), i + 1, dtype=spec.dtype)
            for i, name in enumerate(spec.band_names)}
    cleaned = output_cleaned(
        dict(arrs, attrs={"json": "{}"}, mapchete={"x": 1},
             AREA_OR_POINT="Area"), spec)
    assert cleaned.shape == (len(spec.band_names), h, w)
    for i in range(len(spec.band_names)):
        assert (cleaned[i] == i + 1).all()
    # wrong band names -> archive-fit error
    with pytest.raises(ValueError, match="band names"):
        output_cleaned({"nope": arrs[spec.band_names[0]]}, spec)


def test_dict_of_bands_pipeline_and_index_hook(tmp_path):
    """make_convert_process: named-band dict returns flow through the
    pipeline; index features map slice ids to index values (reference
    processes/convert_to_xarray.py:26-33); guards match the reference."""
    from mapchete_xarray_ray.processes.convert import (
        index_feature_attrs,
        make_convert_process,
    )

    features = [{"properties": {"slice_id": "s1", "index": "granule-A"}},
                {"properties": {"slice_id": "s2", "index": "granule-B"}}]
    assert index_feature_attrs(features) == {"s1": "granule-A",
                                             "s2": "granule-B"}
    with pytest.raises(ValueError, match="index_band"):
        make_convert_process(index=features)

    pages = make_pages(n=300)
    spec_a = default_spec(str(tmp_path / "a.zarr"))
    spec_b = default_spec(str(tmp_path / "b.zarr"))
    _collect(run_pipeline(ray.data.from_arrow(pages), spec_a))
    proc = make_convert_process(band_names=list(spec_b.band_names),
                                index=features, index_band=0)
    _collect(run_pipeline(ray.data.from_arrow(pages), spec_b,
                          process_fn=proc))
    sa, sb = ZarrTileStore(spec_a), ZarrTileStore(spec_b)
    assert sa.existing_tiles() == sb.existing_tiles()
    for r, c in sa.existing_tiles():
        np.testing.assert_array_equal(sa.read_tile(r, c), sb.read_tile(r, c))


class _FakeDataArray:
    """Duck-typed stand-in for xr.DataArray (xarray isn't installed;
    real DataArrays expose the same .dims/.values surface)."""

    def __init__(self, values, dims):
        self.values = np.asarray(values)
        self.dims = dims
        self.attrs = {"some": "metadata"}


class _FakeDataset:
    """Duck-typed stand-in for xr.Dataset: .data_vars mapping."""

    def __init__(self, data_vars):
        self.data_vars = data_vars
        self.attrs = {"mapchete": "stale", "_FillValue": 0}


def test_xarray_dataset_return_duck_typed(tmp_path):
    """A process returning an xr.Dataset lookalike (reference
    _output.py:455-492) normalizes exactly like the equivalent
    dict-of-bands return; stale attrs are ignored."""
    spec = default_spec(str(tmp_path / "x.zarr"),
                        band_names=["count", "count_en"])
    a = np.arange(spec.chunk_px * spec.chunk_px, dtype=np.uint16).reshape(
        spec.chunk_px, spec.chunk_px) % 7
    b = (a * 3) % 11
    ds = _FakeDataset({"count": _FakeDataArray(a, ("Y", "X")),
                       "count_en": _FakeDataArray(b, ("Y", "X"))})
    got = output_cleaned(ds, spec)
    want = output_cleaned({"count": a, "count_en": b}, spec)
    np.testing.assert_array_equal(got, want)
    # band-name mismatch still fails loud through the dict path
    bad = _FakeDataset({"wrong": _FakeDataArray(a, ("Y", "X"))})
    with pytest.raises(ValueError, match="do not match archive"):
        output_cleaned(bad, spec)


def test_xarray_dataarray_return_duck_typed(tmp_path):
    """An xr.DataArray lookalike routes through the ndarray path:
    (h, w) promotes to one band, (bands, h, w) passes through."""
    spec = default_spec(str(tmp_path / "y.zarr"), band_names=["density"])
    a = (np.arange(spec.chunk_px * spec.chunk_px, dtype=np.uint16)
         .reshape(spec.chunk_px, spec.chunk_px) % 13)
    got = output_cleaned(_FakeDataArray(a, ("Y", "X")), spec)
    np.testing.assert_array_equal(got, output_cleaned(a, spec))
    got3 = output_cleaned(_FakeDataArray(a[None], ("band", "Y", "X")), spec)
    np.testing.assert_array_equal(got3, output_cleaned(a[None], spec))

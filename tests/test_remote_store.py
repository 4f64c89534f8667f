"""S9 — remote-storage path of the tile store, exercised against the
fsspec memory:// filesystem (no network; same code path an s3:// URI
takes: every byte goes through the _put_bytes/_get_bytes/_listdir
seam)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.fixtures import make_pages
from mapchete_xarray_ray.pipelines.flagship import default_spec, run_pipeline
from mapchete_xarray_ray.sinks.zarr import ZarrTileStore, _rmtree
from mapchete_xarray_ray.sources.zarr_input import spec_from_archive
from mapchete_xarray_ray.state.lineage import read_records


def _collect(ds) -> pa.Table:
    tabs = [t for t in (ray.get(r) for r in arrow_block_refs(ds))
            if t.num_columns > 0]
    return pa.concat_tables(tabs) if tabs else pa.table({})


@pytest.mark.parametrize("path", [
    "memory://remote_arch.zarr",
    "file:///tmp/mxr_remote_arch.zarr",
])
def test_store_roundtrip_on_fsspec_backends(path):
    """The \"://\" routing is backend-generic, not memory://-specific:
    the same seam drives a second offline fsspec filesystem (file://,
    fsspec's LocalFileSystem — NOT the plain-path branch)."""
    _rmtree(path)
    spec = default_spec(path, dtype="uint16")
    store = ZarrTileStore(spec)
    store.prepare()
    rng = np.random.default_rng(5)
    data = rng.integers(0, 900, (3, 256, 256), dtype=np.uint16)
    assert store.write_tile(1, 2, data) == 3
    np.testing.assert_array_equal(store.read_tile(1, 2), data)
    assert store.tile_exists(1, 2)
    assert not store.tile_exists(0, 0)
    assert (1, 2) in store.existing_tiles()
    # metadata round-trips through the memory fs
    spec2 = spec_from_archive(path)
    assert spec2.band_names == spec.band_names
    # prepare() on existing remote archive validates compat
    ZarrTileStore(default_spec(path, dtype="uint16")).prepare()
    with pytest.raises(ValueError, match="incompatible"):
        ZarrTileStore(default_spec(path, dtype="uint8")).prepare()
    _rmtree(path)


def test_lineage_on_memory_fs():
    """NOTE: the memory filesystem is PER-PROCESS, so this exercises the
    driver-side lineage path only (Ray workers would each see their own
    memory fs; a real s3:// URI is shared). The flagship e2e therefore
    stays on local paths; here we drive the store API directly."""
    path = "memory://remote_lin.zarr"
    _rmtree(path)
    spec = default_spec(path, dtype="uint16")
    store = ZarrTileStore(spec)
    store.prepare()
    from mapchete_xarray_ray.state.lineage import write_record

    store.write_tile(3, 4, np.ones((3, 256, 256), dtype=np.uint16))
    write_record(path, {"tile_id": 1, "zoom": 5, "tile_row": 3, "tile_col": 4,
                        "rows_in": 10, "chunks_written": 3, "checksum": 1})
    recs = read_records(path)
    assert (5, 3, 4) in recs
    from mapchete_xarray_ray.state.lineage import completed_tiles

    assert len(completed_tiles(store)) == 1
    _rmtree(path)


@pytest.mark.parametrize("path", [
    "memory://remote_torn.zarr",
    "file:///tmp/mxr_remote_torn.zarr",
])
def test_stale_tmp_siblings_are_invisible(path):
    """Atomic-write contract on the fsspec seam: _put_bytes stages into
    a ``.tmp-`` sibling and renames, so (a) a successful write leaves no
    ``.tmp-`` garbage, and (b) garbage left by a task KILLED mid-write
    (Ray probe cancellation, preemption, OOM) is ignored by every
    archive consumer — _listdir, existing_tiles, lineage — instead of
    being parsed as a torn chunk/JSON."""
    from mapchete_xarray_ray.sinks.zarr import _fs, _listdir, _put_bytes

    _rmtree(path)
    spec = default_spec(path, dtype="uint16")
    store = ZarrTileStore(spec)
    store.prepare()
    store.write_tile(1, 2, np.ones((3, 256, 256), dtype=np.uint16))
    fs = _fs(path)
    band_dir = f"{path}/count"
    # (a) no .tmp- residue after clean writes anywhere in the archive
    assert not [p for p in fs.find(path) if ".tmp-" in p]
    # (b) plant kill-mid-write garbage next to good objects (fsspec
    # filesystems strip the scheme on entry, so full URLs are fine)
    with fs.open(f"{band_dir}/0.2.1.tmp-999-dead", "wb") as f:
        f.write(b"\x00trunc")
    with fs.open(f"{path}/.zmetadata.tmp-999-dead", "wb") as f:
        f.write(b"{ tor")
    assert not [n for n in _listdir(band_dir) if ".tmp-" in n]
    assert store.existing_tiles() == {(1, 2)}
    np.testing.assert_array_equal(
        store.read_tile(1, 2),
        np.ones((3, 256, 256), dtype=np.uint16))
    # metadata consumers still parse the archive (torn .zmetadata
    # sibling is never read)
    assert spec_from_archive(path).dtype == "uint16"
    # a failed rename never leaves the target torn: _put_bytes onto an
    # existing object either fully replaces it or leaves the old bytes
    _put_bytes(f"{path}/probe.json", b'{"v": 1}')
    _put_bytes(f"{path}/probe.json", b'{"v": 2}')
    with fs.open(f"{path}/probe.json", "rb") as f:
        assert f.read() == b'{"v": 2}'
    _rmtree(path)


def test_flagship_e2e_on_file_uri():
    """Distributed write through the fsspec seam: unlike memory://
    (per-process), file:// is shared across Ray workers, so the whole
    flagship pipeline can run against a URI-addressed archive — the
    closest offline stand-in for the reference's live-S3 driver test
    (reference tests/test_driver.py:74-96)."""
    path = "file:///tmp/mxr_remote_flagship.zarr"
    _rmtree(path)
    pages = make_pages(n=200)
    spec = default_spec(path)
    out = _collect(run_pipeline(ray.data.from_arrow(pages), spec))
    assert out.num_rows > 0
    # read back through the same URI: totals match the page count
    rspec = spec_from_archive(path)
    store = ZarrTileStore(rspec)
    total = sum(int(store.read_tile(r, c, bands=["count"]).sum())
                for r, c in store.existing_tiles())
    assert total == 200
    assert len(read_records(path)) == out.num_rows
    _rmtree(path)

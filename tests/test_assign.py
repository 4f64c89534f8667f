"""Tile-assignment stage vs sequential oracle (row-exact)."""

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.fixtures import DEFAULT_BOUNDS, DEFAULT_ZOOM, make_pages
from mapchete_xarray_ray.oracle import oracle_tile_assign
from mapchete_xarray_ray.stages.assign import assign_doc_ids_fn, assign_pages_fn


def _sorted_rows(t: pa.Table, keys):
    return t.sort_by([(k, "ascending") for k in keys]).to_pydict()


def test_assign_pages_matches_oracle():
    pages = make_pages(n=400)
    ds = ray.data.from_arrow(pages).map_batches(
        assign_pages_fn(DEFAULT_BOUNDS, DEFAULT_ZOOM),
        batch_format="pyarrow",
    )
    got = arrow_block_refs(ds)
    got = pa.concat_tables([ray.get(r) for r in got]).select(
        ["url", "tile_row", "tile_col", "tile_id", "cell_id"]
    )
    want = oracle_tile_assign(pages, DEFAULT_BOUNDS, DEFAULT_ZOOM).select(
        ["url", "tile_row", "tile_col", "tile_id", "cell_id"]
    )
    assert _sorted_rows(got, ["url", "tile_id"]) == _sorted_rows(want, ["url", "tile_id"])


def test_assign_stays_in_snapped_bounds():
    pages = make_pages(n=300)
    out = oracle_tile_assign(pages, DEFAULT_BOUNDS, DEFAULT_ZOOM)
    # bounds [-180,45,-135,90] @ z5 → rows 0..7, cols 0..7
    assert out.column("tile_row").to_numpy().max() <= 7
    assert out.column("tile_col").to_numpy().max() <= 7
    assert out.column("tile_row").to_numpy().min() >= 0


def test_assign_doc_ids_matches_duckdb():
    import duckdb

    doc_id = np.arange(1, 2001, dtype=np.int64)
    batch = pa.table({"doc_id": pa.array(doc_id)})
    got = assign_doc_ids_fn(zoom=5)(batch)
    want = duckdb.sql(
        """
        SELECT doc_id,
               (doc_id * 2654435761) % 16384 AS px,
               (doc_id * 40503) % 8192 AS py,
               ((doc_id * 40503) % 8192) // 256 AS tile_row,
               ((doc_id * 2654435761) % 16384) // 256 AS tile_col,
               (5::BIGINT << 58)
                 | ((((doc_id * 40503) % 8192) // 256)::BIGINT << 29)
                 | (((doc_id * 2654435761) % 16384) // 256) AS tile_id
        FROM batch ORDER BY doc_id
        """
    ).arrow()
    for col in ["px", "py", "tile_row", "tile_col", "tile_id"]:
        np.testing.assert_array_equal(
            got.column(col).to_numpy(), want.column(col).to_numpy(), err_msg=col
        )

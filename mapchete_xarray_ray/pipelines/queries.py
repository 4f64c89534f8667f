"""Driver-facing query registry: Ray pipeline + DuckDB oracle SQL pairs.

Each entry is ``name -> (callable(sf_dir) -> Dataset/Table, sql | None)``.
The callables run over the driver-provided parquet tables (TESTDATA.md);
column names are identical between the Ray result and the SQL so the
driver's order-insensitive value-hash comparison passes.

Conventions:
- reads prune columns at the source (``read_parquet(columns=[...])``);
- transforms are vectorized ``map_batches(batch_format="pyarrow")``;
- aggregations pre-combine inside map_batches where the key space is
  large, then do a small ``groupby``;
- nothing materializes the full dataset on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.stages.assign import assign_doc_ids_fn

ZOOM = 5  # documents-query zoom: 32x64 tiles, 8192x16384 global pixels

# --- SQL fragments shared by several oracle queries ----------------------

_ASSIGN_SQL_COLS = """
  (doc_id * 2654435761) % 16384 AS px,
  (doc_id * 40503) % 8192 AS py,
  ((doc_id * 40503) % 8192) // 256 AS tile_row,
  ((doc_id * 2654435761) % 16384) // 256 AS tile_col,
  (5::BIGINT << 58)
    | ((((doc_id * 40503) % 8192) // 256)::BIGINT << 29)
    | (((doc_id * 2654435761) % 16384) // 256) AS tile_id
"""


def _morton_sql(row_expr: str, col_expr: str, zoom: int = ZOOM) -> str:
    """SQL expression for cell_id = morton(row, col) << 5 | zoom.

    col carries zoom+1 bits (geodetic east/west bit), row carries zoom.
    Mirrors grid.cell_encode exactly.
    """
    terms = []
    for i in range(zoom + 1):
        terms.append(f"((({col_expr}) >> {i}) & 1)::BIGINT << {2 * i}")
        if i < zoom:
            terms.append(f"((({row_expr}) >> {i}) & 1)::BIGINT << {2 * i + 1}")
    morton = " | ".join(f"({t})" for t in terms)
    return f"((({morton}) << 5) | {zoom})"


_CELL_SQL = _morton_sql("((doc_id * 40503) % 8192) // 256",
                        "((doc_id * 2654435761) % 16384) // 256")


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --- queries -------------------------------------------------------------


def q_tile_assign(sf_dir: str):
    """Per-document deterministic tile + cell assignment (M5/J1)."""
    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(assign_doc_ids_fn(ZOOM), batch_format="pyarrow")
        .select_columns(["doc_id", "px", "py", "tile_row", "tile_col", "tile_id", "cell_id"])
    )


SQL_TILE_ASSIGN = f"""
SELECT doc_id, {_ASSIGN_SQL_COLS}, {_CELL_SQL} AS cell_id
FROM documents
"""


def q_tile_density(sf_dir: str):
    """Per-tile aggregation (A4/A5): doc count + char sum per tile.

    Partial aggregation happens inside map_batches (one partial row per
    tile per batch) so the groupby shuffle moves O(tiles), not O(docs) —
    the pattern that keeps this working at 100 TB.
    """
    def partial(batch: pa.Table) -> pa.Table:
        batch = assign_doc_ids_fn(ZOOM)(batch)
        t = batch.group_by("tile_id").aggregate(
            [("doc_id", "count"), ("n_chars", "sum")]
        )
        return t.rename_columns(["tile_id", "n_docs", "sum_chars"])

    ds = (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tile_id")
        .sum(["n_docs", "sum_chars"])
    )
    return ds.rename_columns({"sum(n_docs)": "n_docs", "sum(sum_chars)": "sum_chars"})


SQL_TILE_DENSITY = """
SELECT tile_id, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM (
  SELECT n_chars,
    (5::BIGINT << 58)
      | ((((doc_id * 40503) % 8192) // 256)::BIGINT << 29)
      | (((doc_id * 2654435761) % 16384) // 256) AS tile_id
  FROM documents
)
GROUP BY tile_id
"""


def q_cell_parent_rollup(sf_dir: str):
    """Hierarchical cell rollup: doc counts at cell zoom 5 rolled up to
    parent zoom 3 by right-shifting the Morton prefix (S2-style)."""
    from mapchete_xarray_ray.grid import cell_parent

    def partial(batch: pa.Table) -> pa.Table:
        batch = assign_doc_ids_fn(ZOOM)(batch)
        cells = batch.column("cell_id").to_numpy().astype(np.uint64)
        parents = cell_parent(cells, steps=2).astype(np.int64)
        t = pa.table({"cell3": pa.array(parents)})
        return t.group_by("cell3").aggregate([("cell3", "count")]).rename_columns(
            ["cell3", "n_docs"])

    ds = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell3")
        .sum("n_docs")
    )
    return ds.rename_columns({"sum(n_docs)": "n_docs"})


_CELL3_SQL = _morton_sql("(((doc_id * 40503) % 8192) // 256) >> 2",
                         "(((doc_id * 2654435761) % 16384) // 256) >> 2", zoom=3)

SQL_CELL_PARENT_ROLLUP = f"""
SELECT {_CELL3_SQL} AS cell3, count(*)::BIGINT AS n_docs
FROM documents
GROUP BY cell3
"""


# --- registry ------------------------------------------------------------

REGISTRY: dict[str, tuple] = {
    "tile_assign": (q_tile_assign, SQL_TILE_ASSIGN),
    "tile_density": (q_tile_density, SQL_TILE_DENSITY),
    "cell_parent_rollup": (q_cell_parent_rollup, SQL_CELL_PARENT_ROLLUP),
}

"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in the library)
initialises or shuts down Ray.

- ``entry()`` — flagship pipeline on /root/testdata/sf0.001: synthesize
  the pages table (BASELINE.json input_hint shape), extract + assign +
  aggregate per tile, write the zarr-layout tile archive, return the
  per-tile summary Dataset.
- ``queries()`` / ``oracle_sql()`` — registry defined in
  mapchete_xarray_ray.pipelines.queries; every Ray pipeline has a
  DuckDB-oracle SQL twin with identical column names unless the op is
  not SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from mapchete_xarray_ray.pipelines.queries import REGISTRY


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from mapchete_xarray_ray.pipelines.flagship import run_flagship

    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}

"""Per-operator Ray Data stats for one registry query — the feedback
loop for "iterate until wall-time is dominated by useful compute".

Usage: python tools/profile_query.py <query> [sf_dir] [--cpus N]

Runs the query once (cold caches), consumes it streamingly, and prints
``Dataset.stats()`` — per-operator wall/CPU/rows/bytes, actor pool
sizing, and shuffle suboperator breakdowns. Queries that end in a
driver-side fold return a plain Arrow table; for those only total wall
time + row count print here, and the per-operator trees for the inner
Dataset stages are in the Ray Data logs the output points to.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(
        description="Per-operator Ray Data stats for one registry query")
    p.add_argument("query")
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    p.add_argument("--cpus", type=int, default=32)
    ns = p.parse_args()
    name, sf_dir, cpus = ns.query, ns.sf_dir, ns.cpus

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from mapchete_xarray_ray.pipelines.queries import (
        REGISTRY,
        clear_query_caches,
    )

    if name not in REGISTRY:
        print(f"unknown query {name!r}; known: {', '.join(REGISTRY)}")
        return 2
    clear_query_caches()
    # use the unwrapped function: the registry wrapper collects the
    # Dataset into an Arrow table, which would hide Dataset.stats()
    fn = getattr(REGISTRY[name][0], "__wrapped__", REGISTRY[name][0])
    t0 = time.perf_counter()
    res = fn(sf_dir)
    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=8192, batch_format="pyarrow"):
            n += b.num_rows
        dt = time.perf_counter() - t0
        print(res.stats())
        print(f"\n{name}: {dt:.2f}s total, {n} rows")
    else:
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.2f}s total, {res.num_rows} rows "
              f"(returns a driver-folded Arrow table; the inner Dataset "
              f"stages' stats are in /tmp/ray/session_latest/logs/ray-data)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

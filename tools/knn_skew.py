"""kNN planted-skew receipt (VERDICT r4 ask #7): wall time of the kNN
join over a UNIFORM point set vs the same set with 30% of points
planted into ONE cell, with and without the A5 hot-cell salting.

    python tools/knn_skew.py [n_points]     # default 400k

The receipt to record in BASELINE.md: under the planted hot cell the
salted plan's wall time stays within a small factor of the uniform
case (the hot cell's quadratic distance work is split across
ceil(hot/hot_cell_limit) parallel segment tasks), while the unsalted
plan pays the whole hot-cell matrix in one straggler task.

Points are synthesized deterministically (seeded rng) — no external
data. Output equality between the salted and unsalted plans is
asserted in tests/test_skew.py; this tool measures TIME only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SPAN, NCOLS, NROWS = 512.0, 16, 8
K = 8


def make_points(hot_frac: float) -> pa.Table:
    rng = np.random.default_rng(11)
    x = rng.uniform(0, NCOLS * SPAN, N)
    y = rng.uniform(0, NROWS * SPAN, N)
    hot = int(N * hot_frac)
    if hot:
        # plant into cell (3, 5)
        x[:hot] = rng.uniform(5 * SPAN, 6 * SPAN, hot)
        y[:hot] = rng.uniform(3 * SPAN, 4 * SPAN, hot)
    return pa.table({"id": pa.array(np.arange(N, dtype=np.int64)),
                     "x": pa.array(x), "y": pa.array(y)})


def run(tbl: pa.Table, hot_cell_limit: int) -> tuple[float, int]:
    import ray

    from mapchete_xarray_ray.stages.knn import knn_pipeline

    t0 = time.perf_counter()
    out = knn_pipeline(ray.data.from_arrow(tbl), k=K, cell_span=SPAN,
                       ncols=NCOLS, nrows=NROWS,
                       hot_cell_limit=hot_cell_limit)
    rows = 0
    for b in out.iter_batches(batch_size=65536, batch_format="pyarrow"):
        rows += b.num_rows
    return time.perf_counter() - t0, rows


def main():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    uniform = make_points(0.0)
    planted = make_points(0.3)
    # warm-up (code paths, worker pool), then timed runs
    run(uniform.slice(0, 20_000), hot_cell_limit=16_384)
    t_uniform, r_u = run(uniform, hot_cell_limit=16_384)
    t_salted, r_s = run(planted, hot_cell_limit=16_384)
    t_straggler, r_x = run(planted, hot_cell_limit=10 ** 9)
    print(json.dumps({
        "n_points": N, "k": K, "num_cpus": NUM_CPUS,
        "hot_frac": 0.3, "rows_out": [r_u, r_s, r_x],
        "uniform_sec": round(t_uniform, 1),
        "planted_salted_sec": round(t_salted, 1),
        "planted_unsalted_sec": round(t_straggler, 1),
        "salted_vs_uniform": round(t_salted / t_uniform, 2),
        "salting_speedup": round(t_straggler / t_salted, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Cross-pass keyed state: the actor-pool variant that outlives one
Dataset execution (continuous-ingest dedup)."""

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.stages.streaming import (
    dedup_across_passes,
    state_actor_pool,
)


def _collect(ds):
    tabs = [t for t in (ray.get(r) for r in ds.to_arrow_refs())
            if t.num_columns > 0]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def test_dedup_across_two_dataset_passes():
    """Ids seen in pass 1 are filtered from pass 2 — state held in the
    actor pool survives between Dataset executions, which the per-pass
    map_groups pattern cannot do."""
    actors = state_actor_pool(n_shards=4)
    try:
        t1 = pa.table({"event_id": pa.array(np.arange(0, 600), pa.int64()),
                       "v": pa.array(np.arange(600), pa.int64())})
        out1 = _collect(dedup_across_passes(
            ray.data.from_arrow(t1).repartition(4), actors))
        assert sorted(out1.column("event_id").to_pylist()) == list(range(600))

        # second PASS: overlap [300, 600) must be dropped, fresh
        # [600, 900) kept
        t2 = pa.table({"event_id": pa.array(np.arange(300, 900), pa.int64()),
                       "v": pa.array(np.arange(600), pa.int64())})
        out2 = _collect(dedup_across_passes(
            ray.data.from_arrow(t2).repartition(4), actors))
        assert sorted(out2.column("event_id").to_pylist()) == list(
            range(600, 900))
    finally:
        for a in actors:
            ray.kill(a)


def test_within_pass_duplicates_kept_once():
    actors = state_actor_pool(n_shards=2)
    try:
        ids = np.array([7, 7, 8, 7, 9, 8], dtype=np.int64)
        t = pa.table({"event_id": pa.array(ids, pa.int64())})
        out = _collect(dedup_across_passes(ray.data.from_arrow(t), actors))
        assert sorted(out.column("event_id").to_pylist()) == [7, 8, 9]
    finally:
        for a in actors:
            ray.kill(a)

"""Cross-pass keyed state: the actor-pool variant that outlives one
Dataset execution (continuous-ingest dedup)."""

import numpy as np
import pyarrow as pa
import ray
from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.stages.streaming import (
    dedup_across_passes,
    state_actor_pool,
)


def _collect(ds):
    tabs = [t for t in (ray.get(r) for r in arrow_block_refs(ds))
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


def test_horizon_bounded_shard_evicts_and_readmits():
    """A horizon-bounded shard suppresses repeats within the horizon,
    re-admits keys after it, and its seen-set stays bounded by the
    horizon window (the 100 TB continuous-ingest requirement)."""
    from mapchete_xarray_ray.stages.streaming import _StateShard

    H = 3_600_000_000  # 1 h
    sh = _StateShard(horizon_us=H)
    t0 = 1_000_000
    # pass 1: keys 1,2 at t0 -> both fresh
    assert sh.filter_unseen(np.array([1, 2]), np.array([t0, t0])).tolist() \
        == [True, True]
    # pass 2 (30 min later): 1 suppressed, 3 fresh
    t1 = t0 + H // 2
    assert sh.filter_unseen(np.array([1, 3]), np.array([t1, t1])).tolist() \
        == [False, True]
    # pass 3 (2 h after t1): everything re-emerges fresh; old entries
    # evicted (key 2 last seen at t0 is far outside the horizon)
    t2 = t1 + 2 * H
    assert sh.filter_unseen(np.array([1, 2, 3]),
                            np.array([t2, t2, t2])).tolist() \
        == [True, True, True]
    assert sh.seen_size() == 3  # only the keys inside the live window
    # suppression window REFRESHES on suppressed arrivals: key 1 at
    # t1 then again at t1+0.9H (0.9H gap) stays suppressed
    sh2 = _StateShard(horizon_us=H)
    sh2.filter_unseen(np.array([1]), np.array([t0]))
    assert sh2.filter_unseen(
        np.array([1]), np.array([t0 + int(0.9 * H)])).tolist() == [False]
    assert sh2.filter_unseen(
        np.array([1]), np.array([t0 + int(1.8 * H)])).tolist() == [False]
    # unbounded shard rejects missing timestamps only when horizoned
    import pytest as _pytest
    with _pytest.raises(ValueError, match="timestamps"):
        sh2.filter_unseen(np.array([5]))
    # out-of-order arrivals within the allowed lateness stay EXACT:
    # key 7 at t=70, watermark pushed to 180 by another key, then a
    # straggler 7 at t=150 (gap 80 <= horizon 100) must be suppressed —
    # eviction at watermark - horizon alone would have dropped the
    # entry and re-admitted the duplicate
    sh3 = _StateShard(horizon_us=100)
    assert sh3.filter_unseen(np.array([7, 9]),
                             np.array([70, 180])).tolist() == [True, True]
    assert sh3.filter_unseen(np.array([7]),
                             np.array([150])).tolist() == [False]


def test_horizon_dedup_across_passes_dataset():
    from mapchete_xarray_ray.stages.streaming import (
        dedup_across_passes,
        state_actor_pool,
    )

    H = 3_600_000_000
    actors = state_actor_pool(n_shards=2, horizon_us=H)
    t0 = 10_000_000

    def mk(ids, ts):
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
        }))

    def ids(ds):
        return sorted(_collect(ds).column("event_id").to_pylist())

    try:
        assert ids(dedup_across_passes(
            mk([1, 2, 3], [t0] * 3), actors, ts_col="ts")) == [1, 2, 3]
        assert ids(dedup_across_passes(
            mk([2, 4], [t0 + H // 2] * 2), actors, ts_col="ts")) == [4]
        assert ids(dedup_across_passes(
            mk([1, 2], [t0 + 3 * H] * 2), actors, ts_col="ts")) == [1, 2]
    finally:
        for a in actors:
            ray.kill(a)

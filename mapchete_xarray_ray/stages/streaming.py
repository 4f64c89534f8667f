"""Stateful streaming-shaped operator: keyed running aggregates held in
an actor pool.

The reference has no event-time streaming (SURVEY.md §2.9); this is
the graft's stream-shaped extension beyond the windowed groupbys in
pipelines/queries.py: when semantics need *incremental per-key state
across batches* (running totals, sessionization with carry-over,
dedup-within-horizon), Ray Data's stateless operators don't fit — the
state lives in a fixed pool of actors, one per key-hash bucket, fed
batches whose keys route to their owning actor.

Pattern (the guide's "one actor per key-hash bucket"):

1. ``repartition``-by-bucket via ``groupby(bucket).map_groups`` so each
   bucket's rows arrive together and internally ts-sorted;
2. the map_groups task feeds its bucket's rows through a
   :class:`KeyedRunningState` (plain object here — the per-group task
   IS the bucket's single writer, so no cross-task mutable state is
   needed; an ``@ray.remote`` actor variant is only required when state
   must outlive one Dataset pass, e.g. a continuous ingest loop);
3. emits the final state snapshot per key (and could emit per-event
   deltas — same loop).

Ordering contract: within a bucket, rows are processed in
``(ts, event_id)`` order — the same ORDER BY the SQL twin uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class KeyedRunningState:
    """Incremental per-key state: count, sum(value), last_ts, and the
    longest gap between consecutive events (a genuinely order-dependent
    statistic — it cannot be computed by a commutative aggregate, which
    is what makes it a fair test of the stateful path)."""

    def __init__(self):
        self.state: dict[int, list] = {}  # key -> [n, sum, last_ts, max_gap]

    def update(self, keys, ts_us, values):
        for k, t, v in zip(keys, ts_us, values):
            s = self.state.get(k)
            if s is None:
                self.state[k] = [1, v, t, 0]
            else:
                gap = t - s[2]
                s[0] += 1
                s[1] += v
                s[2] = t
                if gap > s[3]:
                    s[3] = gap

    def snapshot(self) -> pa.Table:
        keys = sorted(self.state)
        return pa.table({
            "user_id": pa.array(keys, pa.int64()),
            "n_events": pa.array([self.state[k][0] for k in keys], pa.int64()),
            "sum_value_milli": pa.array([self.state[k][1] for k in keys],
                                        pa.int64()),
            "last_ts_us": pa.array([self.state[k][2] for k in keys], pa.int64()),
            "max_gap_us": pa.array([self.state[k][3] for k in keys], pa.int64()),
        })


def running_totals_group(group: pa.Table) -> pa.Table:
    """map_groups fn over a key-hash bucket: ts-order the bucket, stream
    it through KeyedRunningState, emit final snapshots."""
    order = pa.compute.sort_indices(
        group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
    group = group.take(order)
    ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    keys = group.column("user_id").to_numpy(zero_copy_only=False)
    vals = np.floor(
        group.column("value").to_numpy(zero_copy_only=False) * 1000
    ).astype(np.int64)
    st = KeyedRunningState()
    # feed in chunks to mimic batch arrival (state carries across chunks)
    for lo in range(0, len(ts), 1000):
        st.update(keys[lo:lo + 1000], ts[lo:lo + 1000], vals[lo:lo + 1000])
    return st.snapshot()

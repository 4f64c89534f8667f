"""Cluster-proportional sizing for exchange widths.

Every ``repartition`` / ``_regroup`` before a sort-based shuffle trades
two costs: too few blocks caps the exchange's parallelism (and grows
per-block size toward multi-GB at 100x data); too many blocks explodes
the shuffle's O(blocks^2) intermediate object count. The right width is
proportional to the cluster, not a constant — on the 32-cpu bench host
the measured optimum for small pre-aggregated partials is ~cpus/4
blocks and for wide row exchanges ~1-1.5x cpus, so call sites express
their width as a *per-cpu fraction* and this helper scales it with
``ray.cluster_resources()`` (the same source pipelines/flagship.py uses
to size its tile shuffle).
"""

from __future__ import annotations

import ray


def nblocks_for_cluster(per_cpu: float = 0.25, lo: int = 4,
                        hi: int = 4096) -> int:
    """Shuffle width = clamp(round(cluster_cpus * per_cpu), lo, hi).

    ``per_cpu`` guidance (measured on the 32-cpu bench host):

    - 0.125-0.25 — tiny pre-aggregated partials (histograms, candidate
      pairs) where per-block shuffle overhead dominates;
    - 0.5 — medium exchanges (bucketed co-groups of projected rows);
    - 1.0-1.5 — wide row exchanges (full-tile shuffles, work lists that
      should fan out to every CPU).

    ``hi`` bounds the O(blocks^2) shuffle-object count on very large
    clusters. Falls back to 8 CPUs when Ray isn't initialized (pure
    unit-test contexts).
    """
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    return max(lo, min(hi, round(ncpu * per_cpu)))

"""Small shared numpy kernels used across join/dedup stages."""

from __future__ import annotations

import numpy as np


def group_reduce(keys: np.ndarray, *pairs):
    """Vectorized group-by-reduce over sortable keys: each ``pairs``
    entry is ``(ufunc, values)`` (e.g. ``(np.add, x)``,
    ``(np.maximum, x)``). Returns
    ``(uniq_keys, reduced_0, reduced_1, ...)`` with ``uniq_keys``
    ascending. Owns the sort/boundary-mask/reduceat idiom and its
    empty-input edge case once instead of per call site."""
    o = np.argsort(keys, kind="stable")
    k = keys[o]
    new = np.ones(len(k), dtype=bool)
    new[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(new)
    outs = tuple(uf.reduceat(v[o], starts) if len(k) else v[:0]
                 for uf, v in pairs)
    return (k[starts],) + outs


def group_sum(keys: np.ndarray, *vals: np.ndarray):
    """Vectorized group-by-sum over integer keys — the per-batch
    combiner kernel used before every shuffle in the join family.
    Returns ``(uniq_keys, summed_0, summed_1, ...)`` with
    ``uniq_keys`` ascending; to count group sizes, pass a ones array.
    Sum-only sugar over :func:`group_reduce`."""
    return group_reduce(keys, *((np.add, v) for v in vals))


def sorted_lookup(sorted_keys: np.ndarray,
                  probes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized membership probe against a SORTED key array — the
    inner step of every searchsorted-based hash-join/semi-join in this
    repo. Returns ``(hit, idx)``: ``hit[i]`` is True iff ``probes[i]``
    occurs in ``sorted_keys`` and then ``idx[i]`` is a matching
    position (the leftmost); where ``hit`` is False, ``idx`` is 0 —
    always a VALID index, so callers can gather unconditionally and
    select with ``np.where(hit, values[idx], default)``.

    Owns the two sharp edges the inlined copies kept re-implementing:
    out-of-range searchsorted positions and the empty-key-array case.
    """
    pos = np.searchsorted(sorted_keys, probes)
    hit = pos < len(sorted_keys)
    if len(sorted_keys):
        hit[hit] = sorted_keys[pos[hit]] == probes[hit]
    idx = np.where(hit, pos, 0)
    return hit, idx

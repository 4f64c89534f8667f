import numpy as np

from mapchete_xarray_ray.nputil import sorted_lookup


def test_sorted_lookup_membership_and_positions():
    keys = np.array([2, 5, 5, 9], dtype=np.int64)
    probes = np.array([1, 2, 5, 9, 10], dtype=np.int64)
    hit, idx = sorted_lookup(keys, probes)
    assert hit.tolist() == [False, True, True, True, False]
    # leftmost match positions; misses give a VALID index (0)
    assert idx.tolist() == [0, 0, 1, 3, 0]
    assert (keys[idx[hit]] == probes[hit]).all()


def test_sorted_lookup_empty_keys_and_empty_probes():
    hit, idx = sorted_lookup(np.empty(0, np.int64),
                             np.array([3, 7], dtype=np.int64))
    assert hit.tolist() == [False, False]
    assert idx.tolist() == [0, 0]
    hit, idx = sorted_lookup(np.array([1], dtype=np.int64),
                             np.empty(0, np.int64))
    assert len(hit) == 0 and len(idx) == 0


def test_group_sum_multi_values_and_empty():
    from mapchete_xarray_ray.nputil import group_sum

    k = np.array([7, 2, 7, 2, 5], dtype=np.int64)
    a = np.array([1, 10, 2, 20, 5], dtype=np.int64)
    b = np.array([100, 1, 200, 2, 50], dtype=np.int64)
    uk, sa, sb = group_sum(k, a, b)
    assert uk.tolist() == [2, 5, 7]
    assert sa.tolist() == [30, 5, 3]
    assert sb.tolist() == [3, 50, 300]
    uk, sa = group_sum(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(uk) == 0 and len(sa) == 0


def test_group_reduce_mixed_ufuncs():
    from mapchete_xarray_ray.nputil import group_reduce

    k = np.array([7, 2, 7, 2, 5], dtype=np.int64)
    v = np.array([1, 10, 2, 20, 5], dtype=np.int64)
    uk, mx, tot = group_reduce(k, (np.maximum, v), (np.add, v))
    assert uk.tolist() == [2, 5, 7]
    assert mx.tolist() == [20, 5, 2]
    assert tot.tolist() == [30, 5, 3]
    uk, mx = group_reduce(np.empty(0, np.int64),
                          (np.maximum, np.empty(0, np.int64)))
    assert len(uk) == 0 and len(mx) == 0

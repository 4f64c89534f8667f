"""Bloom-filter pre-shuffle pruning (stages/bloom.py)."""

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.stages.bloom import (
    bloom_build,
    bloom_contains,
    bloom_from_dataset,
    bloom_prune_stage,
)

M = 1 << 16


def test_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**62, 4000).astype(np.int64)
    words = bloom_build(keys, M)
    assert bloom_contains(words, M, keys).all()  # never a false negative
    probes = rng.integers(0, 2**62, 20000).astype(np.int64)
    probes = probes[~np.isin(probes, keys)]
    fpr = bloom_contains(words, M, probes).mean()
    # 4000 keys in 65536 bits = 16 bits/key, k=4 -> fpr well under 2%
    assert fpr < 0.02, fpr


def test_partial_or_merge_equals_single_build():
    rng = np.random.default_rng(6)
    keys = rng.integers(0, 2**62, 3000).astype(np.int64)
    merged = bloom_build(keys[:1000], M) | bloom_build(keys[1000:], M)
    np.testing.assert_array_equal(merged, bloom_build(keys, M))


def test_dataset_build_and_prune_stage():
    keys = np.arange(0, 1000, 2, dtype=np.int64)  # evens
    ds = ray.data.from_arrow(pa.table({"key": pa.array(keys)})).repartition(3)
    words = bloom_from_dataset(ds, "key", M)
    ref = ray.put(words)
    batch = pa.table({"key": pa.array(np.arange(1000, dtype=np.int64))})
    pruned = bloom_prune_stage(ref, M, "key")(batch)
    got = set(pruned.column("key").to_pylist())
    assert set(keys) <= got           # every true key survives
    assert len(got) < 1000 * 0.55     # odds are (almost) all pruned

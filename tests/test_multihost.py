"""Multi-host readiness: manifest sharding math, global-batch assembly,
run-dir/checkpoint multi-process behavior (single-process semantics are
exercised directly; the N-process layout math is property-tested)."""

import numpy as np

from cinema_tpu.parallel.mesh import batch_shardings, make_mesh
from cinema_tpu.parallel.multihost import (
    local_data_shard_count,
    make_global_batch,
    shard_manifest,
)


def test_shard_manifest_covers_and_balances():
    """DistributedSampler semantics (reference mae/pretrain.py:327-330):
    equal-length shards, union covers the dataset, deterministic."""
    items = [f"pid{i}" for i in range(103)]  # not divisible by world
    for world in (1, 2, 4, 8):
        shards = [
            shard_manifest(items, process_index=r, process_count=world, shuffle_seed=7)
            for r in range(world)
        ]
        per = -(-len(items) // world)
        assert all(len(s) == per for s in shards)
        union = set().union(*[set(s) for s in shards])
        assert union == set(items)
        # wrap-padding duplicates at most (per*world - n) items
        from collections import Counter

        counts = Counter(x for s in shards for x in s)
        assert sum(c - 1 for c in counts.values()) == per * world - len(items)
        # deterministic
        again = shard_manifest(items, process_index=0, process_count=world, shuffle_seed=7)
        assert again == shards[0]


def test_shard_manifest_shuffles_with_seed():
    items = list(range(50))
    a = shard_manifest(items, process_index=0, process_count=2, shuffle_seed=1)
    b = shard_manifest(items, process_index=0, process_count=2, shuffle_seed=2)
    assert a != b
    # world=1 returns the manifest unchanged (order handled by the loader)
    assert shard_manifest(items, process_index=0, process_count=1, shuffle_seed=1) == items


def test_local_shard_count_and_global_batch_single_process():
    mesh = make_mesh(n_model=2)  # 4x2 on the 8 virtual devices
    assert local_data_shard_count(mesh) == 4

    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    shardings = batch_shardings(batch, mesh)
    arr = make_global_batch(batch, shardings)["x"]
    assert arr.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(arr), batch["x"])
    assert arr.sharding.spec == shardings["x"].spec


def test_synced_timestamp_single_process():
    from cinema_tpu.log import _synced_timestamp

    ts = _synced_timestamp()
    assert len(ts) == 15 and ts[8] == "_"


def test_pretrain_local_batch_math():
    """local batch = per-device batch x locally-owned data rows."""
    mesh = make_mesh()  # 8x1
    assert local_data_shard_count(mesh) == 8
    per_device = 2
    assert per_device * local_data_shard_count(mesh) == 16

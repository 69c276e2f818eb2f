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


def test_batchloader_process_shard(monkeypatch):
    """process_shard=True strides the identically-shuffled order across
    processes (DistributedSampler semantics): equal-length wrap-padded
    shards whose union covers the dataset each epoch."""
    import jax

    from cinema_tpu.data.datasets import BatchLoader

    class _Items:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    seen = {}
    for rank in range(4):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        loader = BatchLoader(_Items(), batch_size=3, shuffle=True, seed=7,
                             n_workers=1, process_shard=True)
        assert len(loader) == 1  # ceil(10/4)=3 items -> one size-3 batch
        ids = []
        for batch in loader:
            ids.extend(int(v[0]) for v in batch["x"])
        seen[rank] = ids
        assert len(ids) == 3  # wrap-padded equal shard
    union = {i for ids in seen.values() for i in ids}
    assert union == set(range(10))
    # identical shuffle on every process => disjoint before wrap-padding
    flat = [i for ids in seen.values() for i in ids]
    assert len(set(flat[:10])) + 2 >= 10


def test_batchloader_no_shard_by_default():
    from cinema_tpu.data.datasets import BatchLoader

    class _Items:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"x": np.full((1,), i, np.float32)}

    loader = BatchLoader(_Items(), batch_size=2, n_workers=1)
    ids = [int(v[0]) for batch in loader for v in batch["x"]]
    assert ids == [0, 1, 2, 3, 4]


def test_batchloader_abandoned_consumer_stops_producer():
    """Dropping the iterator mid-epoch must stop the producer thread even if
    it is blocked on a full queue (put_or_stop re-checks the stop event)."""
    import threading
    import time

    from cinema_tpu.data.datasets import BatchLoader

    calls = []

    class _DS:
        def __len__(self):
            return 200

        def __getitem__(self, i):
            calls.append(i)
            return {"x": np.zeros((1,), np.float32)}

    loader = BatchLoader(_DS(), batch_size=2, n_workers=2, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # generator finally -> stop.set()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    n1 = len(calls)
    time.sleep(0.3)
    assert len(calls) == n1, "producer kept fetching after the consumer left"
    assert threading.active_count() <= before


def test_maybe_subset_dataset_val_ratio_grouped():
    """The grouped branch must subsample val with VAL's own ratio."""
    import pandas as pd

    from cinema_tpu.config import Config
    from cinema_tpu.train.loop import maybe_subset_dataset

    train = pd.DataFrame({"pid": range(100), "g": [i % 2 for i in range(100)]})
    val = pd.DataFrame({"pid": range(20), "g": [i % 2 for i in range(20)]})
    config = Config()
    config.data = {"max_n_samples": 10, "proportion": 1.0}
    config.seed = 0
    sub_train, sub_val = maybe_subset_dataset(config, train, val, group_col="g")
    assert len(sub_train) == 10  # 100 * 10/100
    assert len(sub_val) == 10  # 20 * min(10/20, 1) — NOT 20 * 0.1

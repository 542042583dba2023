"""Multi-host helpers: sampler sharding semantics + global batch assembly."""

import numpy as np

from fovealseg_tpu.parallel.multihost import (
    DistributedSampler,
    describe_topology,
    global_batch_from_host_local,
    host_shard_indices,
    initialize,
    split_batch_axis,
)


def test_shards_partition_with_wrap_padding():
    # n=10 over 4 ranks -> num_samples=3, total=12, 2 wrap duplicates
    n, world = 10, 4
    shards = [host_shard_indices(n, world, r, shuffle=True, epoch=5) for r in range(world)]
    assert all(len(s) == 3 for s in shards)
    allidx = np.concatenate(shards)
    assert len(allidx) == 12
    # every dataset index appears; exactly total-n duplicates
    assert set(allidx.tolist()) == set(range(n))
    counts = np.bincount(allidx, minlength=n)
    assert counts.sum() == 12 and (counts >= 1).all() and (counts <= 2).all()


def test_no_shuffle_matches_reference_block_slice():
    # shuffle=False: padded arange sliced in contiguous rank blocks
    # (lib/utils/data/distributed.py:37-52 semantics)
    n, world = 7, 3  # num_samples=3, total=9, padding wraps 0, 1
    expect = [[0, 1, 2], [3, 4, 5], [6, 0, 1]]
    for r in range(world):
        got = host_shard_indices(n, world, r, shuffle=False).tolist()
        assert got == expect[r]


def test_epoch_determinism_and_reshuffle():
    a1 = host_shard_indices(20, 2, 0, epoch=1)
    a2 = host_shard_indices(20, 2, 0, epoch=1)
    b = host_shard_indices(20, 2, 0, epoch=2)
    assert (a1 == a2).all()
    assert not (a1 == b).all()


def test_distributed_sampler_class():
    s = DistributedSampler(10, num_replicas=4, rank=1)
    assert len(s) == 3
    s.set_epoch(3)
    first = list(s)
    assert list(s) == first  # same epoch -> same order
    s.set_epoch(4)
    assert list(s) != first


def test_global_batch_assembly_on_mesh():
    import jax
    from fovealseg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    batch = {
        "img_data": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
        "cls_label": np.arange(8, dtype=np.int32),
    }
    g = global_batch_from_host_local(batch, mesh)
    assert g["img_data"].shape == (8, 4, 4, 3)
    assert len(g["img_data"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["cls_label"]), batch["cls_label"])
    assert jax.process_count() == 1  # single-host path exercised


def test_split_batch_axis_and_topology():
    batch = {"x": np.arange(12).reshape(6, 2)}
    part = split_batch_axis(batch, 3, 1)
    np.testing.assert_array_equal(part["x"], batch["x"][2:4])
    topo = describe_topology()
    assert topo["process_count"] == 1 and topo["local_device_count"] == 8
    assert initialize() is False  # single-host no-op


def test_small_dataset_still_fills_every_rank():
    # n < num_replicas: tiled wrap padding must give every rank a full shard
    shards = [host_shard_indices(3, 8, r, shuffle=False) for r in range(8)]
    assert all(len(s) == 1 for s in shards)
    assert set(np.concatenate(shards).tolist()) == {0, 1, 2}

"""Pipeline: index replication, sharding, determinism (reference
datasets.py:150-160 + DistributedSampler semantics)."""

import numpy as np

import jax

from image_segmentation_tpu.data import pipeline as pl
from image_segmentation_tpu.data.datasets import synthetic_dataset
from image_segmentation_tpu.parallel import mesh as mesh_lib


def test_epoch_permutation_replicates_indices():
    order = pl.epoch_permutation(10, 3, epoch=0, shuffle=False)
    assert len(order) == 40
    counts = np.bincount(order, minlength=10)
    assert (counts == 4).all()


def test_epoch_permutation_deterministic_per_epoch():
    a = pl.epoch_permutation(10, 1, epoch=3, seed=7)
    b = pl.epoch_permutation(10, 1, epoch=3, seed=7)
    c = pl.epoch_permutation(10, 1, epoch=4, seed=7)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # set_epoch-style reshuffle


def test_batch_shapes_and_types():
    ds = synthetic_dataset(length=10, height=8, width=8)
    pipe = pl.BatchPipeline(ds, 4, augmentations_per_datapoint=1, seed=0)
    batches = list(pipe.epoch(0))
    assert len(batches) == 5  # 20 virtual / 4
    for imgs, masks in batches:
        assert imgs.shape == (4, 8, 8, 3) and imgs.dtype == np.uint8
        assert masks.shape == (4, 8, 8) and masks.dtype == np.uint8


def test_drop_last_false_keeps_remainder():
    ds = synthetic_dataset(length=10, height=8, width=8)
    pipe = pl.BatchPipeline(
        ds, 4, augmentations_per_datapoint=0, drop_last=False, shuffle=False
    )
    batches = list(pipe.epoch(0))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]


def test_process_sharding_partitions_batch():
    ds = synthetic_dataset(length=8, height=8, width=8)
    shards = []
    for rank in range(2):
        pipe = pl.BatchPipeline(
            ds, 4, shuffle=False, process_index=rank, process_count=2
        )
        shards.append([np.asarray(b[0]) for b in pipe.epoch(0)])
    # each rank gets half of each global batch; together they cover it
    full = pl.BatchPipeline(ds, 4, shuffle=False)
    full_batches = [np.asarray(b[0]) for b in full.epoch(0)]
    for fb, s0, s1 in zip(full_batches, shards[0], shards[1]):
        assert s0.shape[0] == 2 and s1.shape[0] == 2
        np.testing.assert_array_equal(fb[0::2], s0)
        np.testing.assert_array_equal(fb[1::2], s1)


def test_device_sharding_over_mesh():
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual devices
    ds = synthetic_dataset(length=16, height=8, width=8)
    pipe = pl.BatchPipeline(
        ds, 8, shuffle=False, sharding=mesh_lib.batch_sharding(mesh)
    )
    imgs, _ = next(iter(pipe.epoch(0)))
    assert len(imgs.addressable_shards) == 8
    assert imgs.addressable_shards[0].data.shape[0] == 1

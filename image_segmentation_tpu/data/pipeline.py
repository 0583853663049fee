"""Host->device batch pipeline.

Replaces the reference's DataLoader(+fork workers, pin_memory)
(model_wrappers.py:103-108) and DistributedSampler (train_distributed.py:47-53)
with a TPU-idiomatic design:

- Epoch order is a permutation of VIRTUAL indices: each base item appears
  ``augmentations_per_datapoint + 1`` times per epoch (the reference's index
  replication scheme, datasets.py:150-160); the device-side augmentor then
  keeps every (aug+1)-th *batch position* clean
  (processing_blocks.py:374-384 semantics).
- Per-process sharding: each JAX process materializes only its contiguous
  chunk of every global batch (replaces DistributedSampler; ``set_epoch`` ==
  per-epoch reshuffle keyed on (seed, epoch), identical on every process).
- Batches are uint8.  With a ``jax.sharding.NamedSharding`` the per-process
  chunks are assembled into ONE global jax.Array via
  ``jax.make_array_from_process_local_data`` — the only construction that
  is correct under ``process_count > 1`` (a plain ``device_put`` of a local
  slice against a global sharding raises on non-addressable devices).  It
  degenerates to a sharded device_put at ``process_count == 1``.  One batch
  of lookahead overlaps host slicing with device compute.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import jax
import numpy as np

from .datasets import ArrayDataset


def epoch_permutation(
    num_items: int,
    augmentations_per_datapoint: int,
    epoch: int,
    seed: int = 0,
    shuffle: bool = True,
) -> np.ndarray:
    """Shuffled virtual->base index map for one epoch."""
    reps = augmentations_per_datapoint + 1
    virt = np.arange(num_items * reps) // reps
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        rng.shuffle(virt)
    return virt


class BatchPipeline:
    """Iterate (images_u8, masks_u8) device batches over an ArrayDataset.

    drop_last=True keeps shapes static for the jitted train step; evaluation
    uses drop_last=False and pays at most one extra compile for the remainder
    shape.
    """

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        *,
        augmentations_per_datapoint: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        mask_attr: str = "masks",
    ):
        self.dataset = dataset
        self.mask_attr = mask_attr
        self._masks = getattr(dataset, mask_attr)
        if self._masks is None:
            raise ValueError(
                f"dataset has no {mask_attr!r} array (load with "
                "keep_raw_masks=True for prompt training)"
            )
        self.global_batch_size = batch_size
        self.augmentations_per_datapoint = augmentations_per_datapoint
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.sharding = sharding
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        if batch_size % self.process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by process_count "
                f"{self.process_count}"
            )

    @property
    def virtual_length(self) -> int:
        return len(self.dataset) * (self.augmentations_per_datapoint + 1)

    def batches_per_epoch(self) -> int:
        n, b = self.virtual_length, self.global_batch_size
        return n // b if self.drop_last else -(-n // b)

    def epoch(self, epoch: int = 0) -> Iterator[tuple]:
        """Yield device-placed (images, masks) uint8 batches for one epoch."""
        order = epoch_permutation(
            len(self.dataset),
            self.augmentations_per_datapoint,
            epoch,
            self.seed,
            self.shuffle,
        )
        n = len(order)
        b = self.global_batch_size
        num_batches = self.batches_per_epoch()

        item_shapes = (
            self.dataset.images.shape[1:],
            self._masks.shape[1:],
        )

        def to_device(i: int):
            idx = order[i * b : (i + 1) * b]
            n_i = len(idx)
            if self.sharding is not None:
                shardable = n_i % self.process_count == 0
                if shardable:
                    try:
                        # Raises when the (remainder) batch is not divisible
                        # by the data-axis size.
                        self.sharding.shard_shape((n_i,) + item_shapes[0])
                    except ValueError:
                        shardable = False
                if shardable:
                    # This process's ADDRESSABLE batch rows -> global
                    # sharded array.  Derived from the sharding's index
                    # map, NOT batch/process_count: in a layout where a
                    # process holds only part of one data row's devices
                    # (e.g. 8 processes x 1 device over a (data=4,
                    # model=2) mesh), the process addresses a whole row
                    # (2 elements) while the naive per-process split
                    # yields 1 — neighbours sharing a row each supply it.
                    amap = self.sharding.addressable_devices_indices_map(
                        (n_i,) + item_shapes[0]
                    )
                    spans = sorted(
                        {
                            (
                                s[0].start or 0,
                                n_i if s[0].stop is None else s[0].stop,
                            )
                            for s in amap.values()
                        }
                    )
                    assert all(
                        spans[k][1] == spans[k + 1][0]
                        for k in range(len(spans) - 1)
                    ), f"non-contiguous addressable batch rows: {spans}"
                    lidx = idx[spans[0][0] : spans[-1][1]]
                    return tuple(
                        jax.make_array_from_process_local_data(
                            self.sharding, src[lidx], (n_i,) + shp
                        )
                        for src, shp in zip(
                            (self.dataset.images, self._masks), item_shapes
                        )
                    )
                # Remainder batch (drop_last=False, eval path): replicated
                # placement of the FULL batch — every process has the whole
                # (in-memory) split and the same deterministic order, so the
                # replicated value is identical everywhere.  Assembled via
                # make_array_from_process_local_data (each process supplies
                # the full value): a plain device_put against a sharding
                # spanning non-addressable devices raises under
                # process_count > 1 — proven by tests/test_multiprocess.py's
                # evaluator leg, which executes this branch with 2 and 4
                # real processes.
                rep = jax.sharding.NamedSharding(
                    self.sharding.mesh, jax.sharding.PartitionSpec()
                )
                return tuple(
                    jax.make_array_from_process_local_data(
                        rep, src[idx], (n_i,) + shp
                    )
                    for src, shp in zip(
                        (self.dataset.images, self._masks), item_shapes
                    )
                )
            # No sharding: process-local slice on the default device (the
            # reference's per-rank validation semantics).
            lidx = idx[self.process_index :: self.process_count]
            return tuple(
                jax.device_put(src[lidx])
                for src in (self.dataset.images, self._masks)
            )

        # One batch of lookahead: enqueue transfer i+1 before yielding i.
        pending = to_device(0) if num_batches else None
        for i in range(num_batches):
            nxt = to_device(i + 1) if i + 1 < num_batches else None
            out, pending = pending, nxt
            yield out


def prefetch_to_device(
    iterator: Iterator, size: int = 2
) -> Iterator:
    """Generic N-deep prefetcher for already-device-mapped iterators."""
    import collections

    queue = collections.deque()
    for item in iterator:
        queue.append(item)
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()

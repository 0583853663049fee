"""Host-side A/B: C++ NativeBatchPipeline vs Python BatchPipeline.

Measures pure batch-assembly throughput (shuffle + aug-slot expansion +
gather into contiguous batches) on CPU jax, no device in the loop —
the input-pipeline budget for VERDICT round-1 weak #5 / PERFORMANCE.md.
"""
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from image_segmentation_tpu.data.datasets import synthetic_dataset
from image_segmentation_tpu.data.pipeline import BatchPipeline
from image_segmentation_tpu.data import native_loader


def run(pipe, n_epochs=3):
    # warm epoch
    for batch in pipe.epoch(0):
        jax.block_until_ready(batch)
    t0 = time.perf_counter()
    n = 0
    for e in range(1, 1 + n_epochs):
        for images, masks in pipe.epoch(e):
            jax.block_until_ready((images, masks))
            n += int(images.shape[0])
    dt = time.perf_counter() - t0
    return n / dt, dt


def main():
    size, n_imgs, aug, batch = 512, 64, 3, 16
    ds = synthetic_dataset(n_imgs, size, seed=3)
    mb_per_img = (size * size * 3 + size * size) / 1e6

    py = BatchPipeline(
        ds, batch, augmentations_per_datapoint=aug, shuffle=True, seed=0
    )
    py_ips, py_dt = run(py)
    print(f"python  : {py_ips:8.1f} img/s  ({py_ips * mb_per_img:7.0f} MB/s)")

    if not native_loader.native_loader_available():
        print("native loader unavailable (no compiled runtime/loader.cpp)")
        return
    nat = native_loader.NativeBatchPipeline(
        ds, batch, augmentations_per_datapoint=aug, shuffle=True, seed=0
    )
    nat_ips, nat_dt = run(nat)
    print(f"native  : {nat_ips:8.1f} img/s  ({nat_ips * mb_per_img:7.0f} MB/s)")
    print(f"speedup : {nat_ips / py_ips:.2f}x")
    # context: the production train step consumes batch 16 @ ~160 ms
    # => needs ~100 img/s from the pipeline; report headroom.
    print(f"headroom vs 100 img/s step demand: py {py_ips/100:.1f}x, "
          f"native {nat_ips/100:.1f}x")


if __name__ == "__main__":
    main()

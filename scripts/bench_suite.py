"""Extended benchmark surface (BASELINE.json configs beyond the headline).

``bench.py`` stays the driver's single-JSON-line headline (LargeUNet@512).
This suite additionally measures, on the real chip:

  unet_256         train throughput, UNet@256 batch 250
                   (reference training_scripts/train_Unet.py config)
  clip_unet_256    train throughput, ClipUnet@256 batch 100
                   (reference training_scripts/train_CLIP_Unet.py config)
  robustness_sweep full integer-space 8x10 perturbation battery wall-clock
                   (reference scripts/robustness_evaluation.py:27-133),
                   ClipUnet batch 8 over a synthetic test split

Each line of output is one JSON object; pass ``--only`` to run a subset.
CLIP towers are random-init (zero-egress environment) — identical compute
graph to converted pretrained weights.
"""

from __future__ import annotations

import argparse
import json
import time


def _train_throughput(model: str, size: int, batch: int, model_args=None,
                      steps: int = 12) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.engine.train import Trainer

    cfg = TrainConfig(
        model=model,
        batch_size=batch,
        num_epochs=1,
        model_args=dict(model_args or {}),
        data=DataConfig(
            dataset="synthetic",
            synthetic_length=batch,
            image_size=size,
            augmentations_per_datapoint=4,
        ),
    )
    trainer = Trainer(cfg, make_artifacts=False)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)).astype(np.uint8))

    key = jax.random.PRNGKey(0)
    for _ in range(3):  # warmup/compile; state chaining varies the inputs
        trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return steps * batch / dt


def bench_unet_256() -> dict:
    v = _train_throughput("unet", 256, 250)
    return {"metric": "unet_256_train_images_per_sec_per_chip",
            "value": round(v, 2), "unit": "images/sec/chip"}


def bench_clip_unet_256() -> dict:
    v = _train_throughput("clip_unet", 256, 100)
    return {"metric": "clip_unet_256_train_images_per_sec_per_chip",
            "value": round(v, 2), "unit": "images/sec/chip"}


def bench_robustness_sweep(n_images: int = 256) -> dict:
    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.data.datasets import synthetic_dataset
    from image_segmentation_tpu.engine.evaluate import Evaluator
    from image_segmentation_tpu.engine.train import Trainer

    cfg = TrainConfig(
        model="clip_unet",
        batch_size=8,
        num_epochs=1,
        data=DataConfig(dataset="synthetic", synthetic_length=8, image_size=256),
    )
    trainer = Trainer(cfg, make_artifacts=False)
    test_data = synthetic_dataset(n_images, height=256, width=256, seed=42)
    ev = Evaluator(
        trainer.model,
        {
            "params": trainer.state["params"],
            "batch_stats": trainer.state["batch_stats"],
        },
        test_data,
        batch_size=8,
    )
    t0 = time.perf_counter()
    results = ev.robustness_evaluation(results_file="/tmp/bench_robustness.csv")
    dt = time.perf_counter() - t0
    n_cells = sum(len(v) for v in results.values())
    return {"metric": "robustness_sweep_8x10_wall_clock",
            "value": round(dt, 1), "unit": "seconds",
            "cells": n_cells, "images_per_cell": n_images}


BENCHES = {
    "unet_256": bench_unet_256,
    "clip_unet_256": bench_clip_unet_256,
    "robustness_sweep": bench_robustness_sweep,
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", nargs="*", choices=sorted(BENCHES), default=None)
    args = ap.parse_args()
    names = args.only or list(BENCHES)
    for name in names:
        print(json.dumps(BENCHES[name]()), flush=True)


if __name__ == "__main__":
    main()

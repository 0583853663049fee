"""Secondary benchmark surface (BASELINE.json configs beyond the headline).

Prints ONE JSON line PER benchmark (bench.py keeps the single headline
line; the driver consumes that one — this script is for PERFORMANCE.md
coverage of the other production configs):

  - clip_unet_256_train: ClipUnet production train step (CLIP ViT-B/32
    tower + cross-attention fusion) at 256x256.
  - robustness_sweep_wallclock: the full integer-space 8x10 perturbation
    battery (robustness_evaluation.py:27-133 equivalent) over a LargeUNet
    at 512^2, synthetic test split, including all per-sweep compiles.

Usage: python bench_extra.py [clip|sweep ...]  (default: all)
"""

from __future__ import annotations

import json
import sys
import time


def bench_clip_unet():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.engine.train import Trainer

    batch, size = 32, 256
    cfg = TrainConfig(
        model="clip_unet",
        batch_size=batch,
        num_epochs=1,
        model_args={"w2d_level0": True, "w2d_impl": "pallas_fused"},
        data=DataConfig(
            dataset="synthetic", synthetic_length=batch, image_size=size,
            augmentations_per_datapoint=4,
        ),
    )
    trainer = Trainer(cfg, make_artifacts=False)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    )
    masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)).astype(np.uint8))
    key = jax.random.PRNGKey(0)

    for _ in range(3):
        trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
    jax.block_until_ready(loss)

    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    # Step MFU from the compiler's own FLOP count (XLA cost analysis of the
    # jitted step) against the v5e bf16 peak.
    V5E_BF16_PEAK = 197e12
    try:
        cost = (
            trainer._train_step.lower(trainer.state, images, masks, key)
            .compile()
            .cost_analysis()
        )
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    mfu = flops / (dt / steps) / V5E_BF16_PEAK if flops else None
    print(json.dumps({
        "metric": "clip_unet_256_train_images_per_sec_per_chip",
        "value": round(steps * batch / dt, 2),
        "unit": "images/sec/chip",
        "mfu_pct": round(100 * mfu, 1) if mfu else None,
        "step_tflop": round(flops / 1e12, 2) if flops else None,
        "config": {"batch": batch, "size": size},
    }), flush=True)


def bench_sweep():
    import jax
    import numpy as np

    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.data.datasets import synthetic_dataset
    from image_segmentation_tpu.engine.evaluate import Evaluator
    from image_segmentation_tpu.engine.train import Trainer

    batch, size, n_test = 8, 512, 64
    cfg = TrainConfig(
        model="large_unet",
        batch_size=batch,
        num_epochs=1,
        model_args={"w2d_level0": True, "w2d_impl": "pallas_fused"},
        data=DataConfig(
            dataset="synthetic", synthetic_length=batch, image_size=size,
            augmentations_per_datapoint=0,
        ),
    )
    trainer = Trainer(cfg, make_artifacts=False)
    test = synthetic_dataset(n_test, size, seed=7)
    ev = Evaluator(
        trainer.model,
        {"params": trainer.state["params"],
         "batch_stats": trainer.state["batch_stats"]},
        test,
        batch_size=batch,
    )
    from image_segmentation_tpu.data import perturbations as pert

    t0 = time.perf_counter()
    n_rows = 0
    for name, info in pert.INT_SWEEPS.items():
        tf0 = time.perf_counter()
        for param in info["params"]:
            ev._run_sweep_point("int", name, param)
            n_rows += 1
        print(
            f"# {name}: {time.perf_counter() - tf0:.1f}s "
            f"({len(info['params'])} points)",
            file=sys.stderr, flush=True,
        )
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "robustness_sweep_8x10_wallclock_sec",
        "value": round(dt, 1),
        "unit": "seconds",
        "config": {
            "model": "large_unet", "size": size, "n_test": n_test,
            "batch": batch, "grid_rows": n_rows,
        },
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["clip", "sweep"]
    if "clip" in which:
        bench_clip_unet()
    if "sweep" in which:
        bench_sweep()

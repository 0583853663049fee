"""Headline benchmark: 512x512 LargeUNet training throughput (images/sec/chip).

BASELINE.json north star: >= 3x A100 images/sec/chip on the 512x512 U-Net
train step (reference config: training_scripts/train_Large_Unet.py, LargeUNet
at 256x256 batch 150; the driver's target lifts it to 512x512).

The measured step is the REAL production train step: uint8 batch ->
on-device normalize + fused augmentation -> bf16 LargeUNet forward ->
CE loss -> backward -> torch-Adam-parity update, all in one donated jit.

``vs_baseline`` is measured_imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC where
the denominator is our estimate of the reference PyTorch stack
(torch.compile max-autotune + AMP) on one A100-80GB for the same model/shape;
the reference publishes no numbers (BASELINE.md), so this constant is an
engineering estimate, kept fixed across rounds for comparability.
"""

from __future__ import annotations

import json
import os
import time

A100_REFERENCE_IMGS_PER_SEC = 100.0  # estimated torch A100 LargeUNet@512 train


def make_cfg():
    """The benched config IS the ``large_unet`` production preset's model
    (model_args taken from ``preset()``, so bench<->preset drift is
    impossible — tests/test_bench_preset_parity.py pins it), with the
    bench-shape overrides (batch 16, 512^2 synthetic data, 1 epoch) and
    env-var A/B hooks applied on top."""
    import dataclasses

    from image_segmentation_tpu.config import DataConfig, preset

    batch = int(os.environ.get("IMGSEG_BENCH_BATCH", "16"))
    size = 512
    base = preset("large_unet")
    model_args = dict(base.model_args)
    # A/B hooks for the folded-conv implementation (dense/halo/pallas)
    # and level-1 folding; the headline metric uses the preset defaults.
    if "IMGSEG_BENCH_W2D_IMPL" in os.environ:
        model_args["w2d_impl"] = os.environ["IMGSEG_BENCH_W2D_IMPL"]
    if os.environ.get("IMGSEG_BENCH_W2D_L1", "0") == "1":
        # Refold-to-f level 1 (measured slower than the fold-2 chain).
        model_args["w2d_level1"] = True
    if "IMGSEG_BENCH_W2D_L1F2" in os.environ:
        model_args["w2d_level1_fold2"] = (
            os.environ["IMGSEG_BENCH_W2D_L1F2"] == "1"
        )
    fused_deep = os.environ.get("IMGSEG_BENCH_FUSED_DEEP", "0")
    if fused_deep != "0":
        # "1" = all levels, "enc3,dec2" = those levels (models/unet.py).
        model_args["fused_deep"] = True if fused_deep == "1" else fused_deep
    return dataclasses.replace(
        base,
        batch_size=batch,
        num_epochs=1,
        model_args=model_args,
        data=DataConfig(
            dataset="synthetic",
            synthetic_length=batch,
            image_size=size,
            augmentations_per_datapoint=4,
        ),
    )


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_segmentation_tpu.engine.train import Trainer

    cfg = make_cfg()
    batch, size = cfg.batch_size, cfg.data.image_size
    trainer = Trainer(cfg, make_artifacts=False)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    )
    masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)).astype(np.uint8))
    key = jax.random.PRNGKey(0)

    # Timing methodology: `steps` iterations chained inside ONE jit via
    # lax.fori_loop threading the full train state, finished with a real
    # device->host transfer.  Dispatch-level chaining + block_until_ready
    # was measured returning EARLY on one config (bench_extra autoencoder
    # w2d: 38k "img/s") even though it agrees exactly with this loop on
    # this headline config (125.16 vs 125.07 img/s) — see PERFORMANCE.md.
    # The per-iteration fold_in stops XLA hoisting the augmentation out of
    # the loop and matches production (fresh key every step).
    import functools

    step = trainer._train_step

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def run_n(state, images, masks, key, n):
        def body(i, st):
            st2, _loss = step(st, images, masks, jax.random.fold_in(key, i))
            return st2
        return jax.lax.fori_loop(0, n, body, state)

    steps = 20
    state = run_n(trainer.state, images, masks, key, steps)  # compile+warm
    jax.device_get(state["step"])

    t0 = time.perf_counter()
    state = run_n(state, images, masks, key, steps)
    jax.device_get(state["step"])  # true sync: a real transfer
    dt = time.perf_counter() - t0

    imgs_per_sec = steps * batch / dt
    n_chips = jax.device_count()
    per_chip = imgs_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "large_unet_512_train_images_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / A100_REFERENCE_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

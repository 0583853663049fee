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


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.engine.train import Trainer

    batch = int(os.environ.get("IMGSEG_BENCH_BATCH", "16"))
    size = 512
    cfg = TrainConfig(
        model="large_unet",
        batch_size=batch,
        num_epochs=1,
        # width-to-depth folding of the full-resolution level: numerically
        # equivalent to the standard model (shared checkpoints, see
        # tests/test_folded.py), faster on the small-channel convs.
        model_args={
            "w2d_level0": True,
            # A/B hooks for the folded-conv implementation (dense/halo/pallas)
            # and level-1 folding; the headline metric uses the committed
            # defaults.
            "w2d_impl": os.environ.get("IMGSEG_BENCH_W2D_IMPL", "pallas_fused"),
            "w2d_level1": os.environ.get("IMGSEG_BENCH_W2D_L1", "0") == "1",
            # Level 1 folded at f/2 (relayout-free chain; +4 img/s measured:
            # 119.3 -> 123.3).  The refold-to-f variant (W2D_L1) stays off.
            "w2d_level1_fold2":
                os.environ.get("IMGSEG_BENCH_W2D_L1F2", "1") == "1",
            # Deep (wide-channel) levels through the fused f=1 ConvBN
            # Pallas blocks (models/unet.py fused_deep): A/B hook.
            # "1" = all levels, "enc3,dec2" = those levels, "0" = off.
            "fused_deep": (
                True
                if os.environ.get("IMGSEG_BENCH_FUSED_DEEP", "0") == "1"
                else os.environ.get("IMGSEG_BENCH_FUSED_DEEP")
                if os.environ.get("IMGSEG_BENCH_FUSED_DEEP", "0") != "0"
                else False
            ),
        },
        data=DataConfig(
            dataset="synthetic",
            synthetic_length=batch,
            image_size=size,
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

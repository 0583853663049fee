"""Secondary benchmark surface (BASELINE.json configs beyond the headline).

Prints ONE JSON line PER benchmark (bench.py keeps the single headline
line; the driver consumes that one — this script is for PERFORMANCE.md
coverage of the other production configs):

  - clip_unet_256_train: ClipUnet production train step (CLIP ViT-B/32
    tower + cross-attention fusion) at 256x256.
  - robustness_sweep_wallclock: the full integer-space 8x10 perturbation
    battery (robustness_evaluation.py:27-133 equivalent) over a LargeUNet
    at 512^2, synthetic test split, including all per-sweep compiles.
  - prompt_256_train: ClipUnetPrompt train step (BASELINE config 4's
    prompt path: on-device prompt sampling + Gaussian heatmaps +
    hybrid-binary loss; reference prompt_train.py).
  - autoencoder_256_train: convolutional-autoencoder MSE reconstruction
    step (BASELINE config 2; reference train_autoencoder.py:67-104).
  - infer: serving-path eval forward at 512^2 (batch-16 throughput +
    batch-1 latency; the huggingface-models inference.py equivalent,
    engine/export.py predict path).

Usage: python bench_extra.py [clip|sweep|prompt|autoencoder|infer ...]
(default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _preset_model_args(name, **env_overrides):
    """model_args from the production preset (bench==preset by
    construction; tests/test_bench_preset_parity.py pins it), with env-var
    A/B hooks applied on top: each kwarg maps a model_args key to the env
    var that overrides it ("1"/"0" -> True/False)."""
    from image_segmentation_tpu.config import preset

    args = dict(preset(name).model_args)
    for key, env in env_overrides.items():
        if env in os.environ:
            args[key] = os.environ[env] == "1"
    return args


def bench_clip_unet():
    import numpy as np

    from image_segmentation_tpu.config import DataConfig, TrainConfig

    batch, size = 32, 256
    cfg = TrainConfig(
        model="clip_unet",
        batch_size=batch,
        num_epochs=1,
        # Fold-2 level 1: default ON since the round-3 silicon A/B
        # (513.8 -> 534.9 img/s); IMGSEG_BENCH_CLIP_W2D_L1F2=0 opts out.
        model_args=_preset_model_args(
            "clip_unet", w2d_level1_fold2="IMGSEG_BENCH_CLIP_W2D_L1F2",
        ),
        data=DataConfig(
            dataset="synthetic", synthetic_length=batch, image_size=size,
            augmentations_per_datapoint=4,
        ),
    )
    rng = np.random.default_rng(0)
    masks = rng.integers(0, 3, (batch, size, size)).astype(np.uint8)
    _bench_train_step("clip_unet_256_train_images_per_sec_per_chip",
                      cfg, masks)


def _bench_train_step(metric, cfg, masks, steps=20):
    """Shared timing loop: ``steps`` iterations CHAINED inside ONE jit
    (lax.fori_loop threading the full train state), finished with a real
    device->host transfer.

    This is the only methodology the axon runtime cannot misreport:
    dispatch-level chaining + block_until_ready was measured returning
    EARLY on the folded-autoencoder config (38k "img/s" at 1543% MFU while
    the chain was still in flight), even though it agrees exactly with
    this loop on the headline config (125.16 vs 125.07 img/s) — see
    PERFORMANCE.md measurement caveat.  The per-iteration key fold-in
    stops XLA hoisting the augmentation out of the loop (and matches
    production, which feeds a fresh key every step).

    The single-step AOT lowering is still compiled once, ONLY to read
    cost_analysis() for the MFU column."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_segmentation_tpu.engine.train import Trainer

    batch = cfg.batch_size
    size = cfg.data.image_size
    trainer = Trainer(cfg, make_artifacts=False)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    )
    masks = jnp.asarray(masks)
    key = jax.random.PRNGKey(0)

    step = trainer._train_step
    compiled = step.lower(trainer.state, images, masks, key).compile()

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def run_n(state, images, masks, key, n):
        def body(i, st):
            st2, _loss = step(st, images, masks, jax.random.fold_in(key, i))
            return st2
        return jax.lax.fori_loop(0, n, body, state)

    state = run_n(trainer.state, images, masks, key, steps)  # compile+warm
    jax.device_get(state["step"])

    t0 = time.perf_counter()
    state = run_n(state, images, masks, key, steps)
    jax.device_get(state["step"])  # true sync: a real transfer
    dt = time.perf_counter() - t0

    V5E_BF16_PEAK = 197e12
    try:
        flops = float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:
        flops = 0.0
    mfu = flops / (dt / steps) / V5E_BF16_PEAK if flops else None
    print(json.dumps({
        "metric": metric,
        "value": round(steps * batch / dt, 2),
        "unit": "images/sec/chip",
        "mfu_pct": round(100 * mfu, 1) if mfu else None,
        "step_tflop": round(flops / 1e12, 2) if flops else None,
        "config": {"batch": batch, "size": size},
    }), flush=True)


def bench_prompt():
    import numpy as np

    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.data import records

    batch, size = 32, 256
    cfg = TrainConfig(
        model="clip_unet_prompt", loss="hybrid_binary",
        batch_size=batch, num_epochs=1,
        # Folded variants (incl. the 1-channel folded prompt-encoder
        # kernel): default ON since the round-3 silicon A/B (257.9 ->
        # 394.9 img/s); IMGSEG_BENCH_PROMPT_W2D=0 opts out of w2d_level0.
        model_args=_preset_model_args(
            "prompt",
            w2d_level0="IMGSEG_BENCH_PROMPT_W2D",
            w2d_level1_fold2="IMGSEG_BENCH_CLIP_W2D_L1F2",
        ),
        data=DataConfig(
            dataset="synthetic", synthetic_length=batch, image_size=size,
            augmentations_per_datapoint=4,
        ),
    )
    # The prompt task consumes RAW palette masks (prompt + binary label are
    # derived on device inside the step, data/prompts.py).
    rng = np.random.default_rng(1)
    palette = np.array(
        [0, records.CAT_PALETTE, records.DOG_PALETTE, records.UNCERTAIN_PALETTE],
        dtype=np.uint8,
    )
    masks = palette[rng.integers(0, 4, (batch, size, size))]
    _bench_train_step("clip_unet_prompt_256_train_images_per_sec_per_chip",
                      cfg, masks)


def bench_autoencoder():
    import numpy as np

    from image_segmentation_tpu.config import DataConfig, TrainConfig

    batch, size = 32, 256
    cfg = TrainConfig(
        model="autoencoder", loss="mse", batch_size=batch, num_epochs=1,
        # Folded autoencoder (w2d level 0 + fold-2 level 1 + fold-2 dec1,
        # all from the production preset): default ON since the round-3/4
        # silicon A/Bs (486.0 -> 776.7 -> 1133.3 img/s); the env hooks opt
        # out per path.  NOTE this config is where the dispatch-chained
        # timing was caught lying (38k "img/s"); _bench_train_step now
        # chains inside one jit.
        model_args=_preset_model_args(
            "autoencoder",
            w2d_level0="IMGSEG_BENCH_AE_W2D",
            w2d_level1_fold2="IMGSEG_BENCH_AE_W2D_L1F2",
            w2d_level2_fold2="IMGSEG_BENCH_AE_W2D_L2F2",
        ),
        data=DataConfig(
            dataset="synthetic", synthetic_length=batch, image_size=size,
            augmentations_per_datapoint=0,
        ),
    )
    rng = np.random.default_rng(2)
    masks = rng.integers(0, 3, (batch, size, size)).astype(np.uint8)
    _bench_train_step("autoencoder_256_train_images_per_sec_per_chip",
                      cfg, masks)


def bench_infer(size=512, steps=20, model_args=None):
    """Serving-path benchmark: eval-mode forward (the engine/export.py
    predict path) on LargeUNet@512 — batch-16 throughput and batch-1
    latency.  N iterations are CHAINED inside ONE jit with a
    logits-dependent uint8 perturbation of the input, so the axon
    runtime can neither cache byte-identical dispatches nor elide
    un-consumed ones (PERFORMANCE.md measurement caveat)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.engine.train import Trainer
    from image_segmentation_tpu.ops.augment import normalize_image
    cfg = TrainConfig(
        model="large_unet", batch_size=16, num_epochs=1,
        model_args=(model_args if model_args is not None
                    else _preset_model_args("large_unet")),
        data=DataConfig(dataset="synthetic", synthetic_length=16,
                        image_size=size, augmentations_per_datapoint=0),
    )
    trainer = Trainer(cfg, make_artifacts=False)
    variables = {"params": trainer.state["params"],
                 "batch_stats": trainer.state["batch_stats"]}
    model = trainer.model

    @jax.jit
    def chain(images_u8):
        def body(_, img):
            logits = model.apply(variables, normalize_image(img), train=False)
            bump = (jnp.sum(logits).astype(jnp.int32) & 1).astype(jnp.uint8)
            return img ^ bump  # full-logits dependency; input varies per iter

        return lax.fori_loop(0, steps, body, images_u8)

    rng = np.random.default_rng(0)
    for batch, metric, report_latency in (
        (16, f"large_unet_{size}_infer_images_per_sec_per_chip", False),
        (1, f"large_unet_{size}_infer_batch1_latency_ms", True),
    ):
        images = jnp.asarray(
            rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
        )
        float(chain(images)[0, 0, 0, 0])  # compile + warm (real transfer)
        t0 = time.perf_counter()
        # Finish with a device->host read of an element that depends on the
        # whole chain: block_until_ready alone was measured returning early
        # on queued work (PERFORMANCE.md measurement caveat).
        float(chain(images)[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        value = (1e3 * dt / steps) if report_latency else steps * batch / dt
        print(json.dumps({
            "metric": metric,
            "value": round(value, 2),
            "unit": "ms" if report_latency else "images/sec/chip",
            "config": {"batch": batch, "size": size, "chained_steps": steps},
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
        model_args=_preset_model_args("large_unet"),
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
    which = sys.argv[1:] or ["clip", "prompt", "autoencoder", "infer", "sweep"]
    if "clip" in which:
        bench_clip_unet()
    if "prompt" in which:
        bench_prompt()
    if "autoencoder" in which:
        bench_autoencoder()
    if "infer" in which:
        bench_infer()
    if "sweep" in which:
        bench_sweep()

"""Profile the production train step on the real TPU and print the top ops.

Usage: python tools/profile_step.py [--batch 16] [--size 512] [--steps 5]
Writes an XProf trace then parses the op profile straight from the
trace protobufs (no TensorBoard UI needed).
"""
import argparse
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import glob
import gzip
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--logdir", default="/tmp/profile-step")
    ap.add_argument("--no-w2d", action="store_true")
    ap.add_argument("--w2d-impl", default="dense")
    ap.add_argument("--l1f2", action="store_true",
                    help="fold level 1 at f/2 (the bench.py default)")
    ap.add_argument("--model", default="large_unet")
    ap.add_argument("--geometry", default="gather")
    ap.add_argument("--loss", default=None,
                    help="override (mse for the autoencoder config; "
                         "hybrid_binary is implied by --model "
                         "clip_unet_prompt)")
    ap.add_argument("--augs", type=int, default=4)
    ap.add_argument("--preset", default=None,
                    help="derive model/loss/model_args from this production "
                         "preset (config.preset) so the profiled step IS the "
                         "preset-configured one; --batch/--size/--augs still "
                         "apply")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from image_segmentation_tpu.config import DataConfig, TrainConfig, preset
    from image_segmentation_tpu.engine.train import Trainer

    data_cfg = DataConfig(
        dataset="synthetic", synthetic_length=args.batch,
        image_size=args.size, augmentations_per_datapoint=args.augs,
    )
    if args.preset:
        cfg = dataclasses.replace(
            preset(args.preset), batch_size=args.batch, num_epochs=1,
            data=data_cfg,
        )
        args.model = cfg.model
    else:
        loss = args.loss or {
            "autoencoder": "mse", "clip_unet_prompt": "hybrid_binary",
        }.get(args.model, "hybrid")
        cfg = TrainConfig(
            model=args.model,
            loss=loss,
            batch_size=args.batch,
            num_epochs=1,
            model_args=(
                {} if args.no_w2d
                else {"w2d_level0": True, "w2d_impl": args.w2d_impl,
                      **({"w2d_level1_fold2": True} if args.l1f2 else {})}
            ),
            data=data_cfg,
        )
    trainer = Trainer(cfg, make_artifacts=False)
    if args.geometry != "gather":
        from image_segmentation_tpu.ops import augment as aug_ops
        trainer.augmentor = aug_ops.DataAugmentor(4, geometry=args.geometry)
        trainer._train_step = trainer._build_train_step()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8))
    if trainer.task == "prompt":
        # The prompt task consumes RAW palette masks (the prompt heatmap and
        # binary label are derived on device, data/prompts.py).
        from image_segmentation_tpu.data import records
        palette = np.array(
            [0, records.CAT_PALETTE, records.DOG_PALETTE,
             records.UNCERTAIN_PALETTE], dtype=np.uint8,
        )
        masks = jnp.asarray(
            palette[rng.integers(0, 4, (args.batch, args.size, args.size))]
        )
    else:
        masks = jnp.asarray(rng.integers(0, 3, (args.batch, args.size, args.size)).astype(np.uint8))

    # Warmup (vary key per step: the axon runtime caches identical executions)
    for i in range(3):
        key = jax.random.PRNGKey(i)
        trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(10):
        key = jax.random.PRNGKey(100 + i)
        trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 10
    print(f"step: {dt*1e3:.1f} ms  ({args.batch/dt:.1f} img/s)")

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        for i in range(args.steps):
            key = jax.random.PRNGKey(200 + i)
            trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
        jax.block_until_ready(loss)

    # Parse the op profile straight from the xplane.pb (the
    # tensorboard_plugin_profile converter is broken on this toolchain:
    # _pywrap_profiler has no xspace_to_tools_data).  Needs
    # PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the proto import.
    from tools.parse_profile import op_table
    agg, info = op_table(args.logdir, args.steps)
    total = sum(agg.values()) or 1
    print(f"\ntotal device op time: {total/1e12/args.steps*1e3:.1f} ms/step")
    print(f"{'time%':>6} {'ms/step':>8}  op")
    for name, t in agg.most_common(25):
        st = info[name]
        desc = str(st.get("long_name") or st.get("tf_op") or "")
        print(f"{100*t/total:6.2f} {t/1e12/args.steps*1e3:8.2f}  "
              f"{name[:40]:42s} {desc[:90]}")


if __name__ == "__main__":
    main()

"""Profile the training hot loop to a TensorBoard/XProf trace.

Reference: scripts/profiler.py (torch.profiler template; unrunnable there —
broken imports).  Here:

    python -m scripts.profiler --preset smoke --steps 10 --log-dir ./profile-log
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="smoke")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--log-dir", default="./profile-log")
    args = ap.parse_args()

    import jax

    from image_segmentation_tpu.config import preset
    from image_segmentation_tpu.engine.train import Trainer
    from image_segmentation_tpu.utils import profiling

    cfg = preset(args.preset)
    trainer = Trainer(cfg, make_artifacts=False)
    train_pipe, _ = trainer._pipelines()
    batches = list(train_pipe.epoch(0))
    images, masks = batches[0]

    # compile outside the trace
    key = jax.random.PRNGKey(0)
    trainer.state, loss = trainer._train_step(trainer.state, images, masks, key)
    jax.block_until_ready(loss)

    meter = profiling.ThroughputMeter()
    meter.start()
    with profiling.trace(args.log_dir):
        for i in range(args.steps):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            trainer.state, loss = trainer._train_step(
                trainer.state, images, masks, key
            )
        jax.block_until_ready(loss)
    rate = meter.stop(args.steps * cfg.batch_size)
    print(f"Rate: {rate:.1f} datapoints/s")
    print(profiling.format_memory_report())
    print(f"trace -> {args.log_dir}")


if __name__ == "__main__":
    main()

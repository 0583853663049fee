"""Distributed data-parallel training entry point.

The reference needs torchrun + NCCL process groups + DistributedSampler +
a separate DistributedTrainingWrapper (scripts/train_distributed.py,
models/model_wrappers.py:795-1050).  Here the SAME Trainer covers every
topology: the batch axis shards over all attached devices of the mesh, and
XLA inserts the gradient all-reduce over ICI.  This entry point exists for
CLI parity; it simply forwards to scripts.train with the requested mesh
shape and (optionally) multi-host initialization.

    python -m scripts.train_distributed --preset unet --epochs 2
    python -m scripts.train_distributed --preset large_unet --model-shards 2
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="unet")
    ap.add_argument("--epochs", type=int, default=2)  # reference trains 2
    ap.add_argument("--model-shards", type=int, default=1,
                    help="tensor-parallel shards (the reference is DP-only)")
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() for multi-host")
    # The torchrun-args form (reference train_distributed.py:13-20 reads
    # RANK/WORLD_SIZE/MASTER_ADDR from the torchrun env; here they are
    # explicit flags, one process launched per host, no launcher needed).
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="rendezvous address (implies --multihost)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args, extra = ap.parse_known_args()

    if args.coordinator and (
        args.num_processes is None or args.process_id is None
    ):
        ap.error("--coordinator requires --num-processes and --process-id")

    if args.multihost or args.coordinator:
        from image_segmentation_tpu.parallel.mesh import distributed_init

        distributed_init(
            force=True,
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from image_segmentation_tpu.config import preset
    from image_segmentation_tpu.engine.train import Trainer

    cfg = preset(args.preset)
    cfg.num_epochs = args.epochs
    cfg.n_model_shards = args.model_shards
    trainer = Trainer(cfg)
    out = trainer.train(verbose=True)
    last = out["history"][-1]
    print(
        f"done: mesh={dict(trainer.mesh.shape)} epochs={args.epochs} "
        f"val_iou={last['val_iou']:.4f}"
    )


if __name__ == "__main__":
    main()

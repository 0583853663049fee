"""Universal training entry point.

Replaces the reference's per-model literal-config scripts
(training_scripts/train_{Unet,Large_Unet,CLIP_Unet,CLIP_RES,CLIP_autoencoder}.py,
scripts/model_train.py, scripts/train_autoencoder.py, scripts/prompt_train.py)
with one CLI over the typed presets:

    python -m scripts.train --preset unet --epochs 200
    python -m scripts.train --preset prompt
    python -m scripts.train --preset smoke --dataset synthetic

Distributed data-parallel training needs NO separate entry point (the
reference needed torchrun + scripts/train_distributed.py): the same Trainer
shards the batch over every attached device/host automatically.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="unet",
                    help="unet | large_unet | clip_unet | clip_res | "
                         "clip_autoencoder | autoencoder | prompt | smoke")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--dataset", default=None, help="oxford-pet | synthetic")
    ap.add_argument("--dataset-loc", default=None)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--resume", default=None, help="checkpoint .npz to resume from")
    args = ap.parse_args()

    from image_segmentation_tpu.config import preset
    from image_segmentation_tpu.engine.train import Trainer

    cfg = preset(args.preset)
    if args.epochs is not None:
        cfg.num_epochs = args.epochs
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size
    if args.dataset is not None:
        cfg.data.dataset = args.dataset
    if args.dataset_loc is not None:
        cfg.data.dataset_loc = args.dataset_loc
    if args.save_dir is not None:
        cfg.save_dir = args.save_dir
    if args.seed is not None:
        cfg.seed = args.seed

    trainer = Trainer(cfg)
    if args.resume:
        trainer.restore(args.resume)
    out = trainer.train()
    last = out["history"][-1]
    print(
        f"done: epoch={last['epoch']} train_loss={last['train_loss']:.4f} "
        f"val_iou={last['val_iou']:.4f} rate={last['rate']:.1f} datapoints/s"
    )


if __name__ == "__main__":
    main()

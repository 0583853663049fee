"""Evaluation / robustness entry point.

Replaces reference scripts/model_test.py + scripts/robustness_evaluation.py:

    python -m scripts.evaluate --preset clip_unet --ckpt run-001/model_200.npz \
        --robustness                 # float-space battery -> augmentation-results/
    python -m scripts.evaluate --preset clip_unet --ckpt ... \
        --robustness-int             # integer-space grid -> results/robustness_scores.csv
    python -m scripts.evaluate --preset clip_unet --ckpt ... --plot
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="clip_unet")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--robustness", action="store_true",
                    help="float-space battery -> augmentation-results/*.csv")
    ap.add_argument("--robustness-int", action="store_true",
                    help="integer-space grid -> results/robustness_scores.csv")
    ap.add_argument("--plot", action="store_true",
                    help="save a 4-sample prediction overlay grid")
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_segmentation_tpu.config import preset
    from image_segmentation_tpu.engine.evaluate import Evaluator
    from image_segmentation_tpu.engine.train import Trainer, _dataset_from_config
    from image_segmentation_tpu.utils import plotting

    cfg = preset(args.preset)
    if args.dataset is not None:
        cfg.data.dataset = args.dataset
    trainer = Trainer(cfg, make_artifacts=False)
    trainer.restore(args.ckpt)
    test_data = _dataset_from_config(cfg, args.split, False)

    ev = Evaluator(
        trainer.model,
        jax.device_get(trainer.state),
        test_data,
        batch_size=args.batch_size,
        binary=cfg.loss == "hybrid_binary",
    )
    print("clean:", ev.test())
    if args.robustness:
        ev.test_robustness(os.path.join(args.out_dir, "augmentation-results"))
        print("float battery -> augmentation-results/")
    if args.robustness_int:
        csv_path = os.path.join(args.out_dir, "results/robustness_scores.csv")
        ev.robustness_evaluation(csv_path)
        print(f"integer battery -> {csv_path}")
    if args.plot:
        idx = np.random.default_rng(0).choice(len(test_data), 4, replace=False)
        images = test_data.images[idx].astype(np.float32) / 255.0
        logits = trainer.model.apply(
            {"params": trainer.state["params"],
             "batch_stats": trainer.state["batch_stats"]},
            jnp.asarray(images), train=False,
        )
        path = plotting.plot_segmentations(
            images, np.asarray(logits),
            save_path=os.path.join(args.out_dir, "results/predictions.png"),
        )
        print(f"prediction overlays -> {path}")


if __name__ == "__main__":
    main()

"""Plotting entry point.

Replaces reference scripts/plot_train_val_loss.py,
plot_robustness_evaluation.py, plot_perturbations.py, plot_autoencoder.py:

    python -m scripts.plot_results loss saved-models/UNet/run-001/loss.csv
    python -m scripts.plot_results robustness results/robustness_scores.csv
    python -m scripts.plot_results perturbations --name gaussian_noise --param 10
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_loss = sub.add_parser("loss")
    p_loss.add_argument("csv")
    p_loss.add_argument("--out", default="results/plots/loss.png")

    p_rob = sub.add_parser("robustness")
    p_rob.add_argument("csv")
    p_rob.add_argument("--out-dir", default="results/plots")

    p_pert = sub.add_parser("perturbations")
    p_pert.add_argument("--name", default="gaussian_noise")
    p_pert.add_argument("--param", type=float, default=10.0)
    p_pert.add_argument("--out", default="results/plots/perturbation.png")

    args = ap.parse_args()

    from image_segmentation_tpu.utils import plotting

    if args.cmd == "loss":
        print(plotting.plot_loss_curves(args.csv, args.out))
    elif args.cmd == "robustness":
        for p in plotting.plot_robustness_scores(args.csv, args.out_dir):
            print(p)
    elif args.cmd == "perturbations":
        import jax
        import numpy as np

        from image_segmentation_tpu.data import perturbations as pert
        from image_segmentation_tpu.data.datasets import synthetic_dataset

        ds = synthetic_dataset(length=4, seed=0)
        import jax.numpy as jnp

        clean = jnp.asarray(ds.images)
        out = pert.apply_perturbation(
            args.name, jax.random.PRNGKey(0), clean, args.param
        )
        print(
            plotting.plot_perturbation_examples(
                np.asarray(clean), np.asarray(out), args.out
            )
        )


if __name__ == "__main__":
    main()

"""Visual/manual sanity check of the prompt-generation path.

Reference: scripts/test_prompt_data.py (shape prints + matplotlib grid of
image / prompt heatmap / label, including the "class at the prompt pixel"
check, reference lines 36-49).

    python -m scripts.test_prompt_data --out results/plots/prompt_check.png
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="results/plots/prompt_check.png")
    ap.add_argument("--sigma", type=float, default=10.0)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--dataset-loc", default="Data/Oxford-IIIT-Pet-Augmented")
    args = ap.parse_args()

    import os

    import jax
    import numpy as np

    from image_segmentation_tpu.data import prompts
    from image_segmentation_tpu.data.datasets import (
        load_pet_dataset,
        synthetic_dataset,
    )

    if args.dataset == "synthetic":
        ds = synthetic_dataset(length=4, keep_raw_masks=True)
    else:
        ds = load_pet_dataset(
            split="validation", dataset_loc=args.dataset_loc, keep_raw_masks=True
        )

    import jax.numpy as jnp

    raw = jnp.asarray(ds.raw_masks[:4])
    heat, label = prompts.make_prompt_batch(jax.random.PRNGKey(0), raw, args.sigma)
    heat, label = np.asarray(heat)[..., 0], np.asarray(label)

    print("image:", ds.images[:4].shape, "prompt:", heat.shape, "label:", label.shape)
    for i in range(4):
        cy, cx = np.unravel_index(np.argmax(heat[i]), heat[i].shape)
        print(
            f"sample {i}: prompt peak at ({cy},{cx}); "
            f"label at peak = {label[i, cy, cx]} (must be 1.0)"
        )
        assert label[i, cy, cx] == 1.0

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(4, 3, figsize=(9, 12))
    for i in range(4):
        axes[i, 0].imshow(ds.images[i])
        axes[i, 0].set_title("image")
        axes[i, 1].imshow(heat[i], cmap="hot")
        axes[i, 1].set_title("prompt heatmap")
        axes[i, 2].imshow(label[i], cmap="gray")
        axes[i, 2].set_title("label mask")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=100)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()

"""Convert torch pretrained weights into framework checkpoints.

One-time converters for the frozen towers (SURVEY.md §7 "hard parts"):

    # CLIP ViT-B/32 (transformers)
    python -m scripts.convert_pretrained clip \
        --torch-state-dict clip_vision.pt --out clip_tower.npz

    # ResNet-34 IMAGENET1K_V1 (torchvision state-dict file)
    python -m scripts.convert_pretrained resnet34 \
        --torch-state-dict resnet34.pth --out resnet34.npz

The converters are the same code paths that are numerically parity-tested
against torch models in tests/test_clip_parity.py and tests/test_resnet.py;
this CLI just adds the file plumbing.  Inputs are plain ``torch.save``'d
state dicts (tensors are converted via .numpy(); no pickle of module code).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tower", choices=["clip", "resnet34"])
    ap.add_argument("--torch-state-dict", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import numpy as np
    import torch

    from image_segmentation_tpu.utils import checkpoint as ckpt_lib
    from image_segmentation_tpu.utils.torch_convert import strip_compile_prefix

    sd = torch.load(args.torch_state_dict, map_location="cpu", weights_only=True)
    sd = strip_compile_prefix({k: v.numpy() for k, v in sd.items()})

    if args.tower == "clip":
        from image_segmentation_tpu.models.clip import clip_params_from_torch

        tree = {"params": clip_params_from_torch(sd)}
    else:
        from image_segmentation_tpu.models.resnet import resnet34_params_from_torch

        params, stats = resnet34_params_from_torch(sd)
        tree = {"params": params, "batch_stats": stats}

    ckpt_lib.save_checkpoint(args.out, tree)
    n = sum(int(np.prod(p.shape)) for p in _leaves(tree))
    print(f"{args.tower}: {n:,} parameters -> {args.out}")


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()

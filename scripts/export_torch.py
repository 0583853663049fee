"""Export a training checkpoint as a torch state dict in the REFERENCE's
key layout (utils/torch_export.py) — the reverse of
scripts/convert_pretrained.py, closing the interop loop: weights trained
here load into the reference's torch UNet/LargeUNet (strict=True) or
ClipUnet (strict=False, vision tower + trunk + fusion keys; the unused
text tower has no counterpart), and into its huggingface-models bundle.

  python -m scripts.export_torch --ckpt <run>/model_200.npz \
      --model large_unet --out large_unet_state_dict.pt
"""

from __future__ import annotations

import argparse
from typing import Any, Dict


def unflatten(flat: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """'/'-joined checkpoint keys under ``prefix`` -> nested dict."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        if not key.startswith(prefix + "/"):
            continue
        node = tree
        parts = key[len(prefix) + 1:].split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="model_<epoch>.npz checkpoint")
    ap.add_argument("--model", required=True,
                    help="unet | large_unet | clip_unet")
    ap.add_argument("--out", required=True, help="output .pt path")
    args = ap.parse_args()

    import torch

    from image_segmentation_tpu.utils import torch_export as tx
    from image_segmentation_tpu.utils.checkpoint import load_checkpoint_flat

    if args.model not in tx.EXPORTERS:
        ap.error(f"--model must be one of {sorted(tx.EXPORTERS)}")

    flat = load_checkpoint_flat(args.ckpt)
    params = unflatten(flat, "params")
    batch_stats = unflatten(flat, "batch_stats")
    sd = tx.EXPORTERS[args.model](params, batch_stats)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()

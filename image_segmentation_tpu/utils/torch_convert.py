"""torch state-dict -> flax parameter conversion helpers.

Used by the one-time pretrained-weight converters (CLIP ViT-B/32, ResNet34 —
SURVEY.md §7 "hard parts") and by the numerical parity tests.

Layout rules (empirically validated in tests/test_block_parity.py):

- Conv2d:            torch (O, I, kH, kW)    -> flax (kH, kW, I, O)
- ConvTranspose2d:   torch (I, O, kH, kW)    -> flax (kH, kW, I, O) with the
                     SPATIAL DIMS FLIPPED (flax ConvTranspose computes a
                     fractionally-strided conv without kernel mirroring,
                     torch computes the conv gradient).
- Linear:            torch (O, I)            -> flax (I, O)
- BatchNorm2d:       weight/bias -> scale/bias params; running_mean/var ->
                     batch_stats mean/var.

All inputs/outputs are plain numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def bn_params(prefix: str, sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def bn_stats(prefix: str, sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def conv_params(prefix: str, sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {"kernel": conv_kernel(np.asarray(sd[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def conv_transpose_params(
    prefix: str, sd: Mapping[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    out = {"kernel": conv_transpose_kernel(np.asarray(sd[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def linear_params(prefix: str, sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {"kernel": linear_kernel(np.asarray(sd[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def strip_compile_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove torch.compile's '_orig_mod.' prefix (reference
    model_wrappers.py:326-332, huggingface-models/ClipUnet/load_model.py)."""
    return {
        (k[len("_orig_mod."):] if k.startswith("_orig_mod.") else k): v
        for k, v in sd.items()
    }


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def conv_block_params(prefix: str, sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ConvBlock's nn.Sequential indices (processing_blocks.py:42-49):
    0 conv, 1 bn, 3 conv, 4 bn -> our conv1/bn1/conv2/bn2."""
    return {
        "conv1": conv_params(_join(prefix, "conv.0"), sd),
        "bn1": bn_params(_join(prefix, "conv.1"), sd),
        "conv2": conv_params(_join(prefix, "conv.3"), sd),
        "bn2": bn_params(_join(prefix, "conv.4"), sd),
    }


def conv_block_stats(prefix: str, sd: Mapping[str, np.ndarray]) -> Dict:
    return {
        "bn1": bn_stats(_join(prefix, "conv.1"), sd),
        "bn2": bn_stats(_join(prefix, "conv.4"), sd),
    }

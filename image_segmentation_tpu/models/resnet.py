"""ResNet-34 spatial feature extractor in NHWC.

Replaces the reference's torchvision backbone
(``ResNet34FeatureExtractor``, processing_blocks.py:236-285): a standard
BasicBlock ResNet-34 with the classifier head removed, emitting
(B, H/32, W/32, 512) feature maps.

:func:`resnet34_params_from_torch` converts a torchvision-style state dict
(``conv1.weight``, ``layer{1..4}.{i}.conv{1,2}.weight``, ``bn*``,
``downsample.{0,1}``) so IMAGENET1K_V1 weights drop in when available;
tests validate numerical parity against an equivalently-wired torch model.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils import torch_convert as tc

BN_MOMENTUM = 0.9
BN_EPS = 1e-5

RESNET34_LAYERS = (3, 4, 6, 3)
RESNET34_WIDTHS = (64, 128, 256, 512)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name=name,
        )
        residual = x
        # torch pads (1,1) on both sides even at stride 2; flax 'SAME' would
        # pad (0,1) there, shifting the grid — use explicit padding.
        h = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(
            self.features, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = bn("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(h + residual)


class ResNet34Features(nn.Module):
    """conv7x7/2 -> maxpool3x3/2 -> 4 stages -> (B, H/32, W/32, 512)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn1",
        )(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (blocks, width) in enumerate(
            zip(RESNET34_LAYERS, RESNET34_WIDTHS), start=1
        ):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 1) else 1
                h = BasicBlock(
                    width, stride, dtype=self.dtype, name=f"layer{stage}_{b}"
                )(h, train=train)
        return h


def resnet34_params_from_torch(sd: Mapping[str, np.ndarray]):
    """torchvision resnet34 state dict -> (params, batch_stats) pytrees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {"conv1": tc.conv_params("conv1", sd)}
    stats: Dict[str, Any] = {"bn1": tc.bn_stats("bn1", sd)}
    params["bn1"] = tc.bn_params("bn1", sd)
    for stage, blocks in enumerate(RESNET34_LAYERS, start=1):
        for b in range(blocks):
            base = f"layer{stage}.{b}"
            name = f"layer{stage}_{b}"
            p = {
                "conv1": tc.conv_params(f"{base}.conv1", sd),
                "bn1": tc.bn_params(f"{base}.bn1", sd),
                "conv2": tc.conv_params(f"{base}.conv2", sd),
                "bn2": tc.bn_params(f"{base}.bn2", sd),
            }
            s = {
                "bn1": tc.bn_stats(f"{base}.bn1", sd),
                "bn2": tc.bn_stats(f"{base}.bn2", sd),
            }
            if f"{base}.downsample.0.weight" in sd:
                p["downsample_conv"] = tc.conv_params(f"{base}.downsample.0", sd)
                p["downsample_bn"] = tc.bn_params(f"{base}.downsample.1", sd)
                s["downsample_bn"] = tc.bn_stats(f"{base}.downsample.1", sd)
            params[name] = p
            stats[name] = s
    return params, stats

"""CLIP ViT-B/32 vision tower in JAX (frozen feature extractor).

Replaces the reference's HF ``CLIPModel.get_image_features`` path
(processing_blocks.py:173-233): a ViT-B/32 vision transformer whose pooled
(class-token, post-layernorm) output is projected to a 512-d embedding.

- :func:`clip_preprocess`: batched resize-to-224 (bilinear antialias) +
  CLIP mean/std normalization.  The reference resizes PER IMAGE in a Python
  loop (processing_blocks.py:162-170); here it is one fused device op.
- :class:`ClipVisionTower`: ViT-B/32 with quick-GELU, matching the
  ``transformers`` CLIPVisionModelWithProjection graph layer by layer.
- :func:`clip_params_from_torch`: one-time converter from a transformers
  state dict (numerical parity verified in tests/test_clip_parity.py against
  a randomly initialized transformers model; pretrained weights convert with
  the same code path when available).

The tower is frozen by default (reference ClipFeatureExtractor(train=False),
processing_blocks.py:197-220): wrap params in ``jax.lax.stop_gradient`` at
the call site — models do this via ``freeze=True``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils import torch_convert as tc

CLIP_IMAGE_SIZE = 224
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)  # processing_blocks.py:204
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)  # processing_blocks.py:205


def clip_preprocess(images: jax.Array) -> jax.Array:
    """[0,1] float NHWC (any HxW) -> normalized (B,224,224,3).

    torchvision Resize on tensors uses bilinear+antialias; jax.image.resize
    antialiases when downscaling, giving distribution-level parity.
    """
    b, h, w, c = images.shape
    if (h, w) != (CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE):
        images = jax.image.resize(
            images,
            (b, CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE, c),
            method="bilinear",
        )
    mean = jnp.asarray(CLIP_MEAN, images.dtype)
    std = jnp.asarray(CLIP_STD, images.dtype)
    return (images - mean) / std


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    hidden: int = 768
    heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, l, d = x.shape
        dh = self.hidden // self.heads
        dense = lambda name: nn.Dense(
            self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(x) * (dh ** -0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(b, l, self.heads, dh).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhld,bhmd->bhlm", split(q), split(k))
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", w, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return dense("out_proj")(out)


class ClipEncoderLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    mlp_dim: int = 3072
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        h = ln("layer_norm1")(x)
        x = x + ClipAttention(self.hidden, self.heads, self.dtype, name="self_attn")(h)
        h = ln("layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class ClipVisionTower(nn.Module):
    """ViT-B/32 vision encoder + visual projection (get_image_features)."""

    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch: int = 32
    proj_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: normalized (B, 224, 224, 3) -> (B, proj_dim) embeddings."""
        b = pixels.shape[0]
        x = nn.Conv(
            self.hidden,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixels.astype(self.dtype))
        x = x.reshape(b, -1, self.hidden)  # (B, 49, H)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden,)
        )
        cls = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.hidden))
        x = jnp.concatenate([cls, x], axis=1)  # (B, 50, H)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (x.shape[1], self.hidden),
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layernorm")(x)
        for i in range(self.layers):
            x = ClipEncoderLayer(
                self.hidden, self.heads, self.mlp_dim, self.dtype, name=f"layer_{i}"
            )(x)
        pooled = x[:, 0]
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")(
            pooled
        )
        proj = nn.Dense(
            self.proj_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
        )(pooled)
        return proj.astype(jnp.float32)


def clip_params_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """transformers CLIPVisionModelWithProjection state dict -> flax params.

    Accepts either a full CLIPModel state dict (keys under ``vision_model.``/
    ``visual_projection.``) or the vision-only model's.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vm = "vision_model."
    params: Dict[str, Any] = {}
    params["patch_embedding"] = {
        "kernel": tc.conv_kernel(sd[vm + "embeddings.patch_embedding.weight"])
    }
    params["class_embedding"] = sd[vm + "embeddings.class_embedding"]
    params["position_embedding"] = sd[vm + "embeddings.position_embedding.weight"]
    # transformers spells it 'pre_layrnorm'
    pre = vm + ("pre_layrnorm" if vm + "pre_layrnorm.weight" in sd else "pre_layernorm")
    params["pre_layernorm"] = {
        "scale": sd[pre + ".weight"],
        "bias": sd[pre + ".bias"],
    }
    i = 0
    while vm + f"encoder.layers.{i}.layer_norm1.weight" in sd:
        base = vm + f"encoder.layers.{i}."
        layer: Dict[str, Any] = {
            "layer_norm1": {
                "scale": sd[base + "layer_norm1.weight"],
                "bias": sd[base + "layer_norm1.bias"],
            },
            "layer_norm2": {
                "scale": sd[base + "layer_norm2.weight"],
                "bias": sd[base + "layer_norm2.bias"],
            },
            "self_attn": {
                name: tc.linear_params(base + f"self_attn.{name}", sd)
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "fc1": tc.linear_params(base + "mlp.fc1", sd),
            "fc2": tc.linear_params(base + "mlp.fc2", sd),
        }
        params[f"layer_{i}"] = layer
        i += 1
    params["post_layernorm"] = {
        "scale": sd[vm + "post_layernorm.weight"],
        "bias": sd[vm + "post_layernorm.bias"],
    }
    params["visual_projection"] = {
        "kernel": tc.linear_kernel(sd["visual_projection.weight"])
    }
    return params

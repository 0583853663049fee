"""Generic image-encoder (+) prompt-encoder bottleneck fusion.

Reference ``models/prompt_encoder.py``: a small PromptEncoder v1 (1-channel
heatmap -> 3 downsamples -> (B, H/8, W/8, out), prompt_encoder.py:13-24) and
``SegmentationModelWithPrompt`` (prompt_encoder.py:28-56) that fuses ANY
image encoder's bottleneck with the prompt embedding by channel-concat +
1x1 conv ("concat") or elementwise add ("add"), then decodes.  The
reference's own __main__ is broken (it imports the empty models/autoencoder
and a nonexistent SegmentationDecoderSkip — SURVEY.md §7); this is the
working realization wired to the classical autoencoder's Encoder/Decoder.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .autoencoder import Decoder, Encoder
from .blocks import ConvBlock, ConvBlockDownsample


class PromptEncoderV1(nn.Module):
    """prompt_encoder.py:13-24: 1ch -> 32 -> 64 -> 128 downsamples -> ConvBlock(out)."""

    out_features: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, prompt: jax.Array, *, train: bool = False) -> jax.Array:
        if prompt.ndim == 3:
            prompt = prompt[..., None]
        h = ConvBlockDownsample(32, dtype=self.dtype, name="enc1")(
            prompt.astype(self.dtype), train=train
        )
        h = ConvBlockDownsample(64, dtype=self.dtype, name="enc2")(h, train=train)
        h = ConvBlockDownsample(128, dtype=self.dtype, name="enc3")(h, train=train)
        return ConvBlock(self.out_features, dtype=self.dtype, name="conv")(
            h, train=train
        )


class SegmentationModelWithPrompt(nn.Module):
    """prompt_encoder.py:28-56: encoder bottleneck (+) prompt embedding ->
    decoder.  fusion: "concat" (channel concat + 1x1 conv back to the
    bottleneck width) or "add"."""

    out_channels: int = 1
    fusion: str = "concat"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, prompt: jax.Array, *, train: bool = False
    ) -> jax.Array:
        feats = Encoder(dtype=self.dtype, name="image_encoder")(x, train=train)
        bottleneck = feats["bottleneck"]  # (B, H/8, W/8, 64)
        prompt_emb = PromptEncoderV1(
            bottleneck.shape[-1], dtype=self.dtype, name="prompt_encoder"
        )(prompt, train=train)

        if self.fusion == "concat":
            fused = jnp.concatenate(
                [bottleneck, prompt_emb.astype(bottleneck.dtype)], axis=-1
            )
            fused = nn.Conv(
                bottleneck.shape[-1], (1, 1), padding="VALID",
                dtype=self.dtype, name="fusion_conv",
            )(fused)
        elif self.fusion == "add":
            fused = bottleneck + prompt_emb.astype(bottleneck.dtype)
        else:
            raise ValueError(f"unknown fusion {self.fusion!r}")

        return Decoder(self.out_channels, dtype=self.dtype, name="decoder")(
            fused, train=train
        )


from .registry import register  # noqa: E402

register("prompt_fusion")(lambda **kw: SegmentationModelWithPrompt(**kw))

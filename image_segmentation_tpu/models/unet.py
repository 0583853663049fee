"""U-Net family, NHWC / bf16.

TPU-native re-design of reference ``models/UNet.py``:

- :class:`UNet`      ~ reference ``UNet``      (``UNet.py:7-76``):
  1x1 input conv -> enc 64/128/256 (3 downsamples) -> bottleneck 512 ->
  4 skip decoders 256/128/64/32 -> 1x1 output conv, identity activation
  (logits out).
- :class:`LargeUNet` ~ reference ``LargeUNet`` (``UNet.py:78-148``):
  4 downsamples, bottleneck 1024, 5 skip decoders.

Both emit raw logits; any output activation (e.g. sigmoid for the
autoencoder) is a config-level choice, as in the reference
(``UNet.py:36,57`` ``activation=nn.Identity()``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBlock, ConvBlockDownsample, ConvBlockUpsampleSkip


class UNet(nn.Module):
    """3-downsample U-Net (reference models/UNet.py:7-76)."""

    out_channels: int = 3
    dtype: Any = jnp.bfloat16
    # Channel plan of the reference: stem 32, encoders (64, 128, 256),
    # bottleneck 512, decoders mirror the encoders back down to 32.
    stem_features: int = 32
    encoder_features: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        stem = nn.Conv(
            self.stem_features, (1, 1), padding="VALID", dtype=self.dtype, name="input"
        )(x)

        skips = [stem]
        h = stem
        for i, feats in enumerate(self.encoder_features):
            h = ConvBlockDownsample(feats, dtype=self.dtype, name=f"enc{i + 1}")(
                h, train=train
            )
            skips.append(h)

        h = ConvBlock(
            2 * self.encoder_features[-1], dtype=self.dtype, name="bottleneck"
        )(h, train=train)

        # Decoder: reference dec1..dec4 pair with skips [enc3, enc2, enc1, stem]
        # (UNet.py:69-72).  Note enc_i outputs are post-pool, so dec1's skip
        # (enc3) lives at the SAME resolution as the bottleneck: dec1's 2x
        # upsample is immediately resized back down by the align-corners
        # interpolation (processing_blocks.py:107).  We reproduce that wiring
        # exactly; the resolutions realign from dec2 onward.
        dec_feats = list(self.encoder_features[::-1]) + [self.stem_features]
        for i, feats in enumerate(dec_feats):
            skip = skips[-(i + 1)]
            h = ConvBlockUpsampleSkip(feats, dtype=self.dtype, name=f"dec{i + 1}")(
                h, skip, train=train
            )

        out = nn.Conv(
            self.out_channels, (1, 1), padding="VALID", dtype=self.dtype, name="out"
        )(h)
        return out.astype(jnp.float32)


class LargeUNet(UNet):
    """4-downsample U-Net with a 1024-wide bottleneck (reference models/UNet.py:78-148)."""

    encoder_features: Sequence[int] = (64, 128, 256, 512)

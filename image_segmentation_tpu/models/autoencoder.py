"""Convolutional autoencoder (reference models/classical_autoencoder.py).

Note: the reference ALSO ships an empty ``models/autoencoder.py`` that four
scripts import from (broken imports, SURVEY.md §7 known defects).  This
module is the working implementation under the name those scripts expect.

- :class:`Encoder`  ~ classical_autoencoder.py:13-35 — 1x1 stem to 32,
  3 downsamples 64/64/64, bottleneck ConvBlock(64); returns a dict of every
  skip level for reuse as a segmentation backbone (line 35).
- :class:`Decoder`  ~ classical_autoencoder.py:38-51 — 3 skip-less upsamples,
  1x1 out conv.
- :class:`Autoencoder` ~ classical_autoencoder.py:53-64 — sigmoid output.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import folded
from .blocks import ConvBlock, ConvBlockDownsample, ConvBlockUpsample


class Encoder(nn.Module):
    dtype: Any = jnp.bfloat16
    # width-to-depth fast paths (exact; shared parameter tree,
    # tests/test_folded.py): level 0, plus level 1 at f/2 (the
    # relayout-free chain, models/unet.py w2d_level1_fold2)
    w2d_level0: bool = False
    w2d_level1_fold2: bool = False
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        x = x.astype(self.dtype)
        f = folded.FOLD
        if self.w2d_level0 and x.shape[2] % (2 * f) == 0:
            b, hh, ww, cin = x.shape
            stem4 = folded.Folded1x1(cin, 32, f, self.dtype, name="input")(
                x.reshape(b, hh, ww // f, f * cin)
            )
            h4 = folded.FoldedConvBlockDownsample(
                32, 64, f, self.dtype, impl=self.w2d_impl, name="enc1"
            )(stem4, train=train)
            # unfolded views for the contract; unused entries are dead code
            # under jit and cost nothing.
            x0 = folded.d2w(stem4, 32, f)
            x1 = folded.d2w(h4, 64, f // 2)
            if self.w2d_level1_fold2 and f == 4:
                # enc2 at f/2 consumes enc1's pool output in its natural
                # folded layout; the f/2 pool output is already unfolded.
                x2 = folded.FoldedConvBlockDownsample(
                    64, 64, f // 2, self.dtype, impl=self.w2d_impl,
                    name="enc2"
                )(h4, train=train)
            else:
                x2 = ConvBlockDownsample(64, dtype=self.dtype, name="enc2")(
                    x1, train=train
                )
        else:
            x0 = nn.Conv(32, (1, 1), padding="VALID", dtype=self.dtype, name="input")(x)
            x1 = ConvBlockDownsample(64, dtype=self.dtype, name="enc1")(x0, train=train)
            x2 = ConvBlockDownsample(64, dtype=self.dtype, name="enc2")(x1, train=train)
        x3 = ConvBlockDownsample(64, dtype=self.dtype, name="enc3")(x2, train=train)
        bottleneck = ConvBlock(64, dtype=self.dtype, name="bottleneck")(
            x3, train=train
        )
        return {
            "x0": x0,
            "enc1": x1,
            "enc2": x2,
            "enc3": x3,
            "bottleneck": bottleneck,
        }


class Decoder(nn.Module):
    out_channels: int = 3
    dtype: Any = jnp.bfloat16
    w2d_level0: bool = False
    w2d_level1_fold2: bool = False
    # fold-2 for dec1 too (the 64x64 level).  Probed in isolation
    # (tools/exp_ae_l2_fold.py, 2026-08-20): dec1 folded 1.87 vs 2.03
    # ms/iter at default kernel gates; enc3's equivalent was a wash
    # (1.87 vs 1.90) and is NOT taken.  Output unfolds by a pure reshape
    # that cancels against dec2's internal refold.
    w2d_level2_fold2: bool = False
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(self, bottleneck: jax.Array, *, train: bool = False) -> jax.Array:
        f = folded.FOLD
        # The modulus term is INTENTIONALLY vacuous at FOLD=4 (f//4 == 1,
        # like dec2's below): FoldedConvBlockUpsample at fold f//2 reshapes
        # its unfolded input by m = f//4 slots per output column, which any
        # width satisfies at m=1.  Kept so a future FOLD != 4 states the
        # true requirement instead of silently miscompiling.
        if (
            self.w2d_level0 and self.w2d_level2_fold2 and f == 4
            and bottleneck.shape[2] % max(f // 4, 1) == 0
        ):
            d1 = folded.d2w(
                folded.FoldedConvBlockUpsample(
                    64, 64, f // 2, self.dtype, impl=self.w2d_impl,
                    name="dec1",
                )(bottleneck, train=train),
                64, f // 2,
            )
        else:
            d1 = ConvBlockUpsample(64, dtype=self.dtype, name="dec1")(
                bottleneck, train=train
            )
        # fold f//2 transpose from unfolded d1 reshapes by m = f//4
        # (trivially satisfiable at FOLD=4, but keep the true requirement).
        fold2 = (
            self.w2d_level0 and self.w2d_level1_fold2 and f == 4
            and d1.shape[2] % max(f // 4, 1) == 0
        )
        if fold2:
            # dec2 at f/2: folded transpose from the unfolded d1; its
            # fold-f/2 output is exactly the slot-major view dec3's
            # up-conv consumes (in_folded).
            d2 = folded.FoldedConvBlockUpsample(
                64, 64, f // 2, self.dtype, impl=self.w2d_impl, name="dec2"
            )(d1, train=train)
        else:
            d2 = ConvBlockUpsample(64, dtype=self.dtype, name="dec2")(d1, train=train)
        # non-fold2 dec3 reshapes the unfolded d2 by m = f//2.
        if self.w2d_level0 and (fold2 or d2.shape[2] % (f // 2) == 0):
            d3_4 = folded.FoldedConvBlockUpsample(
                64, 32, f, self.dtype, impl=self.w2d_impl,
                in_folded=fold2, name="dec3"
            )(d2, train=train)
            out4 = folded.Folded1x1(
                32, self.out_channels, f, self.dtype, name="out"
            )(d3_4)
            return folded.d2w(out4, self.out_channels, f).astype(jnp.float32)
        d3 = ConvBlockUpsample(32, dtype=self.dtype, name="dec3")(d2, train=train)
        out = nn.Conv(
            self.out_channels, (1, 1), padding="VALID", dtype=self.dtype, name="out"
        )(d3)
        return out.astype(jnp.float32)


class Autoencoder(nn.Module):
    """Reconstruction AE; sigmoid output (classical_autoencoder.py:64)."""

    out_channels: int = 3
    dtype: Any = jnp.bfloat16
    w2d_level0: bool = False
    w2d_level1_fold2: bool = False
    w2d_level2_fold2: bool = False
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        # One gate for BOTH halves (the encoder's width requirement is the
        # stricter one), so a fallback never produces a mixed
        # standard-encoder / folded-decoder model.
        use_fold = self.w2d_level0 and x.shape[2] % (2 * folded.FOLD) == 0
        feats = Encoder(
            dtype=self.dtype, w2d_level0=use_fold,
            w2d_level1_fold2=self.w2d_level1_fold2,
            w2d_impl=self.w2d_impl, name="encoder",
        )(x, train=train)
        out = Decoder(
            self.out_channels, dtype=self.dtype, w2d_level0=use_fold,
            w2d_level1_fold2=self.w2d_level1_fold2,
            w2d_level2_fold2=self.w2d_level2_fold2,
            w2d_impl=self.w2d_impl, name="decoder",
        )(feats["bottleneck"], train=train)
        return jax.nn.sigmoid(out)

"""Width-to-depth ("w2d") folded convolution blocks.

Small-channel convolutions at high resolution are the throughput bottleneck
on TPU: a 3x3 C=32 conv at 512^2 runs at ~4% of bf16 peak because (a) 32
channels underfill the 128-wide MXU and (b) XLA lane-pads NHWC buffers
32 -> 128 lanes (4x HBM traffic).  Folding the WIDTH axis by F=4 into the
channel axis makes every level-0 tensor 128-channel:

    x4[b, h, J, (t, c)] = x[b, h, 4J + t, c]             (a free reshape)

A 3x3 conv becomes an EXACT (3, 3) conv over folded channels with a
block-sparse expanded kernel W'[a, b', (qx, ci), (px, co)] = w[a, dj, ci, co]
where dj = 4(b'-1) + qx - px when |dj| <= 1 (else zero) — 4x the dense
FLOPs, but measured 2.3x faster on the dominant blocks (14 -> 6 ms per
level-0 ConvBlock pair, v5e, batch 16 @ 512^2) because the MXU-efficiency
and traffic wins dominate.

Every module declares the SAME parameter tree as its unfolded counterpart
(nn.Conv / nn.ConvTranspose / nn.BatchNorm), so folded and standard models
share checkpoints; numerical equivalence is asserted in
tests/test_folded.py.  BatchNorm reduces over the fold axis via a 5-D view
(identical statistics); 2x2 max-pool becomes a fold-slot max + regroup.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import BN_EPS, BN_MOMENTUM

FOLD = 4  # 4 * 32 channels == the 128-lane register width


def w2d(x: jax.Array, f: int = FOLD) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/f, f*C); slot-major channel layout (t, c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // f, f * c)


def d2w(x: jax.Array, c: int, f: int = FOLD) -> jax.Array:
    b, h, wp, fc = x.shape
    return x.reshape(b, h, wp * f, c)


def _expand_kernel(w: jax.Array, f: int) -> jax.Array:
    """(kh, 3, Ci, Co) -> (kh, 3, f*Ci, f*Co) folded 3x3 kernel."""
    kh, kw, ci, co = w.shape
    assert kw == 3, "w2d expansion is derived for 3x3 kernels"
    t = np.zeros((3, f, f, 3), np.float32)  # b', qx, px, dj+1
    for bb in range(3):
        for qx in range(f):
            for px in range(f):
                dj = f * (bb - 1) + qx - px
                if -1 <= dj <= 1:
                    t[bb, qx, px, dj + 1] = 1.0
    tj = jnp.asarray(t, w.dtype)
    wp = jnp.einsum("bqpD,aDio->abqipo", tj, w)
    return wp.reshape(kh, 3, f * ci, f * co)


class FoldedConv(nn.Module):
    """3x3 SAME conv on a folded tensor; param tree identical to nn.Conv."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x4: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        wp = _expand_kernel(kernel.astype(self.dtype), self.fold)
        out = jax.lax.conv_general_dilated(
            x4.astype(self.dtype),
            wp,
            (1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + jnp.tile(bias.astype(self.dtype), self.fold)


class FoldedConvBlock(nn.Module):
    """[FoldedConv -> BN -> ReLU] x2; tree identical to blocks.ConvBlock."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x4: jax.Array, *, train: bool = False) -> jax.Array:
        f, feats = self.fold, self.features

        def bn(name, h4):
            b, hh, wp, _ = h4.shape
            h5 = h4.reshape(b, hh, wp, f, feats)
            out = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name=name,
            )(h5)
            return out.reshape(b, hh, wp, f * feats)

        h = FoldedConv(self.in_features, feats, f, self.dtype, name="conv1")(x4)
        h = nn.relu(bn("bn1", h))
        h = FoldedConv(feats, feats, f, self.dtype, name="conv2")(h)
        return nn.relu(bn("bn2", h))


def folded_max_pool_2x2(x4: jax.Array, features: int, fold: int = FOLD) -> jax.Array:
    """2x2/2 max-pool on a folded tensor, output re-folded by the same factor.

    Width pairs live inside fold slots ((0,1),(2,3) of a 4-slot block); after
    pooling, adjacent half-blocks are re-paired so the fold factor stays 4.
    """
    b, h, wp, fc = x4.shape
    half = fold // 2
    x6 = x4.reshape(b, h, wp, half, 2, features)
    x5 = jnp.max(x6, axis=4)                                # width pairs
    x5 = jnp.max(x5.reshape(b, h // 2, 2, wp, half, features), axis=2)  # height
    # regroup: pooled col = half*J + t  ->  new block J'=J//2, slot (J%2, t)
    x6 = x5.reshape(b, h // 2, wp // 2, 2, half, features)
    return x6.reshape(b, h // 2, wp // 2, fold * features)


class FoldedConvTranspose2x2(nn.Module):
    """ConvTranspose(k=2, s=2) from an UNFOLDED input straight to a FOLDED
    output; param tree identical to nn.ConvTranspose.  One matmul over a
    reindexed kernel + a folded row interleave — the unfolded small-channel
    tensor never materializes."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, Hin, Win, Cin) -> folded (B, 2*Hin, 2*Win/f, f*Co)."""
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        f = self.fold
        m = f // 2  # input fold factor: each input col feeds 2 output cols
        b, hin, win, cin = x.shape
        co = self.features
        k = kernel.astype(self.dtype)

        xf = x.astype(self.dtype).reshape(b, hin, win // m, m * cin)
        # flax ConvTranspose(k=2, s=2, VALID) applies the kernel FLIPPED:
        # out[2i+dy, 2j+dx] = in[i, j] * K[1-dy, 1-dx]  (probed empirically).
        k = k[::-1, ::-1]
        # out[2i+dy, f*J + v, o] = sum_c K'[dy, dx, c, o] * x[i, m*J + m', c]
        # with v = 2*m' + dx.  Build K'[(m', c), (dy, v, o)] (block sparse).
        kp = jnp.zeros((m, cin, 2, f, co), self.dtype)
        for mm in range(m):
            for dx in range(2):
                v = 2 * mm + dx
                # K[dy, dx, c, o] -> slot [mm, c, dy, v, o]
                kp = kp.at[mm, :, :, v, :].set(jnp.transpose(k[:, dx], (1, 0, 2)))
        e = xf @ kp.reshape(m * cin, 2 * f * co)  # (B, Hin, Win/m, 2*f*Co)
        e = e.reshape(b, hin, win // m, 2, f * co)
        e = jnp.transpose(e, (0, 1, 3, 2, 4))  # (B, Hin, dy, Win/m, f*Co)
        out = e.reshape(b, 2 * hin, win // m, f * co)
        return out + jnp.tile(bias.astype(self.dtype), f)


def folded_concat(a4: jax.Array, b4: jax.Array, ca: int, cb: int,
                  fold: int = FOLD) -> jax.Array:
    """Channel-concat two folded tensors (per fold slot)."""
    b, h, wp, _ = a4.shape
    a5 = a4.reshape(b, h, wp, fold, ca)
    b5 = b4.reshape(b, h, wp, fold, cb)
    return jnp.concatenate([a5, b5], axis=-1).reshape(b, h, wp, fold * (ca + cb))


class FoldedConvBlockDownsample(nn.Module):
    """Folded ConvBlock + folded 2x2 max-pool; tree == ConvBlockDownsample."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x4: jax.Array, *, train: bool = False) -> jax.Array:
        h = FoldedConvBlock(
            self.in_features, self.features, self.fold, self.dtype,
            name="conv_block",
        )(x4, train=train)
        return folded_max_pool_2x2(h, self.features, self.fold)


class FoldedConvBlockUpsampleSkip(nn.Module):
    """Folded ConvTranspose -> folded concat -> folded ConvBlock; tree ==
    ConvBlockUpsampleSkip.  Only valid when the upsampled map already matches
    the skip resolution (the full-resolution decoder level — where the
    reference's align-corners resize is the identity)."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, skip4: jax.Array, *, train: bool = False
    ) -> jax.Array:
        up4 = FoldedConvTranspose2x2(
            self.in_features, self.features, self.fold, self.dtype, name="up"
        )(x)
        assert up4.shape[:3] == skip4.shape[:3], (
            "folded decoder requires matching resolutions (resize would be "
            f"non-identity): {up4.shape} vs {skip4.shape}"
        )
        h = folded_concat(up4, skip4, self.features,
                          skip4.shape[-1] // self.fold, self.fold)
        return FoldedConvBlock(
            2 * self.features, self.features, self.fold, self.dtype,
            name="conv_block",
        )(h, train=train)

"""Fused Pallas preprocessing kernel: uint8 -> jittered+blurred float image.

The BASELINE.json north star calls for the preprocessing/augmentation
pipeline as fused on-device Pallas kernels.  This kernel fuses, per image,
in a single VMEM residency (one HBM read of the uint8 image, one HBM write
of the float result — the XLA version materializes the intermediate between
the two separable blur passes):

    normalize (/255) -> brightness -> contrast (per-image gray mean)
    -> saturation -> hue (HSV roundtrip) -> separable 5-tap Gaussian blur

Per-sample random factors are sampled OUTSIDE with jax.random (same
distributions as ops/augment.py — the two backends are interchangeable and
tested equal); the kernel consumes them via scalar prefetch.  The geometric
ops (flip/rotation gather) stay in XLA where the gather engine lives.

Grid: one program per image; whole-image blocks (a 512x512x3 fp32 image is
3 MiB — comfortably inside the ~16 MiB VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GRAY_R, _GRAY_G, _GRAY_B = 0.299, 0.587, 0.114


def _kernel(factors_ref, img_ref, out_ref):
    """factors_ref: SMEM (N, 9) [fb, fc, fs, fh, w0..w4] (full array —
    blocked SMEM slices are not supported); img block (1,H,W,3) u8."""
    prog = pl.program_id(0)
    fb = factors_ref[prog, 0]
    fc = factors_ref[prog, 1]
    fs = factors_ref[prog, 2]
    fh = factors_ref[prog, 3]

    # Mosaic has no direct u8 -> f32 cast; hop through int32.
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)

    # brightness
    x = jnp.clip(x * fb, 0.0, 1.0)
    # contrast: blend with the mean gray of the brightened image
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    gray = _GRAY_R * r + _GRAY_G * g + _GRAY_B * b
    gray_mean = jnp.mean(gray)
    x = jnp.clip(fc * x + (1.0 - fc) * gray_mean, 0.0, 1.0)
    # saturation: blend with per-pixel gray
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    gray = (_GRAY_R * r + _GRAY_G * g + _GRAY_B * b)[..., None]
    x = jnp.clip(fs * x + (1.0 - fs) * gray, 0.0, 1.0)

    # hue: RGB -> HSV -> +fh -> RGB
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    # Order-based branch selection (see augment._rgb_to_hsv): equality with a
    # recomputed maxc is not fusion-stable and permutes channels when false.
    is_r = (r >= g) & (r >= b)
    is_g = jnp.logical_not(is_r) & (g >= b)
    h = jnp.where(is_r, bc - gc, jnp.where(is_g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    h = (h + fh) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    conds = [i == k for k in range(6)]
    r2 = jnp.select(conds, [v, q, p, p, t, v])
    g2 = jnp.select(conds, [t, v, v, q, p, p])
    b2 = jnp.select(conds, [p, p, t, v, v, q])
    x = jnp.clip(jnp.stack([r2, g2, b2], axis=-1), 0.0, 1.0)

    # separable 5-tap blur, reflect padding, both passes in VMEM
    w = [factors_ref[prog, 4 + k] for k in range(5)]

    def blur_axis(img, axis):
        # reflect padding: rows [2,1] on top, [-2,-3] at bottom
        def take(a, lo, hi):
            sl = [slice(None)] * 3
            sl[axis] = slice(lo, hi)
            return a[tuple(sl)]

        top = jnp.flip(take(img, 1, 3), axis=axis)
        bot = jnp.flip(take(img, -3, -1), axis=axis)
        p = jnp.concatenate([top, img, bot], axis=axis)
        length = img.shape[axis]
        total = jnp.zeros_like(img)
        for tap in range(5):
            total = total + take(p, tap, tap + length) * w[tap]
        return total

    x = blur_axis(blur_axis(x, 0), 1)
    out_ref[0] = x.astype(out_ref.dtype)


def pallas_preprocess(
    images_u8: jax.Array,
    jitter_factors: jax.Array,
    blur_weights: jax.Array,
    *,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused normalize+jitter+blur over a uint8 NHWC batch.

    jitter_factors: (N, 4) from augment.sample_jitter_factors;
    blur_weights:   (N, 5) from augment.sample_blur_weights.
    """
    n, h, w, c = images_u8.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    factors = jnp.concatenate(
        [jitter_factors.astype(jnp.float32), blur_weights.astype(jnp.float32)],
        axis=1,
    )  # (N, 9)

    # Factors ride in SMEM: VMEM blocks require the last two dims tiled
    # (8, 128) or full, which a (1, 9) slice of (N, 9) violates.
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), out_dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (N, 9) factor table
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(factors, images_u8)

"""Fused Pallas preprocessing kernel: uint8 -> jittered+blurred float image.

The BASELINE.json north star calls for the preprocessing/augmentation
pipeline as fused on-device Pallas kernels.  This kernel fuses, per image,
in a single VMEM residency (one HBM read of the uint8 image, one HBM write
of the float result — the XLA version materializes intermediates between
stages):

    normalize (/255) -> brightness -> contrast (per-image gray mean)
    -> saturation -> hue (HSV roundtrip) -> separable 5-tap Gaussian blur

Per-sample random factors are sampled OUTSIDE with jax.random (same
distributions as ops/augment.py — the two backends are interchangeable and
tested equal) and ride in SMEM blocks.  The geometric ops (flip/rotation
gather) stay in XLA where the gather engine lives.

Mosaic notes (hard-won):
- the channel dimension is processed as three (H, W) PLANES: (H, W, 3)
  arithmetic lane-pads 3 -> 128 and crashes/falls off supported paths;
- no direct u8 -> f32 cast (hop through int32);
- SMEM blocks must keep full trailing dims ((1, 1, 9) of an (N, 1, 9)
  table) and be indexed statically — dynamic program_id SMEM reads are
  rejected;
- jnp.select lowers through a bool argmax Mosaic lacks (nested wheres
  instead); jnp.flip (`rev`) is unimplemented (explicit slice stacks).

Status: numerically verified against the XLA pipeline in interpret mode
(tests/test_pallas_preprocess.py).  The v5e axon remote-compile toolchain
cannot compile it natively: round 1 hard-crashed the compile helper;
round 2's toolchain HANGS >25 min in Mosaic (repro: un-skip
tests/test_real_tpu_kernels.py::test_pallas_preprocess_native).  The
other three production Pallas kernels (folded conv fwd/dx/wgrad,
cross-attention) compile and pass on silicon, so the hang is specific to
this kernel's op mix (plane-wise HSV select chains are the prime
suspect).  The augmentor default stays backend="xla" (2.2 ms/batch at
16x512x512, off the critical path).  Revisit on a newer libtpu.

Grid: one program per image; whole-image blocks (a 512x512 fp32 plane is
1 MiB — three planes fit easily inside the ~16 MiB VMEM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GRAY_R, _GRAY_G, _GRAY_B = 0.299, 0.587, 0.114


def _kernel(factors_ref, img_ref, out_ref):
    """factors block: SMEM (1, 1, 9) [fb, fc, fs, fh, w0..w4];
    img block: VMEM (1, H, W, 3) u8; out block: (1, H, W, 3) float."""
    fb = factors_ref[0, 0, 0]
    fc = factors_ref[0, 0, 1]
    fs = factors_ref[0, 0, 2]
    fh = factors_ref[0, 0, 3]

    def plane(c):
        # u8 -> i32 -> f32 (no direct u8->f32 cast in Mosaic)
        return img_ref[0, :, :, c].astype(jnp.int32).astype(jnp.float32) * (
            1.0 / 255.0
        )

    r, g, b = plane(0), plane(1), plane(2)

    # brightness
    r = jnp.clip(r * fb, 0.0, 1.0)
    g = jnp.clip(g * fb, 0.0, 1.0)
    b = jnp.clip(b * fb, 0.0, 1.0)
    # contrast: blend with the mean gray of the brightened image
    gray = _GRAY_R * r + _GRAY_G * g + _GRAY_B * b
    gray_mean = jnp.mean(gray)
    r = jnp.clip(fc * r + (1.0 - fc) * gray_mean, 0.0, 1.0)
    g = jnp.clip(fc * g + (1.0 - fc) * gray_mean, 0.0, 1.0)
    b = jnp.clip(fc * b + (1.0 - fc) * gray_mean, 0.0, 1.0)
    # saturation: blend with per-pixel gray
    gray = _GRAY_R * r + _GRAY_G * g + _GRAY_B * b
    r = jnp.clip(fs * r + (1.0 - fs) * gray, 0.0, 1.0)
    g = jnp.clip(fs * g + (1.0 - fs) * gray, 0.0, 1.0)
    b = jnp.clip(fs * b + (1.0 - fs) * gray, 0.0, 1.0)

    # hue: RGB -> HSV -> +fh -> RGB (all (H, W) planes)
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    # Order-based branch selection (see augment._rgb_to_hsv): equality with
    # a recomputed maxc is not fusion-stable and permutes channels.
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
    # nested wheres: jnp.select lowers through an argmax Mosaic lacks
    def sextant(c0, c1, c2, c3, c4, c5):
        out = c5
        for k, ck in ((4, c4), (3, c3), (2, c2), (1, c1), (0, c0)):
            out = jnp.where(i == k, ck, out)
        return out

    r = jnp.clip(sextant(v, q, p, p, t, v), 0.0, 1.0)
    g = jnp.clip(sextant(t, v, v, q, p, p), 0.0, 1.0)
    b = jnp.clip(sextant(p, p, t, v, v, q), 0.0, 1.0)

    # separable 5-tap blur per plane, reflect padding, both passes in VMEM
    w = [factors_ref[0, 0, 4 + k] for k in range(5)]

    def blur_plane(img):
        def blur_axis(a, axis):
            def take(arr, lo, hi):
                sl = [slice(None)] * 2
                sl[axis] = slice(lo, hi)
                return arr[tuple(sl)]

            # reflect pad of width 2 as explicit row stacks (Mosaic has no
            # `rev`): top rows [2, 1], bottom rows [-2, -3]
            top = jnp.concatenate([take(a, 2, 3), take(a, 1, 2)], axis=axis)
            bot = jnp.concatenate([take(a, -2, -1), take(a, -3, -2)], axis=axis)
            padded = jnp.concatenate([top, a, bot], axis=axis)
            length = a.shape[axis]
            total = jnp.zeros_like(a)
            for tap in range(5):
                total = total + take(padded, tap, tap + length) * w[tap]
            return total

        return blur_axis(blur_axis(img, 0), 1)

    r, g, b = blur_plane(r), blur_plane(g), blur_plane(b)
    out_ref[0, :, :, 0] = r.astype(out_ref.dtype)
    out_ref[0, :, :, 1] = g.astype(out_ref.dtype)
    out_ref[0, :, :, 2] = b.astype(out_ref.dtype)


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
    ).reshape(n, 1, 9)  # (N, 1, 9): blocked SMEM needs full trailing dims

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), out_dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 9), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(factors, images_u8)

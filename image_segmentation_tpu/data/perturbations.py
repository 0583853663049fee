"""Robustness perturbation battery, on-device and batched.

The reference implements the battery TWICE:

1. integer-space per-item dataset wrappers (customDatasets/perturbations.py)
   — uint8 round/clamp at every step; this path produces the published
   ``results/robustness_scores.csv`` artifact;
2. float-space batch ``nn.Module`` corruptions (processing_blocks.py:454-592)
   used by ``TestWrapper.test_robustness``.

Here both are fused device kernels over whole uint8 batches.  Rounding uses
round-half-to-even (numpy/jax default), matching ``torch.round``.

Integer-space fidelity notes (SURVEY.md §7 "hard parts"):
- noise:      u8 + N(0, std);  clamp(0,255) then round   (perturbations.py:44-46)
- blur:       N passes of 3x3 box filter; round then clamp per pass
              (perturbations.py:97-122)
- contrast:   u8 * factor; round then clamp               (perturbations.py:147-151)
- brightness: +offset: clamp then round / -offset: round then clamp
              (perturbations.py:229-230, 269-270)
- occlusion:  random square -> 0                          (perturbations.py:308-322)
- salt&pepper: round(amount*H*W) uniform pixel draws WITH replacement, each
  setting the whole channel to 0/255 with p=1/2, last draw winning
  (perturbations.py:366-377) — the traced scatter-max formulation in
  ``salt_pepper_draws``.  The iid-per-pixel ``salt_pepper`` remains for the
  float-space twin's semantics (processing_blocks.py:565-592).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Integer-space battery: uint8 NHWC in -> uint8 NHWC out
# ---------------------------------------------------------------------------


def _to_u8(x: jax.Array) -> jax.Array:
    return x.astype(jnp.uint8)


def gaussian_pixel_noise(key: jax.Array, images_u8: jax.Array, std: float) -> jax.Array:
    noise = jax.random.normal(key, images_u8.shape, jnp.float32) * std
    noisy = images_u8.astype(jnp.float32) + noise
    return _to_u8(jnp.round(jnp.clip(noisy, 0, 255)))


def _one_box_pass_u8(x_u8: jax.Array) -> jax.Array:
    """One 3x3 box-filter pass, round then clamp, integer space."""
    x = x_u8.astype(jnp.float32)
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # zero pad = F.conv2d pad=1
    acc = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.slice(
                p,
                (0, dy, dx, 0),
                (p.shape[0], dy + x.shape[1], dx + x.shape[2], p.shape[3]),
            )
    return _to_u8(jnp.clip(jnp.round(acc / 9.0), 0, 255))


def box_blur_passes(images_u8: jax.Array, num_passes: int) -> jax.Array:
    """num_passes x (3x3 box filter, round, clamp) in integer space."""
    out = images_u8
    for _ in range(int(num_passes)):
        out = _one_box_pass_u8(out)
    return out


def box_blur_passes_traced(
    images_u8: jax.Array, num_passes, max_passes: int
) -> jax.Array:
    """box_blur_passes with a TRACED pass count: runs ``max_passes``
    masked passes so every sweep point shares ONE compiled program (the
    static version recompiles the full evaluator per grid value — ~4 min
    of remote compile each on this toolchain).  Bit-identical to the
    static version for num_passes <= max_passes."""
    np_ = jnp.asarray(num_passes).astype(jnp.int32)

    def body(i, x):
        return jnp.where(i < np_, _one_box_pass_u8(x), x)

    return jax.lax.fori_loop(0, max_passes, body, images_u8)


def contrast_scale(images_u8: jax.Array, factor: float) -> jax.Array:
    scaled = images_u8.astype(jnp.float32) * factor
    return _to_u8(jnp.clip(jnp.round(scaled), 0, 255))


def brightness_shift(images_u8: jax.Array, offset, *, increase: bool = True) -> jax.Array:
    """Brightness +/- offset in int space.  ``offset`` may be a traced scalar
    (its magnitude); ``increase`` is static.  The reference clamps-then-rounds
    on increase but rounds-then-clamps on decrease (perturbations.py:229-230,
    269-270) — identical for integer offsets, preserved verbatim anyway."""
    x = images_u8.astype(jnp.float32)
    if increase:
        return _to_u8(jnp.round(jnp.clip(x + offset, 0, 255)))
    return _to_u8(jnp.clip(jnp.round(x - offset), 0, 255))


def occlusion(key: jax.Array, images_u8: jax.Array, square_size) -> jax.Array:
    """Random black square per batch item (perturbations.py:279-327).

    ``square_size`` may be a TRACED scalar: a size <= 0 yields an empty
    rectangle (yy >= y0 & yy < y0), i.e. the unperturbed image — the same
    result as the reference's early return, without a static branch.  A size
    that does not fit the image (>= H or W) likewise degenerates to a no-op,
    matching the reference's skip (perturbations.py:316)."""
    n, h, w, _ = images_u8.shape
    size = jnp.round(jnp.asarray(square_size)).astype(jnp.int32)
    fits = (size < h) & (size < w)
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (n,), 0, jnp.maximum(h - size + 1, 1))
    x0 = jax.random.randint(kx, (n,), 0, jnp.maximum(w - size + 1, 1))
    yy = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    inside = (
        (yy >= y0[:, None, None])
        & (yy < (y0 + size)[:, None, None])
        & (xx >= x0[:, None, None])
        & (xx < (x0 + size)[:, None, None])
        & fits
    )
    return jnp.where(inside[..., None], jnp.uint8(0), images_u8)


def salt_pepper(key: jax.Array, images_u8: jax.Array, amount) -> jax.Array:
    """Whole-pixel (all channels) salt/pepper with per-pixel prob ``amount``.

    The iid-per-pixel formulation (the reference's own float-space twin,
    processing_blocks.py:565-592).  ``amount`` may be traced; amount=0 is
    an exact identity (no u < 0)."""
    n, h, w, _ = images_u8.shape
    u = jax.random.uniform(key, (n, h, w, 1))
    out = jnp.where(u < amount / 2.0, jnp.uint8(0), images_u8)
    return jnp.where(u > 1.0 - amount / 2.0, jnp.uint8(255), out)


def salt_pepper_draws(
    key: jax.Array, images_u8: jax.Array, amount, max_amount: float
) -> jax.Array:
    """Salt/pepper with the reference's WITH-REPLACEMENT draw semantics
    (customDatasets/perturbations.py:366-377): round(amount*H*W) draws of a
    uniform pixel each, the whole channel set to 0 or 255 with p=1/2, a
    later draw overwriting an earlier one at the same pixel.

    Traced formulation: ``max_draws = round(max_amount*H*W)`` positions and
    coin flips are drawn up front; draws with index >= round(amount*H*W)
    are masked out, so every sweep point shares one compiled program (the
    traced-occlusion trick).  "Last draw wins" is computed exactly via a
    scatter-max of the draw index per pixel (well-defined under duplicate
    indices, unlike a plain scatter) followed by a gather of that draw's
    coin — bit-equal to applying the draws sequentially.

    ``amount`` may be traced; ``max_amount`` is static (the sweep grid max).
    """
    n, h, w, _ = images_u8.shape
    hw = h * w
    max_draws = int(round(float(max_amount) * hw))
    num = jnp.round(jnp.asarray(amount, jnp.float32) * hw).astype(jnp.int32)
    kpos, kval = jax.random.split(key)
    pos = jax.random.randint(kpos, (n, max_draws), 0, hw)
    salt = jax.random.bernoulli(kval, 0.5, (n, max_draws))
    draw_idx = jnp.arange(max_draws, dtype=jnp.int32)
    live_pos = jnp.where(draw_idx[None] < num, pos, hw)  # dead draws dropped

    def one(img_flat, posm, salt_i):
        best = jnp.full((hw,), -1, jnp.int32)
        best = best.at[posm].max(draw_idx, mode="drop")
        winner_salt = salt_i[jnp.maximum(best, 0)]
        pix = jnp.where(winner_salt, jnp.uint8(255), jnp.uint8(0))
        return jnp.where((best >= 0)[:, None], pix[:, None], img_flat)

    flat = images_u8.reshape(n, hw, images_u8.shape[-1])
    return jax.vmap(one)(flat, live_pos, salt).reshape(images_u8.shape)


# Blur pass-count / salt&pepper amount grids; max_passes / max_amount for
# the traced variants are DERIVED from these so extending a grid can never
# silently under-apply passes or truncate draws.
_INT_BLUR_PARAMS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
_FLOAT_BLUR_PARAMS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
_INT_SP_PARAMS = [0.00, 0.02, 0.04, 0.06, 0.08, 0.10, 0.12, 0.14, 0.16, 0.18]

# Registry with the exact sweep grids of scripts/robustness_evaluation.py:59-92.
INT_SWEEPS: Dict[str, dict] = {
    "gaussian_noise": dict(
        params=[0, 2, 4, 6, 8, 10, 12, 14, 16, 18],
        fn=lambda key, img, p: gaussian_pixel_noise(key, img, p),
        random=True,
    ),
    "gaussian_blur": dict(
        params=_INT_BLUR_PARAMS,
        fn=lambda key, img, p: box_blur_passes_traced(
            img, p, max_passes=max(_INT_BLUR_PARAMS)
        ),
        random=False,
    ),
    "contrast_increase": dict(
        params=[1.0, 1.01, 1.02, 1.03, 1.04, 1.05, 1.1, 1.15, 1.2, 1.25],
        fn=lambda key, img, p: contrast_scale(img, p),
        random=False,
    ),
    "contrast_decrease": dict(
        params=[1.0, 0.95, 0.9, 0.85, 0.8, 0.6, 0.4, 0.3, 0.2, 0.1],
        fn=lambda key, img, p: contrast_scale(img, p),
        random=False,
    ),
    "brightness_increase": dict(
        params=[0, 5, 10, 15, 20, 25, 30, 35, 40, 45],
        fn=lambda key, img, p: brightness_shift(img, p, increase=True),
        random=False,
    ),
    "brightness_decrease": dict(
        params=[0, 5, 10, 15, 20, 25, 30, 35, 40, 45],
        fn=lambda key, img, p: brightness_shift(img, p, increase=False),
        random=False,
    ),
    "occlusion": dict(
        params=[0, 5, 10, 15, 20, 25, 30, 35, 40, 45],
        fn=lambda key, img, p: occlusion(key, img, p),
        random=True,
    ),
    "salt_pepper_noise": dict(
        params=_INT_SP_PARAMS,
        fn=lambda key, img, p: salt_pepper_draws(
            key, img, p, max_amount=max(_INT_SP_PARAMS)
        ),
        random=True,
    ),
}


def apply_perturbation(
    name: str, key: jax.Array, images_u8: jax.Array, param
) -> jax.Array:
    """Apply one named integer-space perturbation to a uint8 batch."""
    return INT_SWEEPS[name]["fn"](key, images_u8, param)


# ---------------------------------------------------------------------------
# Float-space battery (processing_blocks.py:454-592), for TestWrapper parity.
# Operates on [0,1] float NHWC batches.
# ---------------------------------------------------------------------------


def float_gaussian_noise(key, images, std):
    """std is in INT units; scaled by /255 (processing_blocks.py:454-474)."""
    noise = jax.random.normal(key, images.shape, images.dtype) * (std / 255.0)
    return jnp.clip(images + noise, 0.0, 1.0)


def _one_box_pass_float(out: jax.Array) -> jax.Array:
    """One kornia-style 3x3 box pass: REFLECT padding, no rounding."""
    p = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    acc = jnp.zeros_like(out)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.slice(
                p,
                (0, dy, dx, 0),
                (p.shape[0], dy + out.shape[1], dx + out.shape[2], p.shape[3]),
            )
    return acc / 9.0


def float_repeated_blur(images, times: int):
    """kornia box_blur(3,3) x N, float, REFLECT padding, no rounding."""
    out = images
    for _ in range(int(times)):
        out = _one_box_pass_float(out)
    return out


def float_repeated_blur_traced(images, times, max_passes: int):
    """float_repeated_blur with a TRACED count (one compile per battery,
    not per grid value; bit-identical for times <= max_passes)."""
    t = jnp.asarray(times).astype(jnp.int32)

    def body(i, x):
        return jnp.where(i < t, _one_box_pass_float(x), x)

    return jax.lax.fori_loop(0, max_passes, body, images)


def float_contrast(images, factor):
    return jnp.clip(images * factor, 0.0, 1.0)


def float_brightness(images, offset):
    """offset in INT units, /255 (processing_blocks.py:521-539)."""
    return jnp.clip(images + offset / 255.0, 0.0, 1.0)


def float_occlusion(key, images, size):
    """``size`` may be traced; size <= 0 degenerates to an empty
    rectangle (unperturbed), matching the reference's early return."""
    n, h, w, _ = images.shape
    size = jnp.round(jnp.asarray(size)).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (n,), 0, jnp.maximum(h - size, 0) + 1)
    x0 = jax.random.randint(kx, (n,), 0, jnp.maximum(w - size, 0) + 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    inside = (
        (yy >= y0[:, None, None])
        & (yy < (y0 + size)[:, None, None])
        & (xx >= x0[:, None, None])
        & (xx < (x0 + size)[:, None, None])
    )
    return jnp.where(inside[..., None], 0.0, images)


def float_salt_pepper(key, images, amount):
    n, h, w, _ = images.shape
    u = jax.random.uniform(key, (n, 1, h, w)).transpose(0, 2, 3, 1)
    salt = (u < amount / 2.0).astype(images.dtype)
    pepper = (u > 1.0 - amount / 2.0).astype(images.dtype)
    return images * (1.0 - salt - pepper) + salt


# TestWrapper.test_robustness sweep grids (model_wrappers.py:524-764).
FLOAT_SWEEPS: Dict[str, dict] = {
    "gaussian_noise": dict(
        params=[1e-6, 2, 4, 6, 8, 10, 12, 14, 16, 18],
        fn=float_gaussian_noise,
        random=True,
    ),
    "blur": dict(
        params=_FLOAT_BLUR_PARAMS,
        fn=lambda key, img, p: float_repeated_blur_traced(
            img, p, max_passes=max(_FLOAT_BLUR_PARAMS)
        ),
        random=False,
    ),
    "contrast_increase": dict(
        params=[1.0, 1.01, 1.02, 1.03, 1.04, 1.05, 1.1, 1.15, 1.2, 1.25],
        fn=lambda key, img, p: float_contrast(img, p),
        random=False,
    ),
    "contrast_decrease": dict(
        params=[1.0, 0.95, 0.90, 0.85, 0.80, 0.60, 0.40, 0.30, 0.20, 0.10],
        fn=lambda key, img, p: float_contrast(img, p),
        random=False,
    ),
    "brightness_increase": dict(
        params=[0, 5, 10, 15, 20, 25, 30, 35, 40, 45],
        fn=lambda key, img, p: float_brightness(img, p),
        random=False,
    ),
    "brightness_decrease": dict(
        params=[0, 5, 10, 15, 20, 25, 30, 35, 40, 45],
        fn=lambda key, img, p: float_brightness(img, -p),
        random=False,
    ),
    "occlusion": dict(
        params=[0, 5, 10, 15, 20, 25, 30, 35, 40, 45],
        fn=lambda key, img, p: float_occlusion(key, img, p),
        random=True,
    ),
    "salt_pepper": dict(
        params=[0.00, 0.02, 0.04, 0.06, 0.08, 0.10, 0.12, 0.14, 0.16],
        fn=float_salt_pepper,
        random=True,
    ),
}

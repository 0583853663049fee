"""On-device batch augmentation (the reference's kornia GPU augmentor).

TPU re-design of ``DataAugmentor`` / ``DataAugmentorPrompt``
(reference processing_blocks.py:324-451):

- joint geometric transforms on image+mask(+prompt): per-sample random
  horizontal flip (p=0.5) and rotation with angle ~ U(-90, 90) deg, nearest
  resampling, zero fill (kornia RandomHorizontalFlip + RandomRotation(90,
  resample='nearest', same_on_batch=False), processing_blocks.py:350-353)
- image-only colour transforms: ColorJitter(brightness=0.4, contrast=0.3,
  saturation=0.2, hue=0.2) followed by a 5x5 Gaussian blur with
  sigma ~ U(0.1, 2.0), p=1 (processing_blocks.py:355-358)
- every (augmentations_per_datapoint+1)-th batch POSITION is restored to its
  clean value (processing_blocks.py:374-384)

Everything is traced into the jitted train step: no host round-trips, and the
whole augmentor fuses with the normalization of the uint8 input batch.

Stochastic parity is distribution-level ("bit-for-intent"): jax.random
replaces torch RNG; jitter factors use the torchvision/kornia ranges
(factor ~ U(1-x, 1+x), hue ~ U(-h, h)); jitter sub-ops apply in fixed order
brightness->contrast->saturation->hue rather than kornia's random order.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def normalize_image(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC -> [0,1] float (reference datasets.py:115, done on device)."""
    return images_u8.astype(dtype) / 255.0


# ---------------------------------------------------------------------------
# Geometric ops (joint image+mask)
# ---------------------------------------------------------------------------


def _rotate_nearest_indices(h: int, w: int, angle_deg: jax.Array):
    """Inverse-map source indices for a rotation about the image centre.

    Returns (src_y, src_x, valid) with shape (h, w); nearest-neighbour
    (round), valid=False outside the source -> zero fill.
    """
    # torchvision/kornia convention: positive angle rotates counter-clockwise
    # (in the displayed image).  With the y axis pointing down, the inverse
    # map for the output grid is a rotation by +angle in (x, y) coords.
    theta = angle_deg * (jnp.pi / 180.0)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_x = cos * xx - sin * yy + cx
    src_y = sin * xx + cos * yy + cy
    sy = jnp.round(src_y).astype(jnp.int32)
    sx = jnp.round(src_x).astype(jnp.int32)
    valid = (sy >= 0) & (sy < h) & (sx >= 0) & (sx < w)
    return jnp.clip(sy, 0, h - 1), jnp.clip(sx, 0, w - 1), valid


def _rotate_one(chw: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """Rotate one (H, W, C) tensor, nearest, zero fill."""
    h, w, _ = chw.shape
    sy, sx, valid = _rotate_nearest_indices(h, w, angle_deg)
    out = chw[sy, sx, :]
    return jnp.where(valid[..., None], out, jnp.zeros((), chw.dtype))


def random_geometric(
    key: jax.Array,
    stacked: jax.Array,
    max_degrees: float = 90.0,
) -> jax.Array:
    """Per-sample random hflip + rotation on an NHWC stack (image||mask||...).

    All channels share the SAME geometry per sample, reproducing the
    reference's channel-concatenation trick (processing_blocks.py:362-364).
    """
    n, h, w, c = stacked.shape
    k_flip, k_rot = jax.random.split(key)
    flip = jax.random.bernoulli(k_flip, 0.5, (n,))
    angles = jax.random.uniform(
        k_rot, (n,), minval=-max_degrees, maxval=max_degrees
    )
    flipped = jnp.where(flip[:, None, None, None], stacked[:, :, ::-1, :], stacked)
    return jax.vmap(_rotate_one)(flipped, angles)


# ---------------------------------------------------------------------------
# Colour ops (image only)
# ---------------------------------------------------------------------------

_GRAY_WEIGHTS = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _rgb_to_hsv(rgb: jax.Array):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.clip(maxc, 1e-12, None), 0.0)
    safe = jnp.clip(delta, 1e-12, None)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack(
        [
            jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v]),
            jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p]),
            jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q]),
        ],
        axis=-1,
    )
    return rgb


def color_jitter(
    key: jax.Array,
    images: jax.Array,
    brightness: float = 0.4,
    contrast: float = 0.3,
    saturation: float = 0.2,
    hue: float = 0.2,
) -> jax.Array:
    """Per-sample colour jitter with torchvision factor semantics.

    brightness/contrast/saturation factors ~ U(max(0,1-x), 1+x) multiply /
    blend; hue shift ~ U(-hue, hue) as a fraction of the colour wheel.
    """
    n = images.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)

    def factors(k, x):
        return jax.random.uniform(
            k, (n, 1, 1, 1), minval=max(0.0, 1.0 - x), maxval=1.0 + x
        )

    img = images
    # brightness
    img = jnp.clip(img * factors(kb, brightness), 0.0, 1.0)
    # contrast: blend with the per-image mean of the grayscale channel
    gray_mean = jnp.mean(
        jnp.einsum("nhwc,c->nhw", img, _GRAY_WEIGHTS), axis=(1, 2)
    )[:, None, None, None]
    fc = factors(kc, contrast)
    img = jnp.clip(fc * img + (1.0 - fc) * gray_mean, 0.0, 1.0)
    # saturation: blend with per-pixel grayscale
    gray = jnp.einsum("nhwc,c->nhw", img, _GRAY_WEIGHTS)[..., None]
    fs = factors(ks, saturation)
    img = jnp.clip(fs * img + (1.0 - fs) * gray, 0.0, 1.0)
    # hue
    fh = jax.random.uniform(kh, (n, 1, 1), minval=-hue, maxval=hue)
    h, s, v = _rgb_to_hsv(img)
    img = _hsv_to_rgb((h + fh) % 1.0, s, v)
    return jnp.clip(img, 0.0, 1.0)


def gaussian_blur_5x5(key: jax.Array, images: jax.Array,
                      sigma_range: Tuple[float, float] = (0.1, 2.0)) -> jax.Array:
    """Per-sample separable 5x5 Gaussian blur, sigma ~ U(lo, hi), p=1.

    kornia RandomGaussianBlur((5,5), (0.1,2.0), p=1) with reflect padding.
    Implemented as 5-tap shift-and-weight along H then W so each sample can
    carry its own kernel without per-sample convolutions (stays on the VPU,
    fuses with the jitter ops).
    """
    n = images.shape[0]
    sigma = jax.random.uniform(
        key, (n,), minval=sigma_range[0], maxval=sigma_range[1]
    )
    x = jnp.arange(-2, 3, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x[None, :] / sigma[:, None]) ** 2)
    k = k / jnp.sum(k, axis=1, keepdims=True)  # (N, 5)

    def blur_axis(img, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (2, 2)
        p = jnp.pad(img, pad, mode="reflect")
        total = jnp.zeros_like(img)
        length = img.shape[axis]
        for tap in range(5):
            sl = jax.lax.slice_in_dim(p, tap, tap + length, axis=axis)
            total = total + sl * k[:, tap][:, None, None, None]
        return total

    return blur_axis(blur_axis(images, 1), 2)


# ---------------------------------------------------------------------------
# The augmentor
# ---------------------------------------------------------------------------


def _clean_slots(n: int, step: int) -> jax.Array:
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return (pos % step) == 0


@dataclasses.dataclass(frozen=True)
class DataAugmentor:
    """Reference DataAugmentor (processing_blocks.py:324-384) as a pure fn.

    __call__(key, images_f32, masks_int) -> (aug_images, aug_masks); every
    (aug+1)-th batch position keeps its clean value.
    """

    augmentations_per_datapoint: int = 4
    max_degrees: float = 90.0

    def __call__(
        self, key: jax.Array, images: jax.Array, masks: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        kg, kc, kb = jax.random.split(key, 3)
        stacked = jnp.concatenate(
            [images, masks.astype(images.dtype)[..., None]], axis=-1
        )
        stacked = random_geometric(kg, stacked, self.max_degrees)
        aug_images = stacked[..., :3]
        aug_masks = stacked[..., 3].astype(masks.dtype)
        aug_images = color_jitter(kc, aug_images)
        aug_images = gaussian_blur_5x5(kb, aug_images)

        clean = _clean_slots(images.shape[0], self.augmentations_per_datapoint + 1)
        out_images = jnp.where(clean[:, None, None, None], images, aug_images)
        out_masks = jnp.where(clean[:, None, None], masks, aug_masks)
        return out_images, out_masks


@dataclasses.dataclass(frozen=True)
class DataAugmentorPrompt:
    """Reference DataAugmentorPrompt (processing_blocks.py:386-451).

    Joint geometry on image+mask+prompt; colour ops on the image only.
    """

    augmentations_per_datapoint: int = 4
    max_degrees: float = 90.0

    def __call__(
        self,
        key: jax.Array,
        images: jax.Array,
        masks: jax.Array,
        prompts: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        kg, kc, kb = jax.random.split(key, 3)
        masks_c = masks.astype(images.dtype)[..., None]
        prompts_c = prompts if prompts.ndim == 4 else prompts[..., None]
        stacked = jnp.concatenate([images, masks_c, prompts_c], axis=-1)
        stacked = random_geometric(kg, stacked, self.max_degrees)
        aug_images = stacked[..., :3]
        aug_masks = stacked[..., 3].astype(masks.dtype)
        aug_prompts = stacked[..., 4:5]
        aug_images = color_jitter(kc, aug_images)
        aug_images = gaussian_blur_5x5(kb, aug_images)

        clean = _clean_slots(images.shape[0], self.augmentations_per_datapoint + 1)
        out_images = jnp.where(clean[:, None, None, None], images, aug_images)
        out_masks = jnp.where(clean[:, None, None], masks, aug_masks)
        out_prompts = jnp.where(clean[:, None, None, None], prompts_c, aug_prompts)
        return out_images, out_masks, out_prompts

"""Point-prompt ("SAM-style") generation, fully on device.

Reference ``PromptImageDataset`` (customDatasets/datasets.py:473-610) does
this per item on the host: pick cat/dog/background weighted by pixel count,
sample a random pixel of that class, emit a one-hot point or 2-D Gaussian
heatmap, label = binary mask of the chosen class.

TPU re-design: the whole sampler is a vectorized jax function over a palette
mask BATCH, traceable inside the jitted train step — prompts are regenerated
every epoch for free (the reference fixes one prompt per item per epoch; ours
matches that distribution and improves coverage).

Semantics preserved (datasets.py:535-610):
- class weights = pixel counts of (cat, dog, background) where background is
  EVERYTHING that is not cat/dog (the uncertain ring counts as background);
- pixel choice uniform over the chosen class's pixels;
- fallback centre pixel (128,128) when the chosen class has no pixels;
- heatmap = exp(-dist^2 / (2 sigma^2)) or a single 1.0 at the point.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import records


def palette_to_class_masks(raw_masks_u8: jax.Array):
    """(B,H,W) palette uint8 -> (cat, dog, bg) float32 masks."""
    cat = (raw_masks_u8 == records.CAT_PALETTE).astype(jnp.float32)
    dog = (raw_masks_u8 == records.DOG_PALETTE).astype(jnp.float32)
    bg = 1.0 - (cat + dog)
    return cat, dog, bg


def make_prompt_batch(
    key: jax.Array,
    raw_masks_u8: jax.Array,
    gaussian_sigma: Optional[float] = 10.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (prompt_maps (B,H,W,1) float32, labels (B,H,W) float32)."""
    b, h, w = raw_masks_u8.shape
    cat, dog, bg = palette_to_class_masks(raw_masks_u8)
    masks = jnp.stack([cat, dog, bg], axis=1)  # (B, 3, H, W)

    kc, kp = jax.random.split(key)
    counts = jnp.sum(masks, axis=(2, 3))  # (B, 3)
    logits = jnp.log(jnp.clip(counts, 1e-9, None))
    choice = jax.random.categorical(kc, logits, axis=-1)  # (B,)
    sel = jnp.take_along_axis(masks, choice[:, None, None, None], axis=1)[:, 0]

    # Uniform pixel among sel==1: iid uniform scores, masked argmax.
    u = jax.random.uniform(kp, (b, h, w))
    scored = jnp.where(sel > 0, u, -1.0)
    flat = scored.reshape(b, -1)
    idx = jnp.argmax(flat, axis=-1)
    has_pixels = jnp.max(flat, axis=-1) >= 0.0
    cy = jnp.where(has_pixels, idx // w, h // 2)
    cx = jnp.where(has_pixels, idx % w, w // 2)

    yy = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    dy = yy - cy[:, None, None].astype(jnp.float32)
    dx = xx - cx[:, None, None].astype(jnp.float32)
    if gaussian_sigma is not None:
        heat = jnp.exp(-(dx * dx + dy * dy) / (2.0 * gaussian_sigma ** 2))
    else:
        heat = ((dy == 0) & (dx == 0)).astype(jnp.float32)

    return heat[..., None], sel

"""Fused Pallas preprocessing kernel vs the XLA augment ops (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.ops import augment
from image_segmentation_tpu.ops.pallas_preprocess import pallas_preprocess

KEY = jax.random.PRNGKey(3)
RNG = np.random.default_rng(0)


def batch(n=4, h=16, w=16):
    return jnp.asarray(RNG.integers(0, 256, (n, h, w, 3), dtype=np.uint8))


def factors(n):
    kj, kb = jax.random.split(KEY)
    return (
        augment.sample_jitter_factors(kj, n),
        augment.sample_blur_weights(kb, n),
    )


class TestKernelParity:
    @pytest.mark.parametrize("n,h,w", [(4, 16, 16), (2, 32, 8), (8, 8, 32)])
    def test_matches_xla_pipeline(self, n, h, w):
        imgs = jnp.asarray(RNG.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
        jf, bw = factors(n)
        ref = augment.apply_gaussian_blur_5x5(
            augment.apply_color_jitter(augment.normalize_image(imgs), jf), bw
        )
        out = pallas_preprocess(imgs, jf, bw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    def test_identity_factors(self):
        imgs = batch()
        ident = jnp.tile(jnp.asarray([[1.0, 1.0, 1.0, 0.0]]), (4, 1))
        delta = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 0.0, 0.0]]), (4, 1))
        out = pallas_preprocess(imgs, ident, delta)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(imgs) / 255.0, atol=2e-6
        )

    def test_output_dtype(self):
        imgs = batch()
        jf, bw = factors(4)
        out = pallas_preprocess(imgs, jf, bw, out_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16


class TestAugmentorBackend:
    def test_pallas_backend_matches_xla_backend(self):
        imgs = batch(n=6)
        masks = jnp.asarray(RNG.integers(0, 3, (6, 16, 16)).astype(np.uint8))
        a_xla = augment.DataAugmentor(2, backend="xla")
        a_pl = augment.DataAugmentor(2, backend="pallas")
        ix, mx = a_xla.apply_u8(KEY, imgs, masks)
        ip, mp = a_pl.apply_u8(KEY, imgs, masks)
        np.testing.assert_allclose(np.asarray(ip), np.asarray(ix), atol=2e-6)
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(mx))


def test_hsv_branch_selection_fusion_stable():
    """Regression: sextant selection must use order comparisons, not
    `maxc == r` equality (FMA refusion flips branches -> channel swaps)."""
    # Craft pixels where two channels are close and one dominates.
    x = np.array(
        [[[[0.67285, 0.20383, 0.02030], [0.5, 0.499999, 0.01]]]], np.float32
    )
    h, s, v = augment._rgb_to_hsv(jnp.asarray(x))
    back = augment._hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)

"""Equivalence of the Pallas shear-roll kernels (ops/pallas_roll.py) with
the XLA bit-rolled shift (ops/augment._row_shift) and of the full rotation
path with / without the Pallas kernels.

Reference semantics: kornia RandomRotation in the GPU DataAugmentor
(processing_blocks.py:350-353), re-derived as shears; these tests pin the
Pallas formulation to the existing XLA one bit-for-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.ops import augment as A
from image_segmentation_tpu.ops.pallas_roll import (
    pack_u8x4,
    pallas_col_shift,
    pallas_row_shift,
    unpack_u8x4,
)


@pytest.mark.parametrize("h,w", [(16, 16), (8, 24)])
def test_row_shift_matches_xla(h, w):
    rng = np.random.default_rng(0)
    n = 3
    x = jnp.asarray(rng.integers(0, 256, (n, h, w, 4), dtype=np.uint8))
    m = w // 2 - 1
    s = jnp.asarray(rng.integers(-m, m + 1, (n, h)), jnp.int32)

    ref = A._row_shift(x, s, m)
    out = unpack_u8x4(pallas_row_shift(pack_u8x4(x), s, interpret=True))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("h,w", [(16, 16), (24, 8)])
def test_col_shift_matches_xla(h, w):
    rng = np.random.default_rng(1)
    n = 3
    x = jnp.asarray(rng.integers(0, 256, (n, h, w, 4), dtype=np.uint8))
    m = h // 2 - 1
    s = jnp.asarray(rng.integers(-m, m + 1, (n, w)), jnp.int32)

    xt = jnp.swapaxes(x, 1, 2)
    ref = jnp.swapaxes(A._row_shift(xt, s, m), 1, 2)
    out = unpack_u8x4(pallas_col_shift(pack_u8x4(x), s, interpret=True))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_rotate_shear3_pallas_matches_xla(monkeypatch):
    rng = np.random.default_rng(2)
    n, h, w = 5, 32, 32
    stacked = jnp.asarray(rng.integers(0, 256, (n, h, w, 4), dtype=np.uint8))
    angles = jnp.asarray(rng.uniform(-90, 90, (n,)), jnp.float32)

    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "0")
    ref = A._rotate_shear3(stacked, angles)
    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "1")
    out = A._rotate_shear3(stacked, angles)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_augmentor_apply_u8_pallas_matches_xla(monkeypatch):
    rng = np.random.default_rng(3)
    n, h, w = 5, 32, 32
    images = jnp.asarray(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
    masks = jnp.asarray(rng.integers(0, 3, (n, h, w), dtype=np.uint8))
    aug = A.DataAugmentor(augmentations_per_datapoint=4)
    key = jax.random.PRNGKey(7)

    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "0")
    ref_img, ref_mask = aug.apply_u8(key, images, masks)
    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "1")
    out_img, out_mask = aug.apply_u8(key, images, masks)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(out_img), np.asarray(ref_img), rtol=0, atol=0
    )


def test_non_u8_path_unaffected(monkeypatch):
    """float32 stacks (the prompt augmentor) keep the XLA path even when the
    Pallas rolls are forced on — the gate requires uint8 + 4 channels."""
    rng = np.random.default_rng(4)
    n, h, w = 3, 16, 16
    stacked = jnp.asarray(rng.uniform(0, 1, (n, h, w, 5)), jnp.float32)
    angles = jnp.asarray(rng.uniform(-90, 90, (n,)), jnp.float32)
    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "1")
    out = A._rotate_shear3(stacked, angles)
    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "0")
    ref = A._rotate_shear3(stacked, angles)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_prompt_apply_u8_matches_call(monkeypatch):
    """The packed joint-geometry path (image+mask as u8x4 + the f32 heatmap
    bitcast to i32, ONE random_geometric_packed over both groups) must be
    bit-identical to DataAugmentorPrompt.__call__ on the normalized inputs
    (the 5-channel f32 XLA roll/select chain it replaces)."""
    rng = np.random.default_rng(5)
    n, h, w = 5, 32, 32
    images = jnp.asarray(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (n, h, w), dtype=np.uint8))
    prompts = jnp.asarray(rng.random((n, h, w, 1)).astype(np.float32))
    aug = A.DataAugmentorPrompt(augmentations_per_datapoint=4)
    key = jax.random.PRNGKey(11)

    ref_i, ref_m, ref_p = aug(
        key, A.normalize_image(images), labels.astype(jnp.int32), prompts
    )
    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "1")
    out_i, out_m, out_p = aug.apply_u8(key, images, labels, prompts)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(ref_m))
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(ref_i))


def test_prompt_apply_u8_fallback_non_square(monkeypatch):
    """Non-square inputs take the __call__ fallback verbatim."""
    rng = np.random.default_rng(6)
    n, h, w = 3, 16, 24
    images = jnp.asarray(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (n, h, w), dtype=np.uint8))
    prompts = jnp.asarray(rng.random((n, h, w, 1)).astype(np.float32))
    aug = A.DataAugmentorPrompt(augmentations_per_datapoint=2)
    key = jax.random.PRNGKey(3)
    monkeypatch.setenv("IMGSEG_PALLAS_ROLL", "1")
    out_i, out_m, out_p = aug.apply_u8(key, images, labels, prompts)
    ref_i, ref_m, ref_p = aug(
        key, A.normalize_image(images), labels.astype(jnp.int32), prompts
    )
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(ref_m))
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(ref_i))

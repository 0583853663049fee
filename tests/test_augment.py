"""On-device augmentor semantics (reference processing_blocks.py:324-451)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.ops import augment


KEY = jax.random.PRNGKey(0)


def batch(n=6, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.random((n, h, w, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (n, h, w)).astype(np.int32))
    return images, masks


def test_normalize():
    u8 = jnp.asarray(np.array([[[[0, 128, 255]]]], np.uint8))
    out = augment.normalize_image(u8)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, 0], [0.0, 128 / 255, 1.0], rtol=1e-6
    )


class TestGeometric:
    def test_identity_rotation(self):
        images, _ = batch()
        out = augment._rotate_one(images[0], jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(images[0]), atol=1e-6)

    def test_rotation_90_exact(self):
        # 90 deg rotation of a square image is a permutation of pixels.
        images, _ = batch(n=1)
        out = np.asarray(augment._rotate_one(images[0], jnp.asarray(90.0)))
        ref = np.rot90(np.asarray(images[0]), k=1, axes=(0, 1))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_joint_geometry_image_mask_consistent(self):
        """Mask pixels must move with image pixels (the channel-concat trick)."""
        images, masks = batch()
        stacked = jnp.concatenate(
            [images, masks.astype(jnp.float32)[..., None]], axis=-1
        )
        out = augment.random_geometric(KEY, stacked)
        # encode pixel identity in channel 0 and in the mask channel; they
        # must stay equal after the joint transform
        n, h, w, _ = images.shape
        ident = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
        ident = jnp.tile(ident, (n, 1, 1, 1))
        stacked2 = jnp.concatenate([ident, ident], axis=-1)
        out2 = np.asarray(augment.random_geometric(KEY, stacked2))
        np.testing.assert_array_equal(out2[..., 0], out2[..., 1])


class TestTwoPassRotation:
    def test_exact_at_quarter_turns(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.integers(0, 256, (3, 32, 32, 4), dtype=np.uint8))
        for deg in (0.0, 90.0, -90.0):
            a = jnp.full((3,), deg, jnp.float32)
            direct = jax.vmap(augment._rotate_one)(x, a)
            fast = augment._rotate_two_pass(x, a)
            np.testing.assert_array_equal(np.asarray(direct), np.asarray(fast))

    def test_subpixel_agreement_with_direct_gather(self):
        """two_pass may pick a neighbouring source pixel on rounding ties;
        the sampled source coordinate must stay within ~1px of the direct
        2-D gather (checked by encoding coordinates as channel values)."""
        h = w = 64
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coord = np.stack([yy, xx], -1).astype(np.float32)
        x = jnp.asarray(np.tile(coord[None], (4, 1, 1, 1)))
        a = jnp.asarray(np.array([45.0, 30.0, -45.0, 60.0], np.float32))
        direct = np.asarray(jax.vmap(augment._rotate_one)(x, a))
        fast = np.asarray(augment._rotate_two_pass(x, a))
        inner = np.zeros((h, w), bool)
        inner[8:-8, 8:-8] = True
        d = np.abs(direct - fast)[:, inner, :]
        assert d.mean() < 0.2
        assert (d > 1.5).mean() < 1e-3

    def test_channels_move_jointly(self):
        rng = np.random.default_rng(3)
        ident = jnp.asarray(
            np.tile(
                np.arange(16 * 16, dtype=np.float32).reshape(1, 16, 16, 1),
                (2, 1, 1, 2),
            )
        )
        a = jnp.asarray(np.array([33.0, -71.0], np.float32))
        out = np.asarray(augment._rotate_two_pass(ident, a))
        np.testing.assert_array_equal(out[..., 0], out[..., 1])


class TestColorJitter:
    def test_output_in_range(self):
        images, _ = batch()
        out = np.asarray(augment.color_jitter(KEY, images))
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_per_sample_randomness(self):
        images, _ = batch()
        same = jnp.tile(images[:1], (4, 1, 1, 1))
        out = np.asarray(augment.color_jitter(KEY, same))
        assert not np.allclose(out[0], out[1])

    def test_hsv_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(0).random((2, 4, 4, 3)).astype(np.float32))
        h, s, v = augment._rgb_to_hsv(rgb)
        back = augment._hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


class TestBlur:
    def test_blur_preserves_constant(self):
        images = jnp.ones((2, 8, 8, 3), jnp.float32) * 0.5
        out = np.asarray(augment.gaussian_blur_5x5(KEY, images))
        np.testing.assert_allclose(out, 0.5, atol=1e-5)

    def test_blur_reduces_variance(self):
        images, _ = batch()
        out = np.asarray(augment.gaussian_blur_5x5(KEY, images))
        assert out.var() < np.asarray(images).var()


class TestCleanSlots:
    @pytest.mark.parametrize("aug", [1, 2, 4])
    def test_every_step_position_clean(self, aug):
        images, masks = batch(n=2 * (aug + 1))
        augmentor = augment.DataAugmentor(aug)
        out_i, out_m = augmentor(KEY, images, masks)
        out_i, out_m = np.asarray(out_i), np.asarray(out_m)
        for pos in range(0, images.shape[0], aug + 1):
            np.testing.assert_array_equal(out_i[pos], np.asarray(images[pos]))
            np.testing.assert_array_equal(out_m[pos], np.asarray(masks[pos]))
        # at least one augmented slot differs
        assert any(
            not np.allclose(out_i[p], np.asarray(images[p]))
            for p in range(images.shape[0])
            if p % (aug + 1) != 0
        )

    def test_mask_values_remain_valid_classes(self):
        images, masks = batch(n=6)
        out_i, out_m = augment.DataAugmentor(2)(KEY, images, masks)
        assert set(np.unique(np.asarray(out_m))).issubset({0, 1, 2})


class TestU8Path:
    def test_u8_path_matches_float_path(self):
        """uint8-space geometry must give bit-identical results to the float
        path (nearest resampling preserves values)."""
        rng = np.random.default_rng(7)
        images_u8 = jnp.asarray(rng.integers(0, 256, (6, 16, 16, 3), dtype=np.uint8))
        masks_u8 = jnp.asarray(rng.integers(0, 3, (6, 16, 16)).astype(np.uint8))
        augmentor = augment.DataAugmentor(2)
        f_images, f_masks = augmentor(
            KEY, augment.normalize_image(images_u8), masks_u8.astype(jnp.int32)
        )
        u_images, u_masks = augmentor.apply_u8(KEY, images_u8, masks_u8)
        np.testing.assert_allclose(
            np.asarray(u_images), np.asarray(f_images), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(u_masks), np.asarray(f_masks))


class TestPromptAugmentor:
    def test_shapes_and_clean_slots(self):
        images, masks = batch(n=6)
        prompts = jnp.asarray(
            np.random.default_rng(1).random((6, 16, 16, 1)).astype(np.float32)
        )
        out_i, out_m, out_p = augment.DataAugmentorPrompt(2)(
            KEY, images, masks, prompts
        )
        assert out_p.shape == prompts.shape
        np.testing.assert_array_equal(np.asarray(out_p)[0], np.asarray(prompts)[0])
        np.testing.assert_array_equal(np.asarray(out_p)[3], np.asarray(prompts)[3])


class TestShear3Rotation:
    """The production rotation path: quarter-turn + bit-rolled shears."""

    def test_exact_at_quarter_turns(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.integers(0, 256, (3, 32, 32, 4), dtype=np.uint8))
        for deg in (0.0, 90.0, -90.0):
            a = jnp.full((3,), deg, jnp.float32)
            direct = jax.vmap(augment._rotate_one)(x, a)
            fast = augment._rotate_shear3(x, a)
            np.testing.assert_array_equal(np.asarray(direct), np.asarray(fast))

    def test_subpixel_agreement_with_direct_gather(self):
        h = w = 64
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coord = np.stack([yy, xx], -1).astype(np.float32) + 1.0
        x = jnp.asarray(np.tile(coord[None], (4, 1, 1, 1)))
        a = jnp.asarray(np.array([45.0, 30.0, -45.0, 60.0], np.float32))
        direct = np.asarray(jax.vmap(augment._rotate_one)(x, a))
        fast = np.asarray(augment._rotate_shear3(x, a))
        both = (direct[..., 0] > 0) & (fast[..., 0] > 0)
        d = np.abs(direct - fast)[both]
        assert d.max() <= 1.0 + 1e-6  # each shear rounds once: <= 1px
        assert d.mean() < 0.25

    def test_is_bijection_on_interior(self):
        """Composed integer row shifts never duplicate or drop pixels (the
        direct nearest map does) — every interior source pixel appears at
        most once in the output."""
        h = w = 64
        ident = jnp.asarray(
            (np.arange(h * w, dtype=np.float32) + 1.0).reshape(1, h, w, 1)
        )
        out = np.asarray(
            augment._rotate_shear3(ident, jnp.asarray([37.0], jnp.float32))
        )[0, ..., 0]
        vals = out[out > 0]
        assert len(vals) == len(np.unique(vals))

    def test_row_shift_exact(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 255, (3, 16, 32, 2), dtype=np.uint8)
        s = rng.integers(-10, 11, (3, 16))
        got = np.asarray(
            augment._row_shift(jnp.asarray(x), jnp.asarray(s), 10)
        )
        ref = np.zeros_like(x)
        for b in range(3):
            for i in range(16):
                for j in range(32):
                    src = j - s[b, i]
                    if 0 <= src < 32:
                        ref[b, i, j] = x[b, i, src]
        np.testing.assert_array_equal(got, ref)

    def test_channels_move_jointly(self):
        ident = jnp.asarray(
            np.tile(
                np.arange(16 * 16, dtype=np.float32).reshape(1, 16, 16, 1),
                (2, 1, 1, 2),
            )
        )
        a = jnp.asarray(np.array([33.0, -71.0], np.float32))
        out = np.asarray(augment._rotate_shear3(ident, a))
        np.testing.assert_array_equal(out[..., 0], out[..., 1])

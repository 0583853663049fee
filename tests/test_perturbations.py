"""Integer-space perturbation battery: uint8 round/clamp fidelity vs torch
formulas (reference customDatasets/perturbations.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.data import perturbations as P

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


def u8_batch(n=2, h=16, w=16):
    return jnp.asarray(RNG.integers(0, 256, (n, h, w, 3), dtype=np.uint8))


class TestBoxBlur:
    @pytest.mark.parametrize("passes", [0, 1, 3])
    def test_matches_torch_int_space(self, passes):
        imgs = u8_batch()
        ours = np.asarray(P.box_blur_passes(imgs, passes))
        # reference: grouped 3x3/9 conv, zero pad, round then clamp per pass
        # (perturbations.py:97-122)
        x = torch.from_numpy(np.moveaxis(np.asarray(imgs), -1, 1).copy())
        kernel = (torch.ones(1, 1, 3, 3) / 9.0).expand(3, 1, 3, 3)
        cur = x
        for _ in range(passes):
            f = cur.float()
            conv = F.conv2d(f, kernel, padding=1, groups=3)
            cur = conv.round().clamp(0, 255).to(torch.uint8)
        ref = np.moveaxis(cur.numpy(), 1, -1)
        np.testing.assert_array_equal(ours, ref)


class TestContrastBrightness:
    @pytest.mark.parametrize("factor", [1.0, 1.25, 0.1, 0.95])
    def test_contrast(self, factor):
        imgs = u8_batch()
        ours = np.asarray(P.contrast_scale(imgs, factor))
        f = np.asarray(imgs).astype(np.float64) * factor
        # torch .round() is round-half-to-even, same as numpy
        ref = np.clip(np.round(f), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("offset", [0, 5, 45])
    def test_brightness_increase(self, offset):
        imgs = u8_batch()
        ours = np.asarray(P.brightness_shift(imgs, float(offset), increase=True))
        ref = np.clip(np.asarray(imgs).astype(np.float64) + offset, 0, 255)
        ref = np.round(ref).astype(np.uint8)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("offset", [5, 45])
    def test_brightness_decrease(self, offset):
        imgs = u8_batch()
        ours = np.asarray(P.brightness_shift(imgs, float(offset), increase=False))
        ref = np.clip(
            np.round(np.asarray(imgs).astype(np.float64) - offset), 0, 255
        ).astype(np.uint8)
        np.testing.assert_array_equal(ours, ref)


class TestNoise:
    def test_zero_std_identity(self):
        imgs = u8_batch()
        out = np.asarray(P.gaussian_pixel_noise(KEY, imgs, 0.0))
        np.testing.assert_array_equal(out, np.asarray(imgs))

    def test_noise_statistics(self):
        imgs = jnp.full((4, 64, 64, 3), 128, jnp.uint8)
        out = np.asarray(P.gaussian_pixel_noise(KEY, imgs, 10.0)).astype(np.float64)
        d = out - 128.0
        assert abs(d.mean()) < 0.5
        assert abs(d.std() - 10.0) < 0.5


class TestOcclusion:
    def test_zero_size_identity(self):
        imgs = u8_batch()
        np.testing.assert_array_equal(
            np.asarray(P.occlusion(KEY, imgs, 0)), np.asarray(imgs)
        )

    def test_square_area_zeroed(self):
        imgs = jnp.full((3, 32, 32, 3), 200, jnp.uint8)
        out = np.asarray(P.occlusion(KEY, imgs, 8))
        for i in range(3):
            zeros = (out[i] == 0).all(axis=-1)
            assert zeros.sum() == 64  # one 8x8 square per item
            ys, xs = np.where(zeros)
            assert ys.max() - ys.min() == 7 and xs.max() - xs.min() == 7


class TestSaltPepper:
    def test_zero_amount_identity(self):
        imgs = u8_batch()
        np.testing.assert_array_equal(
            np.asarray(P.salt_pepper(KEY, imgs, 0.0)), np.asarray(imgs)
        )

    def test_whole_channel_and_fraction(self):
        imgs = jnp.full((2, 64, 64, 3), 128, jnp.uint8)
        amount = 0.1
        out = np.asarray(P.salt_pepper(KEY, imgs, amount))
        is_salt = (out == 255).all(axis=-1)
        is_pepper = (out == 0).all(axis=-1)
        changed = is_salt | is_pepper
        # corrupted pixels are whole-channel
        partial = ((out != 128).any(axis=-1)) & ~changed
        assert partial.sum() == 0
        frac = changed.mean()
        assert abs(frac - amount) < 0.02


class TestSaltPepperDraws:
    """The with-replacement draw semantics of the reference's integer-space
    wrapper (customDatasets/perturbations.py:366-377), traced formulation."""

    def test_zero_amount_identity(self):
        imgs = u8_batch()
        np.testing.assert_array_equal(
            np.asarray(P.salt_pepper_draws(KEY, imgs, 0.0, max_amount=0.18)),
            np.asarray(imgs),
        )

    def test_matches_sequential_application(self):
        """Bit-equal to applying the same draws one by one, last wins."""
        n, h, w = 2, 24, 24
        hw = h * w
        imgs = jnp.full((n, h, w, 3), 128, jnp.uint8)
        amount, max_amount = 0.10, 0.18
        out = np.asarray(
            P.salt_pepper_draws(KEY, imgs, amount, max_amount=max_amount)
        )
        # Reconstruct the draw streams exactly as salt_pepper_draws does.
        kpos, kval = jax.random.split(KEY)
        max_draws = int(round(max_amount * hw))
        pos = np.asarray(jax.random.randint(kpos, (n, max_draws), 0, hw))
        salt = np.asarray(jax.random.bernoulli(kval, 0.5, (n, max_draws)))
        num = int(round(amount * hw))
        ref = np.full((n, h, w, 3), 128, np.uint8)
        for i in range(n):
            for d in range(num):  # sequential, with replacement, last wins
                y, x = divmod(int(pos[i, d]), w)
                ref[i, y, x, :] = 255 if salt[i, d] else 0
        np.testing.assert_array_equal(out, ref)

    def test_corrupted_pixel_count_distribution(self):
        """Distinct-pixel count under with-replacement: mean over keys must
        match the occupancy expectation HW*(1-(1-1/HW)^num) — distinguishes
        this from both 'exactly num' (w/o replacement) and the iid form."""
        n, h, w = 1, 64, 64
        hw = h * w
        amount = 0.16
        num = int(round(amount * hw))
        imgs = jnp.full((n, h, w, 3), 128, jnp.uint8)
        counts = []
        for s in range(20):
            out = np.asarray(
                P.salt_pepper_draws(
                    jax.random.PRNGKey(s), imgs, amount, max_amount=0.18
                )
            )
            changed = ((out == 255) | (out == 0)).all(axis=-1)
            counts.append(changed.sum())
            assert changed.sum() <= num  # never more than the draw count
        expect = hw * (1.0 - (1.0 - 1.0 / hw) ** num)
        mean = float(np.mean(counts))
        assert abs(mean - expect) < 0.02 * hw
        # and strictly below num on average: collisions must actually occur
        assert mean < num

    def test_traced_amount_one_program(self):
        """The sweep entry traces ``amount``: one jitted program serves
        every grid point and matches the eager per-value results."""
        imgs = u8_batch()
        fn = P.INT_SWEEPS["salt_pepper_noise"]["fn"]
        jfn = jax.jit(fn)
        for amount in (0.0, 0.04, 0.18):
            np.testing.assert_array_equal(
                np.asarray(jfn(KEY, imgs, amount)),
                np.asarray(fn(KEY, imgs, amount)),
            )


class TestRegistryGrids:
    def test_sweep_grids_match_reference(self):
        # scripts/robustness_evaluation.py:59-92
        assert P.INT_SWEEPS["gaussian_noise"]["params"] == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]
        assert P.INT_SWEEPS["gaussian_blur"]["params"] == list(range(10))
        assert P.INT_SWEEPS["contrast_increase"]["params"][-1] == 1.25
        assert P.INT_SWEEPS["contrast_decrease"]["params"][-1] == 0.1
        assert P.INT_SWEEPS["brightness_increase"]["params"][-1] == 45
        assert P.INT_SWEEPS["occlusion"]["params"][-1] == 45
        assert P.INT_SWEEPS["salt_pepper_noise"]["params"][-1] == pytest.approx(0.18)
        assert len(P.INT_SWEEPS) == 8
        for info in P.INT_SWEEPS.values():
            assert len(info["params"]) == 10

    def test_apply_perturbation_dispatch(self):
        imgs = u8_batch()
        out = P.apply_perturbation("contrast_increase", KEY, imgs, 1.25)
        assert out.dtype == jnp.uint8


class TestFloatBattery:
    def test_float_noise_clip(self):
        imgs = jnp.asarray(RNG.random((2, 8, 8, 3)).astype(np.float32))
        out = np.asarray(P.float_gaussian_noise(KEY, imgs, 18))
        assert out.min() >= 0 and out.max() <= 1

    def test_float_blur_constant(self):
        imgs = jnp.full((1, 8, 8, 3), 0.25, jnp.float32)
        out = np.asarray(P.float_repeated_blur(imgs, 3))
        np.testing.assert_allclose(out, 0.25, atol=1e-6)

    def test_float_salt_pepper_values(self):
        imgs = jnp.full((1, 32, 32, 3), 0.5, jnp.float32)
        out = np.asarray(P.float_salt_pepper(KEY, imgs, 0.2))
        assert set(np.unique(out)).issubset({0.0, 0.5, 1.0})


class TestTracedSweepVariants:
    """The traced blur/occlusion sweep fns must be bit-identical to the
    static formulations for every grid value (they share one compiled
    program per battery instead of one per value)."""

    def test_box_blur_traced_matches_static(self):
        import jax
        import jax.numpy as jnp

        from image_segmentation_tpu.data import perturbations as pert

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8))
        for p in pert.INT_SWEEPS["gaussian_blur"]["params"]:
            ref = pert.box_blur_passes(img, p)
            got = pert.box_blur_passes_traced(img, jnp.float32(p), max_passes=9)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_float_blur_traced_matches_static(self):
        import jax.numpy as jnp

        from image_segmentation_tpu.data import perturbations as pert

        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
        for p in pert.FLOAT_SWEEPS["blur"]["params"]:
            ref = pert.float_repeated_blur(img, p)
            got = pert.float_repeated_blur_traced(img, jnp.float32(p), max_passes=9)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
            )

    def test_occlusion_traced_param_matches_int_param(self):
        import jax
        import jax.numpy as jnp

        from image_segmentation_tpu.data import perturbations as pert

        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
        key = jax.random.PRNGKey(3)
        for p in (0, 5, 20):
            a = pert.occlusion(key, img, p)
            b = pert.occlusion(key, img, jnp.float32(p))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # size 0 must be a no-op (reference early-returns)
        np.testing.assert_array_equal(
            np.asarray(pert.occlusion(key, img, 0)), np.asarray(img)
        )

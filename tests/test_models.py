"""Model shape/param-count checks (reference models/UNet.py,
classical_autoencoder.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.autoencoder import Autoencoder, Encoder
from image_segmentation_tpu.models.registry import build_model
from image_segmentation_tpu.models.unet import LargeUNet, UNet

KEY = jax.random.PRNGKey(0)


def n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def conv_p(cin, cout, k):
    return cin * cout * k * k + cout


def block_p(cin, cout):
    # ConvBlock: conv3x3(cin->cout)+bn + conv3x3(cout->cout)+bn
    return conv_p(cin, cout, 3) + 2 * cout + conv_p(cout, cout, 3) + 2 * cout


def upskip_p(cin, cout):
    # ConvTranspose2x2(cin->cout) + ConvBlock(2*cout->cout)
    return cin * cout * 4 + cout + block_p(2 * cout, cout)


def expected_unet_params(enc=(64, 128, 256), stem=32, out=3):
    total = conv_p(3, stem, 1)
    c = stem
    for f in enc:
        total += block_p(c, f)
        c = f
    total += block_p(c, 2 * c)
    c = 2 * c
    for f in list(enc[::-1]) + [stem]:
        total += upskip_p(c, f)
        c = f
    total += conv_p(stem, out, 1)
    return total


class TestUNet:
    def test_shape_and_params(self):
        m = UNet(out_channels=3, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(KEY, x, train=False)
        assert m.apply(v, x, train=False).shape == (1, 64, 64, 3)
        assert n_params(v) == expected_unet_params()

    def test_logits_output_fp32(self):
        m = UNet(out_channels=3)  # bf16 compute
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init(KEY, x, train=False)
        out = m.apply(v, x, train=False)
        assert out.dtype == jnp.float32

    def test_train_mode_updates_batch_stats(self):
        m = UNet(dtype=jnp.float32)
        x = jax.random.normal(KEY, (2, 32, 32, 3))
        v = m.init(KEY, x, train=False)
        _, mutated = m.apply(v, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(v["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )


class TestLargeUNet:
    def test_shape_and_params(self):
        m = LargeUNet(out_channels=3, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(KEY, x, train=False)
        assert m.apply(v, x, train=False).shape == (1, 64, 64, 3)
        assert n_params(v) == expected_unet_params(enc=(64, 128, 256, 512))


class TestAutoencoder:
    def test_output_sigmoid_range(self):
        m = Autoencoder(dtype=jnp.float32)
        x = jax.random.normal(KEY, (1, 64, 64, 3))
        v = m.init(KEY, x, train=False)
        out = np.asarray(m.apply(v, x, train=False))
        assert out.shape == (1, 64, 64, 3)
        assert out.min() >= 0 and out.max() <= 1

    def test_encoder_returns_all_skip_levels(self):
        m = Encoder(dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(KEY, x, train=False)
        feats = m.apply(v, x, train=False)
        assert set(feats) == {"x0", "enc1", "enc2", "enc3", "bottleneck"}
        assert feats["x0"].shape == (1, 64, 64, 32)
        assert feats["bottleneck"].shape == (1, 8, 8, 64)


class TestRegistry:
    @pytest.mark.parametrize("name", ["unet", "large_unet", "autoencoder"])
    def test_build(self, name):
        m = build_model(name, dtype=jnp.float32)
        assert m is not None

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            build_model("nope")

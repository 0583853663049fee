"""Numerical parity of the NHWC/flax blocks vs torch modules.

Torch fixtures are built from torch.nn primitives following the reference
block specs (SURVEY.md §2.2); weights are converted with
utils/torch_convert and outputs compared in fp32.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models import blocks
from image_segmentation_tpu.utils import torch_convert as tc

jax.config.update("jax_default_matmul_precision", "highest")

TOL = dict(rtol=2e-4, atol=2e-4)


def nhwc(x_t):
    return jnp.asarray(np.moveaxis(x_t.detach().numpy(), 1, -1))


def nchw(x_j):
    return np.moveaxis(np.asarray(x_j), -1, 1)


def make_torch_conv_block(cin, cout):
    torch.manual_seed(0)
    m = tnn.Sequential(
        tnn.Conv2d(cin, cout, 3, padding=1),
        tnn.BatchNorm2d(cout),
        tnn.ReLU(),
        tnn.Conv2d(cout, cout, 3, padding=1),
        tnn.BatchNorm2d(cout),
        tnn.ReLU(),
    )
    m.eval()
    # Randomize BN running stats so eval-mode parity is non-trivial.
    with torch.no_grad():
        for layer in (m[1], m[4]):
            layer.running_mean.normal_(0, 0.5)
            layer.running_var.uniform_(0.5, 2.0)
    return m


class Wrapper(tnn.Module):
    """Name a torch submodule 'conv' so tc.conv_block_params applies."""

    def __init__(self, seq):
        super().__init__()
        self.conv = seq

    def forward(self, x):
        return self.conv(x)


def test_conv_block_parity():
    tm = Wrapper(make_torch_conv_block(3, 8))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    x = torch.randn(2, 3, 16, 16)
    ref = tm(x).detach().numpy()

    m = blocks.ConvBlock(8, dtype=jnp.float32)
    params = tc.conv_block_params("", sd)
    stats = tc.conv_block_stats("", sd)
    out = m.apply(
        {"params": params, "batch_stats": stats}, nhwc(x), train=False
    )
    np.testing.assert_allclose(nchw(out), ref, **TOL)


def test_conv_transpose_parity():
    torch.manual_seed(1)
    tct = tnn.ConvTranspose2d(4, 6, kernel_size=2, stride=2)
    x = torch.randn(2, 4, 8, 8)
    ref = tct(x).detach().numpy()

    from flax import linen as nn

    m = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID")
    params = tc.conv_transpose_params("w", {"w.weight": tct.weight.detach().numpy(),
                                            "w.bias": tct.bias.detach().numpy()})
    out = m.apply({"params": params}, nhwc(x))
    np.testing.assert_allclose(nchw(out), ref, **TOL)


def test_maxpool_parity():
    x = torch.randn(2, 3, 8, 8)
    ref = F.max_pool2d(x, 2, 2).numpy()
    out = blocks.max_pool_2x2(nhwc(x))
    np.testing.assert_allclose(nchw(out), ref, **TOL)


@pytest.mark.parametrize("in_size,out_size", [(8, 16), (16, 8), (8, 8), (7, 13)])
def test_bilinear_align_corners_parity(in_size, out_size):
    x = torch.randn(2, 3, in_size, in_size)
    ref = F.interpolate(
        x, size=(out_size, out_size), mode="bilinear", align_corners=True
    ).numpy()
    out = blocks.resize_bilinear_align_corners(nhwc(x), out_size, out_size)
    np.testing.assert_allclose(nchw(out), ref, **TOL)


def test_upsample_skip_resize_then_concat_order():
    """dec1-style case: skip at SAME resolution as input -> upsample is
    resized back down (see models/unet.py decoder comment)."""
    key = jax.random.PRNGKey(0)
    m = blocks.ConvBlockUpsampleSkip(4, dtype=jnp.float32)
    x = jax.random.normal(key, (1, 8, 8, 8))
    skip = jax.random.normal(key, (1, 8, 8, 4))
    vars_ = m.init(key, x, skip, train=False)
    out = m.apply(vars_, x, skip, train=False)
    assert out.shape == (1, 8, 8, 4)


def test_linear_parity():
    torch.manual_seed(2)
    lin = tnn.Linear(8, 5)
    x = torch.randn(3, 8)
    ref = lin(x).detach().numpy()
    p = tc.linear_params("l", {"l.weight": lin.weight.detach().numpy(),
                               "l.bias": lin.bias.detach().numpy()})
    out = jnp.asarray(x.numpy()) @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)

"""Classical Autoencoder forward parity vs a torch twin at fp32
(reference models/classical_autoencoder.py:1-64: 1x1 stem, 3 conv-pool
encoders, bottleneck, 3 transpose-conv decoders, 1x1 head, sigmoid)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.autoencoder import Autoencoder
from image_segmentation_tpu.utils import torch_convert as tc

from tests.test_clip_res_parity import TUp, _up_params, _up_stats
from tests.test_clip_unet_parity import TBlock

jax.config.update("jax_default_matmul_precision", "highest")


class TAutoencoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stem = tnn.Conv2d(3, 32, 1)
        self.enc1 = TBlock(32, 64)
        self.enc2 = TBlock(64, 64)
        self.enc3 = TBlock(64, 64)
        self.bottleneck = TBlock(64, 64)
        self.dec1 = TUp(64, 64)
        self.dec2 = TUp(64, 64)
        self.dec3 = TUp(64, 32)
        self.out = tnn.Conv2d(32, 3, 1)

    def forward(self, x):
        h = self.stem(x)
        h = F.max_pool2d(self.enc1(h), 2, 2)
        h = F.max_pool2d(self.enc2(h), 2, 2)
        h = F.max_pool2d(self.enc3(h), 2, 2)
        h = self.bottleneck(h)
        h = self.dec3(self.dec2(self.dec1(h)))
        return torch.sigmoid(self.out(h))


@pytest.mark.slow
def test_autoencoder_forward_parity():
    torch.manual_seed(4)
    tm = TAutoencoder()
    tm.eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    params = {
        "encoder": {
            "input": tc.conv_params("stem", sd),
            "enc1": {"conv_block": tc.conv_block_params("enc1", sd)},
            "enc2": {"conv_block": tc.conv_block_params("enc2", sd)},
            "enc3": {"conv_block": tc.conv_block_params("enc3", sd)},
            "bottleneck": tc.conv_block_params("bottleneck", sd),
        },
        "decoder": {
            "dec1": _up_params("dec1", sd),
            "dec2": _up_params("dec2", sd),
            "dec3": _up_params("dec3", sd),
            "out": tc.conv_params("out", sd),
        },
    }
    batch_stats = {
        "encoder": {
            "enc1": {"conv_block": tc.conv_block_stats("enc1", sd)},
            "enc2": {"conv_block": tc.conv_block_stats("enc2", sd)},
            "enc3": {"conv_block": tc.conv_block_stats("enc3", sd)},
            "bottleneck": tc.conv_block_stats("bottleneck", sd),
        },
        "decoder": {
            "dec1": _up_stats("dec1", sd),
            "dec2": _up_stats("dec2", sd),
            "dec3": _up_stats("dec3", sd),
        },
    }

    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        ref = tm(x).numpy()

    model = Autoencoder(dtype=jnp.float32)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        jnp.asarray(np.moveaxis(x.numpy(), 1, -1)), train=False,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), ref, rtol=2e-4, atol=2e-4
    )

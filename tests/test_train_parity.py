"""Whole-TRAIN-STEP numerical parity vs torch at fp32.

The strongest form of the BASELINE "mIoU/Dice parity with the PyTorch
reference at fp32" metric that zero egress allows: a torch twin of the
reference UNet (models/UNet.py:7-76 wiring via torch.nn primitives, as in
tests/test_block_parity.py) and this framework's UNet are initialized from
the SAME weights and trained with the SAME fixed batch — per-step training
losses must agree to float tolerance, which jointly pins the forward pass,
the CE loss (reference HybridLoss forward quirk), the full backward, the
BatchNorm batch-statistics update, and the torch-Adam-parity optimizer
(L2-into-gradient semantics, models/model_wrappers.py Adam usage).

Blocks individually are covered by tests/test_block_parity.py; the Adam
update rule by tests/test_trainer.py.  This test is the composition: if any
piece (padding, BN eps/momentum, loss reduction, bias correction, decay
placement) drifted, K chained steps would diverge measurably.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.config import DataConfig, TrainConfig
from image_segmentation_tpu.data.datasets import synthetic_shapes_dataset
from image_segmentation_tpu.engine.train import Trainer
from image_segmentation_tpu.utils import torch_convert as tc

jax.config.update("jax_default_matmul_precision", "highest")

STEM, ENC = 8, (16, 32)


class TBlock(tnn.Module):
    """[Conv3x3-BN-ReLU]x2 with the reference's Sequential indices so
    tc.conv_block_params applies directly."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(),
            tnn.Conv2d(cout, cout, 3, padding=1),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(),
        )

    def forward(self, x):
        return self.conv(x)


class TUNet(tnn.Module):
    """Torch twin of models/unet.UNet(stem=8, encoders=(16, 32)) — the
    reference wiring incl. dec1's skip at bottleneck resolution (the
    align-corners resize-back-down quirk, models/unet.py decoder comment)."""

    def __init__(self, out_channels=3):
        super().__init__()
        self.stem = tnn.Conv2d(3, STEM, 1)
        self.enc1 = TBlock(STEM, ENC[0])
        self.enc2 = TBlock(ENC[0], ENC[1])
        self.bottleneck = TBlock(ENC[1], 2 * ENC[1])
        self.dec1_up = tnn.ConvTranspose2d(2 * ENC[1], ENC[1], 2, 2)
        self.dec1_block = TBlock(2 * ENC[1], ENC[1])
        self.dec2_up = tnn.ConvTranspose2d(ENC[1], ENC[0], 2, 2)
        self.dec2_block = TBlock(2 * ENC[0], ENC[0])
        self.dec3_up = tnn.ConvTranspose2d(ENC[0], STEM, 2, 2)
        self.dec3_block = TBlock(2 * STEM, STEM)
        self.out = tnn.Conv2d(STEM, out_channels, 1)

    @staticmethod
    def _up(up, block, x, skip):
        x = up(x)
        x = F.interpolate(
            x, size=skip.shape[2:], mode="bilinear", align_corners=True
        )
        return block(torch.cat([x, skip], dim=1))

    def forward(self, x):
        stem = self.stem(x)
        e1 = F.max_pool2d(self.enc1(stem), 2, 2)
        e2 = F.max_pool2d(self.enc2(e1), 2, 2)
        b = self.bottleneck(e2)
        d1 = self._up(self.dec1_up, self.dec1_block, b, e2)
        d2 = self._up(self.dec2_up, self.dec2_block, d1, e1)
        d3 = self._up(self.dec3_up, self.dec3_block, d2, stem)
        return self.out(d3)


def _params_from_torch(sd):
    def block(prefix):
        return tc.conv_block_params(prefix, sd)

    def stats(prefix):
        return tc.conv_block_stats(prefix, sd)

    params = {
        "input": tc.conv_params("stem", sd),
        "enc1": {"conv_block": block("enc1")},
        "enc2": {"conv_block": block("enc2")},
        "bottleneck": block("bottleneck"),
        "dec1": {"up": tc.conv_transpose_params("dec1_up", sd),
                 "conv_block": block("dec1_block")},
        "dec2": {"up": tc.conv_transpose_params("dec2_up", sd),
                 "conv_block": block("dec2_block")},
        "dec3": {"up": tc.conv_transpose_params("dec3_up", sd),
                 "conv_block": block("dec3_block")},
        "out": tc.conv_params("out", sd),
    }
    batch_stats = {
        "enc1": {"conv_block": stats("enc1")},
        "enc2": {"conv_block": stats("enc2")},
        "bottleneck": stats("bottleneck"),
        "dec1": {"conv_block": stats("dec1_block")},
        "dec2": {"conv_block": stats("dec2_block")},
        "dec3": {"conv_block": stats("dec3_block")},
    }
    return params, batch_stats


@pytest.mark.slow
def test_train_step_losses_match_torch():
    torch.manual_seed(0)
    n, size, steps = 8, 32, 4

    ds = synthetic_shapes_dataset(length=n, height=size, width=size, seed=0)
    images_u8 = np.asarray(ds.images)
    masks_u8 = np.asarray(ds.masks)

    tm = TUNet()
    # .numpy() returns VIEWS that the torch optimizer mutates in place —
    # copy so the converted tree is the t=0 snapshot.
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    # --- torch side: reference training semantics ------------------------
    cfg = TrainConfig(
        model="unet", batch_size=n, num_epochs=1, bf16=False,
        model_args={"stem_features": STEM, "encoder_features": ENC},
        data=DataConfig(dataset="synthetic", synthetic_length=n,
                        image_size=size, augmentations_per_datapoint=0),
    )
    opt = torch.optim.Adam(
        tm.parameters(), lr=cfg.optimizer.learning_rate,
        weight_decay=cfg.optimizer.weight_decay,
        betas=(cfg.optimizer.b1, cfg.optimizer.b2), eps=cfg.optimizer.eps,
    )
    xt = torch.from_numpy(
        np.moveaxis(images_u8, -1, 1).astype(np.float32) / 255.0
    )
    yt = torch.from_numpy(masks_u8.astype(np.int64))
    tm.train()
    torch_losses = []
    for _ in range(steps):
        opt.zero_grad()
        loss = F.cross_entropy(tm(xt), yt)
        loss.backward()
        opt.step()
        torch_losses.append(loss.item())

    # --- this framework: same weights, same batch ------------------------
    trainer = Trainer(cfg, make_artifacts=False)
    params, batch_stats = _params_from_torch(sd)
    chex_tree = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    # Shape-check against the randomly initialized tree before replacing it.
    ref_shapes = jax.tree.map(jnp.shape, trainer.state["params"])
    new_shapes = jax.tree.map(jnp.shape, chex_tree)
    assert ref_shapes == new_shapes
    trainer.state["params"] = chex_tree
    trainer.state["batch_stats"] = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32), batch_stats
    )

    key = jax.random.PRNGKey(0)  # unused: augmentations_per_datapoint=0
    jx = jnp.asarray(images_u8)
    jy = jnp.asarray(masks_u8)
    jax_losses = []
    for _ in range(steps):
        trainer.state, loss = trainer._train_step(trainer.state, jx, jy, key)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-4, atol=5e-5)

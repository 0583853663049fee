"""ClipRes + ClipAutoencoder forward parity vs torch twins at fp32.

Completes the CLIP-model family's end-to-end wiring checks
(tests/test_clip_unet_parity.py covers the flagship):

- ClipResSegmentationModel (reference CLIP_models.py:8-61): frozen
  ResNet34 spatial features + 4-head single-token cross-attention,
  skip-less upsample decoder, and the non-negative-logits ConvBlock
  output head quirk.
- ClipAutoencoder (CLIP_models.py:136-191): Linear 512->16384 coupler,
  the NCHW ``.view(-1, 64, 16, 16)`` transpose quirk, and the stem
  skip-concat decoder.

224^2 input so clip_preprocess's resize is the identity.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models import clip as clip_lib
from image_segmentation_tpu.models import resnet as rn
from image_segmentation_tpu.models.clip_models import (
    ClipAutoencoder,
    ClipResSegmentationModel,
)
from image_segmentation_tpu.ops import cross_attention as ca
from image_segmentation_tpu.utils import torch_convert as tc

from tests.test_clip_unet_parity import CLIP_KW, TBlock
from tests.test_resnet import TorchResNet34Features

jax.config.update("jax_default_matmul_precision", "highest")


def _make_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=CLIP_KW["hidden"],
        intermediate_size=CLIP_KW["mlp_dim"],
        num_hidden_layers=CLIP_KW["layers"],
        num_attention_heads=CLIP_KW["heads"],
        image_size=224,
        patch_size=CLIP_KW["patch"],
        projection_dim=CLIP_KW["proj_dim"],
        hidden_act="quick_gelu",
    )
    return CLIPVisionModelWithProjection(cfg)


def _clip_normalize(x):
    mean = torch.tensor(clip_lib.CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(clip_lib.CLIP_STD).view(1, 3, 1, 1)
    return (x - mean) / std


def _randomize_bn(tm):
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)


class TUp(tnn.Module):
    """ConvBlockUpsample twin: ConvTranspose(2,2) -> TBlock."""

    def __init__(self, cin, cout):
        super().__init__()
        self.up = tnn.ConvTranspose2d(cin, cout, 2, 2)
        self.conv_block = TBlock(cout, cout)

    def forward(self, x):
        return self.conv_block(self.up(x))


class TClipRes(tnn.Module):
    def __init__(self, clip_model):
        super().__init__()
        self.clip = clip_model
        self.resnet = TorchResNet34Features()
        self.attn = tnn.MultiheadAttention(512, 4)
        self.dec1 = TUp(512, 256)
        self.dec2 = TUp(256, 128)
        self.dec3 = TUp(128, 64)
        self.dec4 = TUp(64, 32)
        self.dec5 = TUp(32, 16)
        self.out = TBlock(19, 3)

    def forward(self, x):
        feats = self.clip(pixel_values=_clip_normalize(x)).image_embeds
        res = self.resnet(x)
        q = res.flatten(2).permute(2, 0, 1)
        kv = feats.unsqueeze(0).expand(q.shape[0], -1, -1)
        a, _ = self.attn(q, kv, kv)
        a = a.permute(1, 2, 0).view_as(res)
        h = self.dec5(self.dec4(self.dec3(self.dec2(self.dec1(a)))))
        return self.out(torch.cat([h, x], dim=1))


class TClipAutoencoder(tnn.Module):
    def __init__(self, clip_model):
        super().__init__()
        self.clip = clip_model
        self.stem = tnn.Conv2d(3, 32, 1)
        self.coupler = tnn.Linear(512, 16384)
        self.dec1 = TUp(64, 64)
        self.dec2 = TUp(64, 64)
        self.dec3 = TUp(64, 32)
        self.dec4_up = tnn.ConvTranspose2d(32, 32, 2, 2)
        self.dec4_block = TBlock(64, 32)
        self.out = tnn.Conv2d(32, 3, 1)

    def forward(self, x):
        feats = self.clip(pixel_values=_clip_normalize(x)).image_embeds
        stem = self.stem(x)
        b = self.coupler(feats).view(-1, 64, 16, 16)
        h = self.dec3(self.dec2(self.dec1(b)))
        h = self.dec4_up(h)
        h = F.interpolate(
            h, size=stem.shape[2:], mode="bilinear", align_corners=True
        )
        h = self.dec4_block(torch.cat([h, stem], dim=1))
        return self.out(h)


def _clip_subtree(sd):
    return clip_lib.clip_params_from_torch(
        {k[len("clip."):]: v for k, v in sd.items() if k.startswith("clip.")}
    )


def _up_params(prefix, sd):
    return {"up": tc.conv_transpose_params(f"{prefix}.up", sd),
            "conv_block": tc.conv_block_params(f"{prefix}.conv_block", sd)}


def _up_stats(prefix, sd):
    return {"conv_block": tc.conv_block_stats(f"{prefix}.conv_block", sd)}


@pytest.mark.slow
def test_clip_res_forward_parity():
    torch.manual_seed(2)
    tm = TClipRes(_make_clip())
    tm.eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    res_sd = {k[len("resnet."):]: v for k, v in sd.items()
              if k.startswith("resnet.")}
    res_params, res_stats = rn.resnet34_params_from_torch(res_sd)

    params = {
        "clip_tower": _clip_subtree(sd),
        "resnet_backbone": res_params,
        "cross_attention_fusion": ca.mha_params_from_torch(sd, prefix="attn"),
        "out": tc.conv_block_params("out", sd),
    }
    batch_stats = {
        "resnet_backbone": res_stats,
        "out": tc.conv_block_stats("out", sd),
    }
    for i in range(1, 6):
        params[f"dec{i}"] = _up_params(f"dec{i}", sd)
        batch_stats[f"dec{i}"] = _up_stats(f"dec{i}", sd)

    x = torch.rand(2, 3, 224, 224)
    with torch.no_grad():
        ref = tm(x).numpy()

    model = ClipResSegmentationModel(dtype=jnp.float32, clip_kwargs=CLIP_KW)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        jnp.asarray(np.moveaxis(x.numpy(), 1, -1)), train=False,
    )
    out_nchw = np.moveaxis(np.asarray(out), -1, 1)
    assert (out_nchw >= 0).all()  # the non-negative-logits head quirk
    np.testing.assert_allclose(out_nchw, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_clip_autoencoder_forward_parity():
    torch.manual_seed(3)
    tm = TClipAutoencoder(_make_clip())
    tm.eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    params = {
        "clip_tower": _clip_subtree(sd),
        "input": tc.conv_params("stem", sd),
        "coupler": tc.linear_params("coupler", sd),
        "dec1": _up_params("dec1", sd),
        "dec2": _up_params("dec2", sd),
        "dec3": _up_params("dec3", sd),
        "dec4": {"up": tc.conv_transpose_params("dec4_up", sd),
                 "conv_block": tc.conv_block_params("dec4_block", sd)},
        "out": tc.conv_params("out", sd),
    }
    batch_stats = {
        "dec1": _up_stats("dec1", sd),
        "dec2": _up_stats("dec2", sd),
        "dec3": _up_stats("dec3", sd),
        "dec4": {"conv_block": tc.conv_block_stats("dec4_block", sd)},
    }

    x = torch.rand(2, 3, 224, 224)
    with torch.no_grad():
        ref = tm(x).numpy()

    model = ClipAutoencoder(dtype=jnp.float32, clip_kwargs=CLIP_KW)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        jnp.asarray(np.moveaxis(x.numpy(), 1, -1)), train=False,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), ref, rtol=2e-3, atol=2e-3
    )

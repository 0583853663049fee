"""FLAGSHIP forward parity: ClipUnet vs a torch twin at fp32.

Composes every converter in the repo into one end-to-end check of the
flagship wiring (reference CLIP_models.py:63-134): a torch twin built from
transformers CLIPVisionModelWithProjection + torch.nn primitives + the
reference's nn.MultiheadAttention fusion pattern (q = flattened bottleneck,
kv = the CLIP embedding expanded over the query length,
processing_blocks.py:314-322) must match our ClipUnet output bit-close when
both load the SAME weights.

Run at 224x224 input so clip_preprocess's resize is the identity (the
resize itself is distribution-level parity only, tested separately in
test_clip_parity.py::TestPreprocess).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models import clip as clip_lib
from image_segmentation_tpu.models.clip_models import ClipUnet
from image_segmentation_tpu.ops import cross_attention as ca
from image_segmentation_tpu.utils import torch_convert as tc

jax.config.update("jax_default_matmul_precision", "highest")

CLIP_KW = dict(hidden=64, layers=2, heads=4, mlp_dim=128, patch=32,
               proj_dim=512)


class TBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1), tnn.BatchNorm2d(cout),
            tnn.ReLU(),
            tnn.Conv2d(cout, cout, 3, padding=1), tnn.BatchNorm2d(cout),
            tnn.ReLU(),
        )

    def forward(self, x):
        return self.conv(x)


class TClipUnet(tnn.Module):
    """Torch twin of models/clip_models.ClipUnet with a tiny CLIP tower."""

    def __init__(self, clip_model):
        super().__init__()
        self.clip = clip_model
        self.stem = tnn.Conv2d(3, 32, 1)
        self.enc1 = TBlock(32, 64)
        self.enc2 = TBlock(64, 128)
        self.enc3 = TBlock(128, 256)
        self.bottleneck = TBlock(256, 512)
        self.attn = tnn.MultiheadAttention(512, 1)
        self.dec1_up = tnn.ConvTranspose2d(512, 256, 2, 2)
        self.dec1_block = TBlock(512, 256)
        self.dec2_up = tnn.ConvTranspose2d(256, 128, 2, 2)
        self.dec2_block = TBlock(256, 128)
        self.dec3_up = tnn.ConvTranspose2d(128, 64, 2, 2)
        self.dec3_block = TBlock(128, 64)
        self.dec4_up = tnn.ConvTranspose2d(64, 32, 2, 2)
        self.dec4_block = TBlock(64, 32)
        self.out = tnn.Conv2d(32, 3, 1)

    @staticmethod
    def _up(up, block, x, skip):
        x = up(x)
        x = F.interpolate(
            x, size=skip.shape[2:], mode="bilinear", align_corners=True
        )
        return block(torch.cat([x, skip], dim=1))

    def forward(self, x):
        # x in [0,1], (B, 3, 224, 224): CustomClipPreprocessor at native
        # resolution = CLIP mean/std normalize only.
        mean = torch.tensor(clip_lib.CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(clip_lib.CLIP_STD).view(1, 3, 1, 1)
        feats = self.clip(pixel_values=(x - mean) / std).image_embeds

        stem = self.stem(x)
        e1 = F.max_pool2d(self.enc1(stem), 2, 2)
        e2 = F.max_pool2d(self.enc2(e1), 2, 2)
        e3 = F.max_pool2d(self.enc3(e2), 2, 2)
        b = self.bottleneck(e3)

        # reference fusion: q = flattened spatial, kv = CLIP embedding
        # broadcast over the query length (softmax over identical keys).
        q = b.flatten(2).permute(2, 0, 1)               # (HW, B, C)
        kv = feats.unsqueeze(0).expand(q.shape[0], -1, -1)
        a, _ = self.attn(q, kv, kv)
        a = a.permute(1, 2, 0).view_as(b)

        d1 = self._up(self.dec1_up, self.dec1_block, a, e3)
        d2 = self._up(self.dec2_up, self.dec2_block, d1, e2)
        d3 = self._up(self.dec3_up, self.dec3_block, d2, e1)
        d4 = self._up(self.dec4_up, self.dec4_block, d3, stem)
        return self.out(d4)


def _params_from_torch(tm):
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    clip_sd = {k[len("clip."):]: v for k, v in sd.items()
               if k.startswith("clip.")}

    def block(prefix):
        return tc.conv_block_params(prefix, sd)

    def stats(prefix):
        return tc.conv_block_stats(prefix, sd)

    params = {
        "clip_tower": clip_lib.clip_params_from_torch(clip_sd),
        "input": tc.conv_params("stem", sd),
        "enc1": {"conv_block": block("enc1")},
        "enc2": {"conv_block": block("enc2")},
        "enc3": {"conv_block": block("enc3")},
        "bottleneck": block("bottleneck"),
        "cross_attention_fusion": ca.mha_params_from_torch(sd, prefix="attn"),
        "dec1": {"up": tc.conv_transpose_params("dec1_up", sd),
                 "conv_block": block("dec1_block")},
        "dec2": {"up": tc.conv_transpose_params("dec2_up", sd),
                 "conv_block": block("dec2_block")},
        "dec3": {"up": tc.conv_transpose_params("dec3_up", sd),
                 "conv_block": block("dec3_block")},
        "dec4": {"up": tc.conv_transpose_params("dec4_up", sd),
                 "conv_block": block("dec4_block")},
        "out": tc.conv_params("out", sd),
    }
    batch_stats = {
        "enc1": {"conv_block": stats("enc1")},
        "enc2": {"conv_block": stats("enc2")},
        "enc3": {"conv_block": stats("enc3")},
        "bottleneck": stats("bottleneck"),
        "dec1": {"conv_block": stats("dec1_block")},
        "dec2": {"conv_block": stats("dec2_block")},
        "dec3": {"conv_block": stats("dec3_block")},
        "dec4": {"conv_block": stats("dec4_block")},
    }
    return params, batch_stats


@pytest.mark.slow
def test_clip_unet_forward_parity():
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
    torch.manual_seed(0)
    tm = TClipUnet(CLIPVisionModelWithProjection(cfg))
    tm.eval()
    # Randomize BN running stats so eval-mode parity is non-trivial.
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)

    x = torch.rand(2, 3, 224, 224)
    with torch.no_grad():
        ref = tm(x).numpy()

    params, batch_stats = _params_from_torch(tm)
    model = ClipUnet(dtype=jnp.float32, clip_kwargs=CLIP_KW)
    xj = jnp.asarray(np.moveaxis(x.numpy(), 1, -1))
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        xj, train=False,
    )
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

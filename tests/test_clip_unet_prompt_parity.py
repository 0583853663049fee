"""ClipUnetPrompt forward parity vs a torch twin at fp32 (the prompt path,
reference prompt_segmentation.py:32-95): CLIP tower + UNet trunk +
single-token cross-attention + prompt-encoder branch fused at the
bottleneck through the 1x1 "prompt_fusion" conv, 1-channel binary logits.

Same method as tests/test_clip_unet_parity.py (224^2 input so
clip_preprocess's resize is the identity; same converters).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models import clip as clip_lib
from image_segmentation_tpu.models.clip_models import ClipUnetPrompt
from image_segmentation_tpu.ops import cross_attention as ca
from image_segmentation_tpu.utils import torch_convert as tc

from tests.test_clip_unet_parity import CLIP_KW, TBlock, TClipUnet

jax.config.update("jax_default_matmul_precision", "highest")


class TPromptEncoder(tnn.Module):
    """prompt (B,1,H,W) -> 3x [block + pool] -> block(512) at /8."""

    def __init__(self):
        super().__init__()
        self.enc1 = TBlock(1, 32)
        self.enc2 = TBlock(32, 64)
        self.enc3 = TBlock(64, 128)
        self.conv = TBlock(128, 512).conv  # plain ConvBlock named "conv"

    def forward(self, p):
        h = F.max_pool2d(self.enc1(p), 2, 2)
        h = F.max_pool2d(self.enc2(h), 2, 2)
        h = F.max_pool2d(self.enc3(h), 2, 2)
        return self.conv(h)


class TClipUnetPrompt(tnn.Module):
    def __init__(self, clip_model):
        super().__init__()
        self.clip = clip_model
        self.stem = tnn.Conv2d(3, 32, 1)
        self.enc1 = TBlock(32, 64)
        self.enc2 = TBlock(64, 128)
        self.enc3 = TBlock(128, 256)
        self.bottleneck = TBlock(256, 512)
        self.prompt_encoder = TPromptEncoder()
        self.attn = tnn.MultiheadAttention(512, 1)
        self.prompt_fusion = tnn.Conv2d(1024, 512, 1)
        self.dec1_up = tnn.ConvTranspose2d(512, 256, 2, 2)
        self.dec1_block = TBlock(512, 256)
        self.dec2_up = tnn.ConvTranspose2d(256, 128, 2, 2)
        self.dec2_block = TBlock(256, 128)
        self.dec3_up = tnn.ConvTranspose2d(128, 64, 2, 2)
        self.dec3_block = TBlock(128, 64)
        self.dec4_up = tnn.ConvTranspose2d(64, 32, 2, 2)
        self.dec4_block = TBlock(64, 32)
        self.out = tnn.Conv2d(32, 1, 1)

    def forward(self, x, prompt):
        mean = torch.tensor(clip_lib.CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(clip_lib.CLIP_STD).view(1, 3, 1, 1)
        feats = self.clip(pixel_values=(x - mean) / std).image_embeds

        stem = self.stem(x)
        e1 = F.max_pool2d(self.enc1(stem), 2, 2)
        e2 = F.max_pool2d(self.enc2(e1), 2, 2)
        e3 = F.max_pool2d(self.enc3(e2), 2, 2)
        b = self.bottleneck(e3)
        pe = self.prompt_encoder(prompt)

        q = b.flatten(2).permute(2, 0, 1)
        kv = feats.unsqueeze(0).expand(q.shape[0], -1, -1)
        a, _ = self.attn(q, kv, kv)
        a = a.permute(1, 2, 0).view_as(b)

        fused = self.prompt_fusion(torch.cat([a, pe], dim=1))
        d1 = TClipUnet._up(self.dec1_up, self.dec1_block, fused, e3)
        d2 = TClipUnet._up(self.dec2_up, self.dec2_block, d1, e2)
        d3 = TClipUnet._up(self.dec3_up, self.dec3_block, d2, e1)
        d4 = TClipUnet._up(self.dec4_up, self.dec4_block, d3, stem)
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
        "prompt_encoder": {
            "enc1": {"conv_block": block("prompt_encoder.enc1")},
            "enc2": {"conv_block": block("prompt_encoder.enc2")},
            "enc3": {"conv_block": block("prompt_encoder.enc3")},
            "conv": block("prompt_encoder"),
        },
        "cross_attention_fusion": ca.mha_params_from_torch(sd, prefix="attn"),
        "prompt_fusion": tc.conv_params("prompt_fusion", sd),
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
        "prompt_encoder": {
            "enc1": {"conv_block": stats("prompt_encoder.enc1")},
            "enc2": {"conv_block": stats("prompt_encoder.enc2")},
            "enc3": {"conv_block": stats("prompt_encoder.enc3")},
            "conv": stats("prompt_encoder"),
        },
        "dec1": {"conv_block": stats("dec1_block")},
        "dec2": {"conv_block": stats("dec2_block")},
        "dec3": {"conv_block": stats("dec3_block")},
        "dec4": {"conv_block": stats("dec4_block")},
    }
    return params, batch_stats


@pytest.mark.slow
def test_clip_unet_prompt_forward_parity():
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
    torch.manual_seed(1)
    tm = TClipUnetPrompt(CLIPVisionModelWithProjection(cfg))
    tm.eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)

    x = torch.rand(2, 3, 224, 224)
    prompt = torch.rand(2, 1, 224, 224)
    with torch.no_grad():
        ref = tm(x, prompt).numpy()

    params, batch_stats = _params_from_torch(tm)
    model = ClipUnetPrompt(dtype=jnp.float32, clip_kwargs=CLIP_KW)
    xj = jnp.asarray(np.moveaxis(x.numpy(), 1, -1))
    pj = jnp.asarray(np.moveaxis(prompt.numpy(), 1, -1))
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        xj, pj, train=False,
    )
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

"""Reverse converters (utils/torch_export.py): weights trained HERE load
into torch models with the REFERENCE's exact module layout and reproduce
the same outputs.

Twins in this file deliberately mirror the reference's module/key structure
(processing_blocks.py:21-133, UNet.py:36-76, CLIP_models.py:85-134) —
``block.0`` Sequentials, ``conv.conv.{i}`` nesting, packed-in_proj MHA, a
transformers vision model under ``clip_feature_extractor.clip_model`` — so
``load_state_dict(strict=True)`` proves the key layout, and forward parity
proves the value transposes."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.clip_models import (
    ClipAutoencoder,
    ClipResSegmentationModel,
    ClipUnet,
)
from image_segmentation_tpu.models.unet import UNet
from image_segmentation_tpu.utils import torch_export as tx

from tests.test_clip_unet_parity import CLIP_KW
from tests.test_resnet import TorchResNet34Features

jax.config.update("jax_default_matmul_precision", "highest")


# ---- reference-layout torch modules ---------------------------------------

class RefConvBlock(tnn.Module):
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


class RefDownsample(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.block = tnn.Sequential(RefConvBlock(cin, cout), tnn.MaxPool2d(2, 2))

    def forward(self, x):
        return self.block(x)


class RefUpsampleSkip(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.up = tnn.ConvTranspose2d(cin, cout, 2, 2)
        self.conv = RefConvBlock(cout * 2, cout)

    def forward(self, x, skip):
        x = self.up(x)
        x = F.interpolate(
            x, size=skip.shape[2:], mode="bilinear", align_corners=True
        )
        return self.conv(torch.cat([x, skip], dim=1))


class RefUNet(tnn.Module):
    """reference models/UNet.py:36-76 at a CI-sized channel plan."""

    def __init__(self, stem=8, enc=(16, 32)):
        super().__init__()
        self.input = tnn.Conv2d(3, stem, 1)
        chans = [stem] + list(enc)
        for i in range(len(enc)):
            setattr(self, f"enc{i + 1}", RefDownsample(chans[i], chans[i + 1]))
        self.bottleneck = RefConvBlock(enc[-1], 2 * enc[-1])
        dec_in = [2 * enc[-1]] + list(enc[::-1])
        dec_out = list(enc[::-1]) + [stem]
        for i in range(len(dec_out)):
            setattr(self, f"dec{i + 1}", RefUpsampleSkip(dec_in[i], dec_out[i]))
        self.out = tnn.Conv2d(stem, 3, 1)
        self.n_enc = len(enc)

    def forward(self, x):
        stem = self.input(x)
        skips = [stem]
        h = stem
        for i in range(self.n_enc):
            h = getattr(self, f"enc{i + 1}")(h)
            skips.append(h)
        h = self.bottleneck(h)
        for i in range(self.n_enc + 1):
            h = getattr(self, f"dec{i + 1}")(h, skips[-(i + 1)])
        return self.out(h)


def _randomized_variables(model, *inputs, seed=0):
    """init, then randomize BN running stats so eval parity is non-trivial
    (fresh init is mean=0/var=1, which would mask transpose mistakes)."""
    variables = model.init(jax.random.PRNGKey(seed), *inputs, train=False)
    rng = np.random.default_rng(seed)

    def fix(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "var":
                    out[k] = jnp.asarray(
                        rng.uniform(0.5, 2.0, v.shape).astype(np.float32)
                    )
                elif k == "mean":
                    out[k] = jnp.asarray(
                        rng.normal(0, 0.5, v.shape).astype(np.float32)
                    )
                else:
                    out[k] = fix(v)
            return out
        return tree
    return {"params": variables["params"],
            "batch_stats": fix(jax.device_get(variables["batch_stats"]))}


@pytest.mark.slow
def test_unet_export_loads_strict_and_matches():
    x = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 3)), jnp.float32)
    model = UNet(dtype=jnp.float32, stem_features=8, encoder_features=(16, 32))
    variables = _randomized_variables(model, x)
    ref_out = model.apply(variables, x, train=False)

    sd = tx.unet_state_dict(variables["params"], variables["batch_stats"])
    tm = RefUNet(stem=8, enc=(16, 32))
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    tm.eval()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(
            np.moveaxis(np.asarray(x), -1, 1).copy()
        )).numpy()
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ref_out), -1, 1), t_out, rtol=2e-4, atol=2e-4
    )


def test_export_model_torch_format(tmp_path):
    """engine/export.export_model(torch_format=True) ships model_torch.pt
    alongside the npz — the reference huggingface-models bundle shape."""
    from image_segmentation_tpu.engine.export import export_model

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    model = UNet(dtype=jnp.float32, stem_features=8, encoder_features=(16, 32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = export_model(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        "unet",
        model_args={"stem_features": 8, "encoder_features": [16, 32]},
        out_dir=str(tmp_path / "artifact"),
        torch_format=True,
    )
    sd = torch.load(f"{out}/model_torch.pt")
    expect = tx.unet_state_dict(variables["params"], variables["batch_stats"])
    assert set(sd) == set(expect)
    tm = RefUNet(stem=8, enc=(16, 32))
    missing, unexpected = tm.load_state_dict(sd, strict=True)
    assert not missing and not unexpected


class RefClipUnet(tnn.Module):
    """reference CLIP_models.py:85-134 layout with a vision-only CLIP twin
    (the text tower the reference never uses is the only absent subtree)."""

    class _Extractor(tnn.Module):
        def __init__(self, clip_model):
            super().__init__()
            self.clip_model = clip_model

    def __init__(self, clip_model):
        super().__init__()
        self.clip_feature_extractor = self._Extractor(clip_model)
        self.cross_attention_fusion = tnn.Module()
        self.cross_attention_fusion.cross_attn = tnn.MultiheadAttention(512, 1)
        self.input = tnn.Conv2d(3, 32, 1)
        self.enc1 = RefDownsample(32, 64)
        self.enc2 = RefDownsample(64, 128)
        self.enc3 = RefDownsample(128, 256)
        self.bottleneck = RefConvBlock(256, 512)
        self.dec1 = RefUpsampleSkip(512, 256)
        self.dec2 = RefUpsampleSkip(256, 128)
        self.dec3 = RefUpsampleSkip(128, 64)
        self.dec4 = RefUpsampleSkip(64, 32)
        self.out = tnn.Conv2d(32, 3, 1)

    def forward(self, x):
        from image_segmentation_tpu.models import clip as clip_lib

        mean = torch.tensor(clip_lib.CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(clip_lib.CLIP_STD).view(1, 3, 1, 1)
        feats = self.clip_feature_extractor.clip_model(
            pixel_values=(x - mean) / std
        ).image_embeds

        stem = self.input(x)
        e1 = self.enc1(stem)
        e2 = self.enc2(e1)
        e3 = self.enc3(e2)
        b = self.bottleneck(e3)
        q = b.flatten(2).permute(2, 0, 1)
        kv = feats.unsqueeze(0).expand(q.shape[0], -1, -1)
        a, _ = self.cross_attention_fusion.cross_attn(q, kv, kv)
        a = a.permute(1, 2, 0).view_as(b)
        h = self.dec1(a, e3)
        h = self.dec2(h, e2)
        h = self.dec3(h, e1)
        h = self.dec4(h, stem)
        return self.out(h)


@pytest.mark.slow
def test_clip_unet_export_loads_and_matches():
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
    x = jnp.asarray(np.random.default_rng(2).random((2, 224, 224, 3)),
                    jnp.float32)
    model = ClipUnet(dtype=jnp.float32, clip_kwargs=CLIP_KW)
    variables = _randomized_variables(model, x)
    ref_out = model.apply(variables, x, train=False)

    sd = tx.clip_unet_state_dict(variables["params"], variables["batch_stats"])
    torch.manual_seed(5)
    tm = RefClipUnet(CLIPVisionModelWithProjection(cfg))
    # transformers registers a position_ids buffer the exporter need not
    # supply; everything else must match exactly.
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("position_ids" in k for k in missing), missing
    tm.eval()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(
            np.moveaxis(np.asarray(x), -1, 1).copy()
        )).numpy()
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ref_out), -1, 1), t_out, rtol=2e-3, atol=2e-3
    )


class RefUpsample(tnn.Module):
    """reference ConvBlockUpsample (processing_blocks.py:111-133)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.up = tnn.ConvTranspose2d(cin, cout, 2, 2)
        self.conv = RefConvBlock(cout, cout)

    def forward(self, x):
        return self.conv(self.up(x))


def _make_tiny_clip():
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


class RefClipRes(tnn.Module):
    """reference ClipResSegmentationModel layout (CLIP_models.py:8-61):
    the ResNet backbone is Sequential(*resnet34.children()[:-2]) under
    ``encoder.model``."""

    def __init__(self, clip_model):
        super().__init__()

        class _Wrap(tnn.Module):
            def __init__(self, inner):
                super().__init__()
                self.model = inner

        class _Clip(tnn.Module):
            def __init__(self, inner):
                super().__init__()
                self.clip_model = inner

        r = TorchResNet34Features()
        self.clip_feature_extractor = _Clip(clip_model)
        self.encoder = _Wrap(tnn.Sequential(
            r.conv1, r.bn1, r.relu, r.maxpool,
            r.layer1, r.layer2, r.layer3, r.layer4,
        ))
        self.cross_attention_fusion = tnn.Module()
        self.cross_attention_fusion.cross_attn = tnn.MultiheadAttention(512, 4)
        self.dec1 = RefUpsample(512, 256)
        self.dec2 = RefUpsample(256, 128)
        self.dec3 = RefUpsample(128, 64)
        self.dec4 = RefUpsample(64, 32)
        self.dec5 = RefUpsample(32, 16)
        self.out = RefConvBlock(19, 3)

    def forward(self, x):
        from image_segmentation_tpu.models import clip as clip_lib

        mean = torch.tensor(clip_lib.CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(clip_lib.CLIP_STD).view(1, 3, 1, 1)
        feats = self.clip_feature_extractor.clip_model(
            pixel_values=(x - mean) / std
        ).image_embeds
        res = self.encoder.model(x)
        q = res.flatten(2).permute(2, 0, 1)
        kv = feats.unsqueeze(0).expand(q.shape[0], -1, -1)
        a, _ = self.cross_attention_fusion.cross_attn(q, kv, kv)
        a = a.permute(1, 2, 0).view_as(res)
        h = self.dec5(self.dec4(self.dec3(self.dec2(self.dec1(a)))))
        return self.out(torch.cat([h, x], dim=1))


class RefClipAutoencoder(tnn.Module):
    """reference ClipAutoencoder layout (CLIP_models.py:136-191)."""

    def __init__(self, clip_model):
        super().__init__()

        class _Clip(tnn.Module):
            def __init__(self, inner):
                super().__init__()
                self.clip_model = inner

        self.clip_feature_extractor = _Clip(clip_model)
        self.input = tnn.Conv2d(3, 32, 1)
        self.coupler = tnn.Linear(512, 16384)
        self.dec1 = RefUpsample(64, 64)
        self.dec2 = RefUpsample(64, 64)
        self.dec3 = RefUpsample(64, 32)
        self.dec4 = RefUpsampleSkip(32, 32)
        self.out = tnn.Conv2d(32, 3, 1)

    def forward(self, x):
        from image_segmentation_tpu.models import clip as clip_lib

        mean = torch.tensor(clip_lib.CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(clip_lib.CLIP_STD).view(1, 3, 1, 1)
        feats = self.clip_feature_extractor.clip_model(
            pixel_values=(x - mean) / std
        ).image_embeds
        stem = self.input(x)
        b = self.coupler(feats).view(-1, 64, 16, 16)
        h = self.dec3(self.dec2(self.dec1(b)))
        h = self.dec4(h, stem)
        return self.out(h)


@pytest.mark.slow
@pytest.mark.parametrize("which", ["clip_res", "clip_autoencoder"])
def test_clip_family_export_loads_and_matches(which):
    x = jnp.asarray(np.random.default_rng(3).random((2, 224, 224, 3)),
                    jnp.float32)
    if which == "clip_res":
        model = ClipResSegmentationModel(dtype=jnp.float32, clip_kwargs=CLIP_KW)
        twin_cls = RefClipRes
    else:
        model = ClipAutoencoder(dtype=jnp.float32, clip_kwargs=CLIP_KW)
        twin_cls = RefClipAutoencoder
    variables = _randomized_variables(model, x, seed=7)
    ref_out = model.apply(variables, x, train=False)

    sd = tx.EXPORTERS[which](variables["params"], variables["batch_stats"])
    torch.manual_seed(9)
    tm = twin_cls(_make_tiny_clip())
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("position_ids" in k for k in missing), missing
    tm.eval()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(
            np.moveaxis(np.asarray(x), -1, 1).copy()
        )).numpy()
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ref_out), -1, 1), t_out, rtol=2e-3, atol=2e-3
    )


class RefPromptEncoder(tnn.Module):
    """reference prompt_segmentation.py:16-30 layout."""

    def __init__(self):
        super().__init__()
        self.enc1 = RefDownsample(1, 32)
        self.enc2 = RefDownsample(32, 64)
        self.enc3 = RefDownsample(64, 128)
        self.conv = RefConvBlock(128, 512)

    def forward(self, p):
        return self.conv(self.enc3(self.enc2(self.enc1(p))))


class RefClipUnetPrompt(tnn.Module):
    """reference prompt_segmentation.py:32-95 layout."""

    def __init__(self, clip_model):
        super().__init__()

        class _Clip(tnn.Module):
            def __init__(self, inner):
                super().__init__()
                self.clip_model = inner

        self.clip_feature_extractor = _Clip(clip_model)
        self.cross_attention_fusion = tnn.Module()
        self.cross_attention_fusion.cross_attn = tnn.MultiheadAttention(512, 1)
        self.input = tnn.Conv2d(3, 32, 1)
        self.enc1 = RefDownsample(32, 64)
        self.enc2 = RefDownsample(64, 128)
        self.enc3 = RefDownsample(128, 256)
        self.bottleneck = RefConvBlock(256, 512)
        self.prompt_encoder = RefPromptEncoder()
        self.prompt_fusion = tnn.Conv2d(1024, 512, 1)
        self.dec1 = RefUpsampleSkip(512, 256)
        self.dec2 = RefUpsampleSkip(256, 128)
        self.dec3 = RefUpsampleSkip(128, 64)
        self.dec4 = RefUpsampleSkip(64, 32)
        self.out = tnn.Conv2d(32, 1, 1)

    def forward(self, x, prompt):
        from image_segmentation_tpu.models import clip as clip_lib

        mean = torch.tensor(clip_lib.CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(clip_lib.CLIP_STD).view(1, 3, 1, 1)
        feats = self.clip_feature_extractor.clip_model(
            pixel_values=(x - mean) / std
        ).image_embeds
        stem = self.input(x)
        e1 = self.enc1(stem)
        e2 = self.enc2(e1)
        e3 = self.enc3(e2)
        b = self.bottleneck(e3)
        pe = self.prompt_encoder(prompt)
        q = b.flatten(2).permute(2, 0, 1)
        kv = feats.unsqueeze(0).expand(q.shape[0], -1, -1)
        a, _ = self.cross_attention_fusion.cross_attn(q, kv, kv)
        a = a.permute(1, 2, 0).view_as(b)
        fused = self.prompt_fusion(torch.cat([a, pe], dim=1))
        h = self.dec1(fused, e3)
        h = self.dec2(h, e2)
        h = self.dec3(h, e1)
        h = self.dec4(h, stem)
        return self.out(h)


@pytest.mark.slow
def test_clip_unet_prompt_export_loads_and_matches():
    from image_segmentation_tpu.models.clip_models import ClipUnetPrompt

    x = jnp.asarray(np.random.default_rng(4).random((2, 224, 224, 3)),
                    jnp.float32)
    prompt = jnp.asarray(np.random.default_rng(5).random((2, 224, 224, 1)),
                         jnp.float32)
    model = ClipUnetPrompt(dtype=jnp.float32, clip_kwargs=CLIP_KW)
    variables = _randomized_variables(model, x, prompt, seed=8)
    ref_out = model.apply(variables, x, prompt, train=False)

    sd = tx.clip_unet_prompt_state_dict(
        variables["params"], variables["batch_stats"]
    )
    torch.manual_seed(11)
    tm = RefClipUnetPrompt(_make_tiny_clip())
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("position_ids" in k for k in missing), missing
    tm.eval()
    with torch.no_grad():
        t_out = tm(
            torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy()),
            torch.from_numpy(np.moveaxis(np.asarray(prompt), -1, 1).copy()),
        ).numpy()
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ref_out), -1, 1), t_out, rtol=2e-3, atol=2e-3
    )

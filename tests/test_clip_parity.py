"""CLIP vision tower: numerical parity vs transformers (random-init config —
pretrained weights use the exact same converter) and preprocessing checks."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models import clip as clip_lib

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def small_torch_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        projection_dim=48,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(cfg)
    model.eval()
    return model, cfg


class TestTowerParity:
    def test_get_image_features_parity(self, small_torch_clip):
        model, cfg = small_torch_clip
        pixels = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            ref = model(pixel_values=pixels).image_embeds.numpy()

        tower = clip_lib.ClipVisionTower(
            hidden=64, layers=2, heads=4, mlp_dim=128, patch=16, proj_dim=48,
            dtype=jnp.float32,
        )
        params = clip_lib.clip_params_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()}
        )
        pixels_j = jnp.asarray(np.moveaxis(pixels.numpy(), 1, -1))
        out = tower.apply({"params": params}, pixels_j)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)

    def test_default_config_is_vit_b32(self):
        t = clip_lib.ClipVisionTower()
        assert (t.hidden, t.layers, t.heads, t.patch, t.proj_dim) == (
            768, 12, 12, 32, 512,
        )


class TestPreprocess:
    def test_resize_and_normalize(self):
        imgs = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
        out = clip_lib.clip_preprocess(imgs)
        assert out.shape == (1, 224, 224, 3)
        expected = (0.5 - np.array(clip_lib.CLIP_MEAN)) / np.array(clip_lib.CLIP_STD)
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], expected, rtol=1e-5)

    def test_no_resize_at_224(self):
        imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
        out = clip_lib.clip_preprocess(imgs)
        expected = -np.array(clip_lib.CLIP_MEAN) / np.array(clip_lib.CLIP_STD)
        np.testing.assert_allclose(np.asarray(out)[0, 5, 5], expected, rtol=1e-5)


def test_quick_gelu_matches_transformers():
    x = torch.linspace(-3, 3, 13)
    from transformers.activations import ACT2FN

    ref = ACT2FN["quick_gelu"](x).numpy()
    ours = np.asarray(clip_lib.quick_gelu(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

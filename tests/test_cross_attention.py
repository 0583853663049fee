"""Cross-attention: Pallas kernel vs oracle, and CrossAttentionFusion vs
torch nn.MultiheadAttention (reference processing_blocks.py:287-322)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from image_segmentation_tpu.ops import cross_attention as ca

jax.config.update("jax_default_matmul_precision", "highest")
KEY = jax.random.PRNGKey(0)


class TestPallasKernel:
    @pytest.mark.parametrize("heads,s", [(1, 1), (4, 1), (4, 3), (2, 8)])
    def test_matches_oracle(self, heads, s):
        b, l, d = 2, 64, 32
        kq, kk, kv = jax.random.split(KEY, 3)
        q = jax.random.normal(kq, (b, l, d), jnp.float32)
        k = jax.random.normal(kk, (b, s, d), jnp.float32)
        v = jax.random.normal(kv, (b, s, d), jnp.float32)
        out = ca.pallas_cross_attention(q, k, v, heads, block_q=32)
        ref = ca.reference_cross_attention(q, k, v, heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_single_kv_output_query_independent(self):
        b, l, d = 1, 16, 8
        k = jax.random.normal(KEY, (b, 1, d))
        v = jax.random.normal(jax.random.fold_in(KEY, 1), (b, 1, d))
        q1 = jax.random.normal(jax.random.fold_in(KEY, 2), (b, l, d))
        q2 = jax.random.normal(jax.random.fold_in(KEY, 3), (b, l, d))
        o1 = ca.reference_cross_attention(q1, k, v, 1)
        o2 = ca.reference_cross_attention(q2, k, v, 1)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


class TestFusionVsTorch:
    @pytest.mark.parametrize("heads", [1, 4])
    def test_single_token_matches_torch_mha(self, heads):
        """The flagship configuration: query = spatial map, kv = 1 CLIP token.
        Validates both the analytic fast path and mha_params_from_torch."""
        torch.manual_seed(0)
        c, b, h, w = 32, 2, 4, 4
        mha = torch.nn.MultiheadAttention(embed_dim=c, num_heads=heads)
        mha.eval()

        spatial = torch.randn(b, c, h, w)
        clip = torch.randn(b, c)
        # reference forward (processing_blocks.py:314-322)
        q = spatial.flatten(2).permute(2, 0, 1)          # (H*W, B, C)
        kv = clip.unsqueeze(0).expand(h * w, -1, -1)     # (H*W, B, C)
        with torch.no_grad():
            ref, _ = mha(q, kv, kv)
        ref = ref.permute(1, 2, 0).view(b, c, h, w).numpy()

        m = ca.CrossAttentionFusion(c, num_heads=heads, dtype=jnp.float32)
        params = ca.mha_params_from_torch(
            {k: v.detach().numpy() for k, v in mha.state_dict().items()},
            prefix="",
        )
        spatial_j = jnp.asarray(np.moveaxis(spatial.numpy(), 1, -1))
        out = m.apply({"params": params}, spatial_j, jnp.asarray(clip.numpy()))
        out = np.moveaxis(np.asarray(out), -1, 1)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_mha_params_from_torch_empty_prefix():
    torch.manual_seed(1)
    mha = torch.nn.MultiheadAttention(embed_dim=16, num_heads=2)
    sd = {k: v.detach().numpy() for k, v in mha.state_dict().items()}
    p = ca.mha_params_from_torch(sd, prefix="")
    assert p["q_proj"]["kernel"].shape == (16, 16)
    assert p["out_proj"]["bias"].shape == (16,)

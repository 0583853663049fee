"""Fused cross-attention for CLIP-feature conditioning.

Reference op: ``CrossAttentionFusion`` (processing_blocks.py:287-322) — an
``nn.MultiheadAttention`` whose query is the flattened spatial feature map
(H*W tokens) and whose key/value is a single CLIP embedding broadcast to
every query position.  BASELINE.json's north star asks for this as a single
fused Pallas kernel.

Two executable paths, mathematically identical:

1. :func:`pallas_cross_attention` — the general blockwise TPU kernel
   (queries tiled over the grid, K/V resident in VMEM; exact softmax since
   the kv sequence fits one block).  Written blockwise-safe for 512x512
   inputs (4096 spatial queries).
2. An analytic fast path used automatically when the kv sequence length is
   1: softmax over a single key is identically 1, so the attention output is
   ``out_proj(v_proj(context))`` broadcast over all query positions —
   independent of the query and of num_heads.  This is an exact property of
   the reference model (both its num_heads=1 and num_heads=4 uses), not an
   approximation, and turns the op into two tiny matmuls.

Parameterization matches torch ``nn.MultiheadAttention`` (packed
``in_proj_weight`` (3C, C) + ``out_proj``) via
:func:`mha_params_from_torch`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Pallas kernel (general kv length)
# ---------------------------------------------------------------------------


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, *, num_heads: int, scale: float, s_valid: int
):
    """One (batch, q-block) step.  K/V arrive PADDED to a lane-friendly S
    (>= 128): skinny kv dims otherwise make Mosaic materialize transposes /
    broadcasts it cannot lay out ("Invalid input layout" at S=1; compile
    hang at S=8 on this toolchain).  Padded keys are masked to -inf before
    the softmax, so the result is exact for the s_valid real tokens."""
    q = q_ref[0]  # (BLq, D)
    k = k_ref[0]  # (S_pad, D)
    v = v_ref[0]  # (S_pad, D)
    d = q.shape[-1]
    s_pad = k.shape[0]
    dh = d // num_heads
    if s_valid < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], s_pad), 1)
        pad_mask = col >= s_valid
    else:
        pad_mask = None
    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        # contract over dh WITHOUT transposing k (dims (1,1)): Mosaic
        # handles the contraction natively.
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLq, S_pad)
        if pad_mask is not None:
            scores = jnp.where(pad_mask, -jnp.inf, scores)
        w = jax.nn.softmax(scores, axis=-1)
        outs.append(
            jnp.dot(w.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def pallas_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    block_q: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """softmax(QK^T/sqrt(dh)) V with per-head blocking.

    q: (B, L, D); k, v: (B, S, D).  L is tiled over the grid; S stays fully
    VMEM-resident (S is tiny for CLIP conditioning), so the softmax is exact
    without streaming corrections.
    """
    b, l, d = q.shape
    s = k.shape[1]
    if d % num_heads:
        raise ValueError(f"embed dim {d} not divisible by num_heads {num_heads}")
    block_q = min(block_q, l)
    if l % block_q:
        raise ValueError(f"query length {l} not divisible by block_q {block_q}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / float(np.sqrt(d // num_heads))

    # pad the kv length to a lane-friendly size (see _attn_kernel)
    s_pad = max(128, -(-s // 128) * 128)
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, scale=scale, s_valid=s
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        grid=(b, l // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, v)


def reference_cross_attention(q, k, v, num_heads):
    """Pure-jnp oracle for the kernel (used in tests)."""
    b, l, d = q.shape
    s = k.shape[1]
    dh = d // num_heads
    qh = q.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhld,bhsd->bhls", qh, kh) / np.sqrt(dh)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhls,bhsd->bhld", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, l, d)


# ---------------------------------------------------------------------------
# The fusion module (torch nn.MultiheadAttention parameterization)
# ---------------------------------------------------------------------------


class CrossAttentionFusion(nn.Module):
    """Reference CrossAttentionFusion (processing_blocks.py:287-322).

    __call__(spatial NHWC, context (B, S, D) or (B, D)) -> NHWC fused map.
    """

    embed_dim: int
    num_heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, spatial: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = spatial.shape
        if c != self.embed_dim:
            raise ValueError(f"spatial channels {c} != embed_dim {self.embed_dim}")
        if context.ndim == 2:
            context = context[:, None, :]  # (B, 1, D)
        s = context.shape[1]

        dense = functools.partial(
            nn.Dense, self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32
        )
        q_proj = dense(name="q_proj")
        k_proj = dense(name="k_proj")
        v_proj = dense(name="v_proj")
        out_proj = dense(name="out_proj")

        ctx = context.astype(self.dtype)
        if s == 1:
            # Softmax over one key == 1: output is query-independent.  NB
            # q_proj/k_proj are never CALLED here, so under nn.compact their
            # params do not materialize (their values cannot affect the
            # output; utils/torch_export.mha_to_torch zero-fills them).
            fused = out_proj(v_proj(ctx))  # (B, 1, D)
            return jnp.broadcast_to(fused[:, None, :, :], (b, h, w, c)).reshape(
                b, h, w, c
            )

        q = q_proj(spatial.reshape(b, h * w, c).astype(self.dtype))
        k = k_proj(ctx)
        v = v_proj(ctx)
        attn = pallas_cross_attention(q, k, v, self.num_heads)
        return out_proj(attn).reshape(b, h, w, c)


def mha_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str = "cross_attn") -> Dict:
    """torch nn.MultiheadAttention state dict -> CrossAttentionFusion params.

    torch packs q/k/v as in_proj_weight (3C, C) + in_proj_bias (3C,); torch
    Linear weights are (out, in) so each slice transposes into a flax kernel.
    """
    p = f"{prefix}." if prefix else ""
    w = np.asarray(sd[p + "in_proj_weight"])
    bias = np.asarray(sd[p + "in_proj_bias"])
    c = w.shape[1]
    out_w = np.asarray(sd[p + "out_proj.weight"])
    out_b = np.asarray(sd[p + "out_proj.bias"])
    return {
        "q_proj": {"kernel": w[:c].T, "bias": bias[:c]},
        "k_proj": {"kernel": w[c : 2 * c].T, "bias": bias[c : 2 * c]},
        "v_proj": {"kernel": w[2 * c :].T, "bias": bias[2 * c :]},
        "out_proj": {"kernel": out_w.T, "bias": out_b},
    }

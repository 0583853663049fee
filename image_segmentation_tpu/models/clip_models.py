"""CLIP-conditioned segmentation models + prompt models.

Re-designs of reference ``models/CLIP_models.py`` and
``models/prompt_segmentation.py`` in NHWC/bf16 with the fused
cross-attention op (ops/cross_attention.py):

- :class:`ClipUnet`              ~ CLIP_models.py:63-134 (the flagship)
- :class:`ClipResSegmentationModel` ~ CLIP_models.py:8-61
- :class:`ClipAutoencoder`       ~ CLIP_models.py:136-191
- :class:`PromptEncoder`         ~ prompt_segmentation.py:16-30
- :class:`ClipUnetPrompt`        ~ prompt_segmentation.py:32-95

The CLIP tower (and ClipRes's ResNet backbone) are frozen: their outputs are
wrapped in ``stop_gradient`` (reference freezes via requires_grad=False,
processing_blocks.py:215-220,268-275) and the Trainer additionally masks
their optimizer updates (see FROZEN_PREFIXES).  BatchNorm running stats of
the frozen ResNet still update in train mode — exactly torch's behaviour.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.cross_attention import CrossAttentionFusion
from . import folded
from .blocks import ConvBlock, ConvBlockDownsample, ConvBlockUpsample, ConvBlockUpsampleSkip
from .clip import ClipVisionTower, clip_preprocess
from .registry import register
from .resnet import ResNet34Features

# Param subtrees whose optimizer updates are masked to zero (torch skips
# requires_grad=False params entirely).
FROZEN_PREFIXES = ("clip_tower", "resnet_backbone")


class ClipUnet(nn.Module):
    """U-Net whose bottleneck is fused with the frozen CLIP image embedding
    via single-kv cross-attention (CLIP_models.py:63-134)."""

    out_channels: int = 3
    dtype: Any = jnp.bfloat16
    freeze_clip: bool = True
    clip_kwargs: Optional[Mapping] = None  # tower overrides (tests/small cfgs)
    # exact width-to-depth fast path for the full-resolution level
    # (models/folded.py; shared parameter tree, equivalence tested)
    w2d_level0: bool = False
    # also fold level 1 at f/2 — the relayout-free chain that lifted the
    # LargeUNet headline (models/unet.py w2d_level1_fold2); requires
    # w2d_level0 and fold >= 4
    w2d_level1_fold2: bool = False
    # folded-conv implementation ("dense" / "halo" / "pallas" /
    # "pallas_fused"), see models/folded.FoldedConv[Block]
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        clip_feats = ClipVisionTower(
            dtype=self.dtype, name="clip_tower", **(self.clip_kwargs or {})
        )(clip_preprocess(x))
        if self.freeze_clip:
            clip_feats = jax.lax.stop_gradient(clip_feats)

        use_fold = self.w2d_level0 and x.shape[2] % (2 * folded.FOLD) == 0
        fold_l1_2 = (
            use_fold and self.w2d_level1_fold2 and folded.FOLD == 4
        )
        if use_fold:
            f = folded.FOLD
            b, hh, ww, cin = x.shape
            stem4 = folded.Folded1x1(
                cin, 32, f, self.dtype, name="input"
            )(x.reshape(b, hh, ww // f, f * cin))
            h4 = folded.FoldedConvBlockDownsample(
                32, 64, f, self.dtype, impl=self.w2d_impl, name="enc1"
            )(stem4, train=train)
            enc1_folded = h4  # fold f//2 layout (pool halves the fold)
            enc1 = None if fold_l1_2 else folded.d2w(h4, 64, f // 2)
        else:
            stem = nn.Conv(
                32, (1, 1), padding="VALID", dtype=self.dtype, name="input"
            )(x)
            enc1 = ConvBlockDownsample(64, dtype=self.dtype, name="enc1")(
                stem, train=train
            )
        if fold_l1_2:
            # enc2 at fold f/2: enc1's pool output IS the canonical fold-f/2
            # layout, and the fold-f/2 pool output IS the unfolded enc2
            # result — zero relayouts (models/unet.py w2d_level1_fold2).
            enc2 = folded.FoldedConvBlockDownsample(
                64, 128, folded.FOLD // 2, self.dtype, impl=self.w2d_impl,
                name="enc2"
            )(enc1_folded, train=train)
        else:
            enc2 = ConvBlockDownsample(128, dtype=self.dtype, name="enc2")(
                enc1, train=train
            )
        enc3 = ConvBlockDownsample(256, dtype=self.dtype, name="enc3")(enc2, train=train)
        bottleneck = ConvBlock(512, dtype=self.dtype, name="bottleneck")(
            enc3, train=train
        )

        attn = CrossAttentionFusion(512, num_heads=1, dtype=self.dtype,
                                    name="cross_attention_fusion")(
            bottleneck, clip_feats
        )

        h = ConvBlockUpsampleSkip(256, dtype=self.dtype, name="dec1")(attn, enc3, train=train)
        h = ConvBlockUpsampleSkip(128, dtype=self.dtype, name="dec2")(h, enc2, train=train)
        if fold_l1_2:
            # dec3 at fold f/2: skip is enc1's pool output in its natural
            # fold-f/2 layout; the block's output feeds dec4's up-conv as
            # the (W/m, m*C) slot-major view directly (in_folded).
            h = folded.FoldedConvBlockUpsampleSkip(
                128, 64, folded.FOLD // 2, self.dtype, impl=self.w2d_impl,
                name="dec3",
            )(h, enc1_folded, train=train)
        else:
            h = ConvBlockUpsampleSkip(64, dtype=self.dtype, name="dec3")(h, enc1, train=train)
        if use_fold:
            h4 = folded.FoldedConvBlockUpsampleSkip(
                64, 32, folded.FOLD, self.dtype, impl=self.w2d_impl,
                in_folded=fold_l1_2, name="dec4"
            )(h, stem4, train=train)
            out4 = folded.Folded1x1(
                32, self.out_channels, folded.FOLD, self.dtype, name="out"
            )(h4)
            return folded.d2w(out4, self.out_channels, folded.FOLD).astype(
                jnp.float32
            )
        h = ConvBlockUpsampleSkip(32, dtype=self.dtype, name="dec4")(h, stem, train=train)
        out = nn.Conv(
            self.out_channels, (1, 1), padding="VALID", dtype=self.dtype, name="out"
        )(h)
        return out.astype(jnp.float32)


class ClipResSegmentationModel(nn.Module):
    """Frozen ResNet34 spatial features fused with CLIP embedding, skip-less
    upsample decoder, ConvBlock output head on concat(dec5, X)
    (CLIP_models.py:8-61).  NB the output head is a ConvBlock (BN+ReLU), so
    logits are non-negative — a reference quirk reproduced as-is."""

    out_channels: int = 3
    dtype: Any = jnp.bfloat16
    freeze_clip: bool = True
    freeze_backbone: bool = True
    clip_kwargs: Optional[Mapping] = None
    # width-to-depth fast path for the decoder's full-resolution level
    # (dec5 + the 19-channel output ConvBlock; exact, shared tree)
    w2d_level0: bool = False
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        clip_feats = ClipVisionTower(
            dtype=self.dtype, name="clip_tower", **(self.clip_kwargs or {})
        )(clip_preprocess(x))
        if self.freeze_clip:
            clip_feats = jax.lax.stop_gradient(clip_feats)
        res = ResNet34Features(dtype=self.dtype, name="resnet_backbone")(
            x, train=train
        )
        if self.freeze_backbone:
            res = jax.lax.stop_gradient(res)

        attn = CrossAttentionFusion(512, num_heads=4, dtype=self.dtype,
                                    name="cross_attention_fusion")(res, clip_feats)

        h = ConvBlockUpsample(256, dtype=self.dtype, name="dec1")(attn, train=train)
        h = ConvBlockUpsample(128, dtype=self.dtype, name="dec2")(h, train=train)
        h = ConvBlockUpsample(64, dtype=self.dtype, name="dec3")(h, train=train)
        h = ConvBlockUpsample(32, dtype=self.dtype, name="dec4")(h, train=train)
        f = folded.FOLD
        if self.w2d_level0 and (2 * h.shape[2]) % f == 0:
            h4 = folded.FoldedConvBlockUpsample(
                32, 16, f, self.dtype, impl=self.w2d_impl, name="dec5"
            )(h, train=train)
            b, hh, ww, cin = x.shape
            x4 = x.reshape(b, hh, ww // f, f * cin)
            h4 = jnp.concatenate([h4, x4.astype(h4.dtype)], axis=-1)
            out4 = folded.FoldedConvBlock(
                16 + cin, self.out_channels, f, self.dtype,
                in_perm=folded.concat_perm(16, cin, f),
                impl=self.w2d_impl, name="out",
            )(h4, train=train)
            return folded.d2w(out4, self.out_channels, f).astype(jnp.float32)
        h = ConvBlockUpsample(16, dtype=self.dtype, name="dec5")(h, train=train)
        h = jnp.concatenate([h, x], axis=-1)  # 16 + 3 = 19 channels
        out = ConvBlock(self.out_channels, dtype=self.dtype, name="out")(
            h, train=train
        )
        return out.astype(jnp.float32)


class ClipAutoencoder(nn.Module):
    """CLIP embedding -> Linear 512->16384 -> (16,16,64) -> 3 upsamples ->
    skip-concat with the input stem (CLIP_models.py:136-191).  A segmentation
    model despite its name (reference docstring, CLIP_models.py:139-143)."""

    out_channels: int = 3
    dtype: Any = jnp.bfloat16
    freeze_clip: bool = True
    clip_kwargs: Optional[Mapping] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        clip_feats = ClipVisionTower(
            dtype=self.dtype, name="clip_tower", **(self.clip_kwargs or {})
        )(clip_preprocess(x))
        if self.freeze_clip:
            clip_feats = jax.lax.stop_gradient(clip_feats)

        stem = nn.Conv(32, (1, 1), padding="VALID", dtype=self.dtype, name="input")(x)
        b = x.shape[0]
        bottleneck = nn.Dense(16384, dtype=self.dtype, name="coupler")(
            clip_feats.astype(self.dtype)
        )
        # torch .view(-1, 64, 16, 16) is channel-major: NCHW -> NHWC transpose.
        bottleneck = bottleneck.reshape(b, 64, 16, 16).transpose(0, 2, 3, 1)

        h = ConvBlockUpsample(64, dtype=self.dtype, name="dec1")(bottleneck, train=train)
        h = ConvBlockUpsample(64, dtype=self.dtype, name="dec2")(h, train=train)
        h = ConvBlockUpsample(32, dtype=self.dtype, name="dec3")(h, train=train)
        h = ConvBlockUpsampleSkip(32, dtype=self.dtype, name="dec4")(h, stem, train=train)
        out = nn.Conv(
            self.out_channels, (1, 1), padding="VALID", dtype=self.dtype, name="out"
        )(h)
        return out.astype(jnp.float32)


class ClipResSegmentationClassification(nn.Module):
    """Joint binary segmentation + cat/dog classification.

    The reference *intends* this model: ``scripts/segment_classifier_model_
    train.py`` trains a ``ClipResSegmentationClassification`` on
    ``ClassImageDataset`` (binary any-animal mask + scalar class label,
    datasets.py:417-471) but the class is defined nowhere (SURVEY.md §7
    known defects).  This is a working realization: the ClipRes trunk
    produces the binary mask logits; a linear head on the (frozen) CLIP
    embedding produces the cat/dog logit.

    Returns (mask_logits (B,H,W,1), class_logits (B,1)).
    """

    dtype: Any = jnp.bfloat16
    freeze_clip: bool = True
    freeze_backbone: bool = True
    clip_kwargs: Optional[Mapping] = None
    # width-to-depth fast path for the decoder's full-resolution level
    # (as in ClipResSegmentationModel; the 1x1 mask head runs as a
    # permuted block-diagonal matmul)
    w2d_level0: bool = False
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        x = x.astype(self.dtype)
        clip_feats = ClipVisionTower(
            dtype=self.dtype, name="clip_tower", **(self.clip_kwargs or {})
        )(clip_preprocess(x))
        if self.freeze_clip:
            clip_feats = jax.lax.stop_gradient(clip_feats)
        res = ResNet34Features(dtype=self.dtype, name="resnet_backbone")(
            x, train=train
        )
        if self.freeze_backbone:
            res = jax.lax.stop_gradient(res)

        attn = CrossAttentionFusion(512, num_heads=4, dtype=self.dtype,
                                    name="cross_attention_fusion")(res, clip_feats)
        h = ConvBlockUpsample(256, dtype=self.dtype, name="dec1")(attn, train=train)
        h = ConvBlockUpsample(128, dtype=self.dtype, name="dec2")(h, train=train)
        h = ConvBlockUpsample(64, dtype=self.dtype, name="dec3")(h, train=train)
        h = ConvBlockUpsample(32, dtype=self.dtype, name="dec4")(h, train=train)
        f = folded.FOLD
        if self.w2d_level0 and (2 * h.shape[2]) % f == 0:
            h4 = folded.FoldedConvBlockUpsample(
                32, 16, f, self.dtype, impl=self.w2d_impl, name="dec5"
            )(h, train=train)
            b, hh, ww, cin = x.shape
            x4 = x.reshape(b, hh, ww // f, f * cin)
            h4 = jnp.concatenate([h4, x4.astype(h4.dtype)], axis=-1)
            mask4 = folded.Folded1x1(
                16 + cin, 1, f, self.dtype,
                in_perm=folded.concat_perm(16, cin, f), name="mask_out",
            )(h4)
            mask_logits = folded.d2w(mask4, 1, f).astype(jnp.float32)
        else:
            h = ConvBlockUpsample(16, dtype=self.dtype, name="dec5")(h, train=train)
            h = jnp.concatenate([h, x], axis=-1)
            mask_logits = nn.Conv(
                1, (1, 1), padding="VALID", dtype=self.dtype, name="mask_out"
            )(h).astype(jnp.float32)
        class_logits = nn.Dense(1, dtype=self.dtype, name="class_head")(
            clip_feats.astype(self.dtype)
        ).astype(jnp.float32)
        return mask_logits, class_logits


class PromptEncoder(nn.Module):
    """1-channel heatmap -> 3 downsamples -> ConvBlock(512) at /8
    (prompt_segmentation.py:16-30)."""

    out_features: int = 512
    dtype: Any = jnp.bfloat16
    # width-to-depth fast path for the full-resolution level (the 1-channel
    # heatmap folds to (B, H, W/f, f) by a plain reshape); shared parameter
    # tree with the standard path, equivalence tested.
    w2d_level0: bool = False
    w2d_level1_fold2: bool = False
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(self, prompt: jax.Array, *, train: bool = False) -> jax.Array:
        f = folded.FOLD
        use_fold = self.w2d_level0 and prompt.shape[2] % (2 * f) == 0
        fold2 = use_fold and self.w2d_level1_fold2 and f == 4
        if use_fold:
            b, hh, ww, c = prompt.shape
            h4 = folded.FoldedConvBlockDownsample(
                c, 32, f, self.dtype, impl=self.w2d_impl,
                # The heatmap is a model INPUT: its cotangent is never
                # consumed, so the fused backward skips the conv1 dx
                # kernel (0.9 ms of the prompt@256 batch-32 step).  If a
                # future caller differentiates w.r.t. the prompt (saliency
                # / prompt optimization), this MUST become input_grad=True
                # — the fused path otherwise yields silently-zero prompt
                # gradients (models/folded.py FoldedConvBlock.input_grad).
                input_grad=False, name="enc1",
            )(
                prompt.astype(self.dtype).reshape(b, hh, ww // f, f * c),
                train=train,
            )
            if fold2:
                h = folded.FoldedConvBlockDownsample(
                    32, 64, f // 2, self.dtype, impl=self.w2d_impl,
                    name="enc2"
                )(h4, train=train)
            else:
                h = ConvBlockDownsample(64, dtype=self.dtype, name="enc2")(
                    folded.d2w(h4, 32, f // 2), train=train
                )
        else:
            h = ConvBlockDownsample(32, dtype=self.dtype, name="enc1")(
                prompt.astype(self.dtype), train=train
            )
            h = ConvBlockDownsample(64, dtype=self.dtype, name="enc2")(h, train=train)
        h = ConvBlockDownsample(128, dtype=self.dtype, name="enc3")(h, train=train)
        return ConvBlock(self.out_features, dtype=self.dtype, name="conv")(
            h, train=train
        )


class ClipUnetPrompt(nn.Module):
    """ClipUnet + prompt branch fused at the bottleneck
    (prompt_segmentation.py:32-95); 1-channel binary logits out."""

    out_channels: int = 1
    dtype: Any = jnp.bfloat16
    freeze_clip: bool = True
    clip_kwargs: Optional[Mapping] = None
    # width-to-depth fast paths, exactly as in ClipUnet (shared parameter
    # tree; equivalence tested).  Also folds the PROMPT branch's
    # full-resolution level (its enc1 is a level-0 conv too).
    w2d_level0: bool = False
    w2d_level1_fold2: bool = False
    w2d_impl: str = "dense"

    @nn.compact
    def __call__(
        self, x: jax.Array, prompt: jax.Array, *, train: bool = False
    ) -> jax.Array:
        x = x.astype(self.dtype)
        if prompt.ndim == 3:
            prompt = prompt[..., None]
        clip_feats = ClipVisionTower(
            dtype=self.dtype, name="clip_tower", **(self.clip_kwargs or {})
        )(clip_preprocess(x))
        if self.freeze_clip:
            clip_feats = jax.lax.stop_gradient(clip_feats)

        f = folded.FOLD
        use_fold = self.w2d_level0 and x.shape[2] % (2 * f) == 0
        fold_l1_2 = use_fold and self.w2d_level1_fold2 and f == 4
        if use_fold:
            b, hh, ww, cin = x.shape
            stem4 = folded.Folded1x1(
                cin, 32, f, self.dtype, name="input"
            )(x.reshape(b, hh, ww // f, f * cin))
            h4 = folded.FoldedConvBlockDownsample(
                32, 64, f, self.dtype, impl=self.w2d_impl, name="enc1"
            )(stem4, train=train)
            enc1_folded = h4
            enc1 = None if fold_l1_2 else folded.d2w(h4, 64, f // 2)
            if fold_l1_2:
                enc2 = folded.FoldedConvBlockDownsample(
                    64, 128, f // 2, self.dtype, impl=self.w2d_impl,
                    name="enc2"
                )(enc1_folded, train=train)
            else:
                enc2 = ConvBlockDownsample(128, dtype=self.dtype, name="enc2")(
                    enc1, train=train
                )
        else:
            stem = nn.Conv(32, (1, 1), padding="VALID", dtype=self.dtype, name="input")(x)
            enc1 = ConvBlockDownsample(64, dtype=self.dtype, name="enc1")(stem, train=train)
            enc2 = ConvBlockDownsample(128, dtype=self.dtype, name="enc2")(enc1, train=train)
        enc3 = ConvBlockDownsample(256, dtype=self.dtype, name="enc3")(enc2, train=train)
        bottleneck = ConvBlock(512, dtype=self.dtype, name="bottleneck")(
            enc3, train=train
        )

        prompt_emb = PromptEncoder(
            512, dtype=self.dtype, w2d_level0=self.w2d_level0,
            w2d_level1_fold2=self.w2d_level1_fold2, w2d_impl=self.w2d_impl,
            name="prompt_encoder",
        )(prompt, train=train)
        attn = CrossAttentionFusion(512, num_heads=1, dtype=self.dtype,
                                    name="cross_attention_fusion")(
            bottleneck, clip_feats
        )
        fused = jnp.concatenate([attn.astype(self.dtype), prompt_emb], axis=-1)
        fused = nn.Conv(
            512, (1, 1), padding="VALID", dtype=self.dtype, name="prompt_fusion"
        )(fused)

        h = ConvBlockUpsampleSkip(256, dtype=self.dtype, name="dec1")(fused, enc3, train=train)
        h = ConvBlockUpsampleSkip(128, dtype=self.dtype, name="dec2")(h, enc2, train=train)
        if fold_l1_2:
            h = folded.FoldedConvBlockUpsampleSkip(
                128, 64, f // 2, self.dtype, impl=self.w2d_impl, name="dec3",
            )(h, enc1_folded, train=train)
        else:
            h = ConvBlockUpsampleSkip(64, dtype=self.dtype, name="dec3")(h, enc1, train=train)
        if use_fold:
            h4 = folded.FoldedConvBlockUpsampleSkip(
                64, 32, f, self.dtype, impl=self.w2d_impl,
                in_folded=fold_l1_2, name="dec4"
            )(h, stem4, train=train)
            out4 = folded.Folded1x1(
                32, self.out_channels, f, self.dtype, name="out"
            )(h4)
            return folded.d2w(out4, self.out_channels, f).astype(jnp.float32)
        h = ConvBlockUpsampleSkip(32, dtype=self.dtype, name="dec4")(h, stem, train=train)
        out = nn.Conv(
            self.out_channels, (1, 1), padding="VALID", dtype=self.dtype, name="out"
        )(h)
        return out.astype(jnp.float32)


register("clip_unet")(lambda **kw: ClipUnet(**kw))
register("clip_res")(lambda **kw: ClipResSegmentationModel(**kw))
register("clip_autoencoder")(lambda **kw: ClipAutoencoder(**kw))
register("clip_unet_prompt")(lambda **kw: ClipUnetPrompt(**kw))
register("clip_res_class")(lambda **kw: ClipResSegmentationClassification(**kw))

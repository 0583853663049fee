"""flax parameter trees -> torch state dicts in the REFERENCE's key layout.

The inverse of :mod:`utils.torch_convert`: weights trained in this framework
export as state dicts that load directly into the reference's torch models —
``UNet``/``LargeUNet`` (reference models/UNet.py:36-148, strict=True) and
``ClipUnet`` (CLIP_models.py:85-134, strict=False: the reference embeds a
full ``CLIPModel`` whose text tower this framework never instantiates; all
vision + head keys are emitted).

Reference module layout being targeted (processing_blocks.py:21-133):

- ``ConvBlock``             -> ``<p>.conv.{0,1,3,4}.*``
- ``ConvBlockDownsample``   -> ``<p>.block.0.conv.{i}.*`` (Sequential of
                               [ConvBlock, MaxPool])
- ``ConvBlockUpsampleSkip`` / ``ConvBlockUpsample``
                            -> ``<p>.up.*`` + ``<p>.conv.conv.{i}.*``
- ``CrossAttentionFusion``  -> ``<p>.cross_attn.in_proj_weight`` etc.
- ``ClipFeatureExtractor``  -> ``<p>.clip_model.vision_model.*`` +
                               ``<p>.clip_model.visual_projection.weight``

All outputs are plain numpy arrays; wrap with ``torch.from_numpy`` and
``torch.save`` at the call site (scripts/export_torch.py does both).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


# --------------------------------------------------------------------------
# primitive inverses of utils/torch_convert.py
# --------------------------------------------------------------------------

def conv_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """flax (kH, kW, I, O) -> torch Conv2d (O, I, kH, kW)."""
    return np.transpose(_np(k), (3, 2, 0, 1)).copy()


def conv_transpose_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """flax ConvTranspose (kH, kW, I, O) -> torch ConvTranspose2d
    (I, O, kH, kW) with the spatial flip undone."""
    return np.transpose(_np(k), (2, 3, 0, 1))[:, :, ::-1, ::-1].copy()


def linear_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """flax (I, O) -> torch Linear (O, I)."""
    return np.transpose(_np(k), (1, 0)).copy()


def conv_to_torch(prefix: str, p: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {f"{prefix}.weight": conv_kernel_to_torch(p["kernel"])}
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])
    return out


def conv_transpose_to_torch(prefix: str, p: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {f"{prefix}.weight": conv_transpose_kernel_to_torch(p["kernel"])}
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])
    return out


def linear_to_torch(prefix: str, p: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {f"{prefix}.weight": linear_kernel_to_torch(p["kernel"])}
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])
    return out


def bn_to_torch(
    prefix: str, p: Mapping[str, Any], s: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}.weight": _np(p["scale"]),
        f"{prefix}.bias": _np(p["bias"]),
        f"{prefix}.running_mean": _np(s["mean"]),
        f"{prefix}.running_var": _np(s["var"]),
        # torch tracks this but never uses it with the default momentum.
        f"{prefix}.num_batches_tracked": np.zeros((), np.int64),
    }


def mha_to_torch(prefix: str, p: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """CrossAttentionFusion q/k/v/out_proj -> nn.MultiheadAttention packed
    in_proj form (inverse of ops/cross_attention.mha_params_from_torch).

    In the single-kv configuration the analytic fast path never materializes
    q_proj/k_proj (softmax over one key is the identity, so their values
    cannot affect the output); they export as zeros, which is
    output-equivalent in torch for the same reason."""
    c = p["out_proj"]["kernel"].shape[0]

    def slice_(name):
        if name in p:
            return linear_kernel_to_torch(p[name]["kernel"]), _np(p[name]["bias"])
        return np.zeros((c, c), np.float32), np.zeros((c,), np.float32)

    parts = [slice_(n) for n in ("q_proj", "k_proj", "v_proj")]
    w = np.concatenate([w_ for w_, _ in parts])
    b = np.concatenate([b_ for _, b_ in parts])
    return {
        f"{prefix}.in_proj_weight": w,
        f"{prefix}.in_proj_bias": b,
        f"{prefix}.out_proj.weight": linear_kernel_to_torch(p["out_proj"]["kernel"]),
        f"{prefix}.out_proj.bias": _np(p["out_proj"]["bias"]),
    }


def conv_block_to_torch(
    prefix: str, p: Mapping[str, Any], s: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    """Our ConvBlock subtree -> reference ``<prefix>.conv.{0,1,3,4}.*``."""
    out: Dict[str, np.ndarray] = {}
    out.update(conv_to_torch(f"{prefix}.conv.0", p["conv1"]))
    out.update(bn_to_torch(f"{prefix}.conv.1", p["bn1"], s["bn1"]))
    out.update(conv_to_torch(f"{prefix}.conv.3", p["conv2"]))
    out.update(bn_to_torch(f"{prefix}.conv.4", p["bn2"], s["bn2"]))
    return out


def _downsample(prefix: str, p, s) -> Dict[str, np.ndarray]:
    # reference ConvBlockDownsample = Sequential([ConvBlock, MaxPool]).
    return conv_block_to_torch(f"{prefix}.block.0", p["conv_block"], s["conv_block"])


def _upsample(prefix: str, p, s) -> Dict[str, np.ndarray]:
    out = conv_transpose_to_torch(f"{prefix}.up", p["up"])
    out.update(conv_block_to_torch(f"{prefix}.conv", p["conv_block"], s["conv_block"]))
    return out


# --------------------------------------------------------------------------
# model-level exporters
# --------------------------------------------------------------------------

def unet_state_dict(params: Mapping, batch_stats: Mapping) -> Dict[str, np.ndarray]:
    """models/unet.UNet or LargeUNet tree -> reference UNet/LargeUNet state
    dict (models/UNet.py:36-148; loads with strict=True).  The number of
    encoder/decoder stages is read from the tree."""
    sd: Dict[str, np.ndarray] = {}
    sd.update(conv_to_torch("input", params["input"]))
    i = 1
    while f"enc{i}" in params:
        sd.update(_downsample(f"enc{i}", params[f"enc{i}"], batch_stats[f"enc{i}"]))
        i += 1
    sd.update(conv_block_to_torch("bottleneck", params["bottleneck"],
                                  batch_stats["bottleneck"]))
    i = 1
    while f"dec{i}" in params:
        sd.update(_upsample(f"dec{i}", params[f"dec{i}"], batch_stats[f"dec{i}"]))
        i += 1
    sd.update(conv_to_torch("out", params["out"]))
    return sd


def clip_tower_to_torch(prefix: str, p: Mapping) -> Dict[str, np.ndarray]:
    """models/clip.ClipVisionTower tree -> transformers CLIPModel vision
    keys (inverse of models/clip.clip_params_from_torch; uses transformers'
    historical 'pre_layrnorm' spelling, as from_pretrained checkpoints do)."""
    vm = f"{prefix}.vision_model."
    sd: Dict[str, np.ndarray] = {
        vm + "embeddings.patch_embedding.weight":
            conv_kernel_to_torch(p["patch_embedding"]["kernel"]),
        vm + "embeddings.class_embedding": _np(p["class_embedding"]),
        vm + "embeddings.position_embedding.weight": _np(p["position_embedding"]),
        vm + "pre_layrnorm.weight": _np(p["pre_layernorm"]["scale"]),
        vm + "pre_layrnorm.bias": _np(p["pre_layernorm"]["bias"]),
        vm + "post_layernorm.weight": _np(p["post_layernorm"]["scale"]),
        vm + "post_layernorm.bias": _np(p["post_layernorm"]["bias"]),
        f"{prefix}.visual_projection.weight":
            linear_kernel_to_torch(p["visual_projection"]["kernel"]),
    }
    i = 0
    while f"layer_{i}" in p:
        layer = p[f"layer_{i}"]
        base = vm + f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[base + f"{ln}.weight"] = _np(layer[ln]["scale"])
            sd[base + f"{ln}.bias"] = _np(layer[ln]["bias"])
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd.update(linear_to_torch(base + f"self_attn.{name}",
                                      layer["self_attn"][name]))
        sd.update(linear_to_torch(base + "mlp.fc1", layer["fc1"]))
        sd.update(linear_to_torch(base + "mlp.fc2", layer["fc2"]))
        i += 1
    return sd


def clip_unet_state_dict(params: Mapping, batch_stats: Mapping) -> Dict[str, np.ndarray]:
    """models/clip_models.ClipUnet tree -> reference ClipUnet state dict
    (CLIP_models.py:85-134).  Load with strict=False: the reference embeds a
    whole CLIPModel whose TEXT tower has no counterpart here (the reference
    itself never uses it); every vision + trunk + fusion key is emitted."""
    sd = unet_state_dict(
        {k: v for k, v in params.items()
         if k not in ("clip_tower", "cross_attention_fusion")},
        batch_stats,
    )
    sd.update(mha_to_torch("cross_attention_fusion.cross_attn",
                           params["cross_attention_fusion"]))
    sd.update(clip_tower_to_torch("clip_feature_extractor.clip_model",
                                  params["clip_tower"]))
    return sd


def resnet34_children_to_torch(
    prefix: str, p: Mapping, s: Mapping
) -> Dict[str, np.ndarray]:
    """models/resnet.ResNet34Features tree -> the reference's
    ``nn.Sequential(*resnet34.children()[:-2])`` index layout
    (processing_blocks.py:262-263: 0 conv1, 1 bn1, 4-7 layer1-4)."""
    from ..models.resnet import RESNET34_LAYERS

    sd = conv_to_torch(f"{prefix}.0", p["conv1"])
    sd.update(bn_to_torch(f"{prefix}.1", p["bn1"], s["bn1"]))
    for stage, blocks in enumerate(RESNET34_LAYERS, start=1):
        for b in range(blocks):
            name = f"layer{stage}_{b}"
            base = f"{prefix}.{stage + 3}.{b}"
            sd.update(conv_to_torch(f"{base}.conv1", p[name]["conv1"]))
            sd.update(bn_to_torch(f"{base}.bn1", p[name]["bn1"], s[name]["bn1"]))
            sd.update(conv_to_torch(f"{base}.conv2", p[name]["conv2"]))
            sd.update(bn_to_torch(f"{base}.bn2", p[name]["bn2"], s[name]["bn2"]))
            if "downsample_conv" in p[name]:
                sd.update(conv_to_torch(f"{base}.downsample.0",
                                        p[name]["downsample_conv"]))
                sd.update(bn_to_torch(f"{base}.downsample.1",
                                      p[name]["downsample_bn"],
                                      s[name]["downsample_bn"]))
    return sd


def clip_res_state_dict(params: Mapping, batch_stats: Mapping) -> Dict[str, np.ndarray]:
    """models/clip_models.ClipResSegmentationModel tree -> reference
    ClipResSegmentationModel state dict (CLIP_models.py:8-61; strict=False
    for the absent CLIP text tower, everything else emitted)."""
    sd = clip_tower_to_torch("clip_feature_extractor.clip_model",
                             params["clip_tower"])
    sd.update(resnet34_children_to_torch("encoder.model",
                                         params["resnet_backbone"],
                                         batch_stats["resnet_backbone"]))
    sd.update(mha_to_torch("cross_attention_fusion.cross_attn",
                           params["cross_attention_fusion"]))
    for i in range(1, 6):
        sd.update(_upsample(f"dec{i}", params[f"dec{i}"], batch_stats[f"dec{i}"]))
    sd.update(conv_block_to_torch("out", params["out"], batch_stats["out"]))
    return sd


def clip_autoencoder_state_dict(
    params: Mapping, batch_stats: Mapping
) -> Dict[str, np.ndarray]:
    """models/clip_models.ClipAutoencoder tree -> reference ClipAutoencoder
    state dict (CLIP_models.py:136-191; strict=False for the text tower)."""
    sd = clip_tower_to_torch("clip_feature_extractor.clip_model",
                             params["clip_tower"])
    sd.update(conv_to_torch("input", params["input"]))
    sd.update(linear_to_torch("coupler", params["coupler"]))
    for i in range(1, 5):
        sd.update(_upsample(f"dec{i}", params[f"dec{i}"], batch_stats[f"dec{i}"]))
    sd.update(conv_to_torch("out", params["out"]))
    return sd


def clip_unet_prompt_state_dict(
    params: Mapping, batch_stats: Mapping
) -> Dict[str, np.ndarray]:
    """models/clip_models.ClipUnetPrompt tree -> reference ClipUnetPrompt
    state dict (prompt_segmentation.py:32-95; strict=False for the text
    tower).  The prompt encoder (prompt_segmentation.py:16-30) exports as
    ``prompt_encoder.enc{1-3}.block.0.*`` + ``prompt_encoder.conv.conv.*``."""
    sd = unet_state_dict(
        {k: v for k, v in params.items()
         if k not in ("clip_tower", "cross_attention_fusion",
                      "prompt_encoder", "prompt_fusion")},
        batch_stats,
    )
    sd.update(mha_to_torch("cross_attention_fusion.cross_attn",
                           params["cross_attention_fusion"]))
    sd.update(clip_tower_to_torch("clip_feature_extractor.clip_model",
                                  params["clip_tower"]))
    pe_p, pe_s = params["prompt_encoder"], batch_stats["prompt_encoder"]
    for i in range(1, 4):
        sd.update(_downsample(f"prompt_encoder.enc{i}",
                              pe_p[f"enc{i}"], pe_s[f"enc{i}"]))
    sd.update(conv_block_to_torch("prompt_encoder.conv",
                                  pe_p["conv"], pe_s["conv"]))
    sd.update(conv_to_torch("prompt_fusion", params["prompt_fusion"]))
    return sd


EXPORTERS = {
    "unet": unet_state_dict,
    "large_unet": unet_state_dict,
    "clip_unet": clip_unet_state_dict,
    "clip_res": clip_res_state_dict,
    "clip_autoencoder": clip_autoencoder_state_dict,
    "clip_unet_prompt": clip_unet_prompt_state_dict,
}

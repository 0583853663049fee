"""Model export + standalone inference API.

Replaces the reference's ``huggingface-models/ClipUnet/`` distribution
bundle (model copy + load_model.py + inference.py + upload.py):

- :func:`export_model`: write a self-contained artifact directory containing
  the checkpoint (params + batch_stats only, inference-grade), the model
  registry name/args, and a model card.
- :func:`load_model`: reconstruct (model, variables) from such a directory
  — reference ``load_model.py`` with the `_orig_mod.` strip has no JAX
  equivalent; our checkpoints are stable flat pytrees.
- :func:`predict`: PIL/array image -> (256, 256) argmax class-id mask, the
  exact ``inference.py:predict`` contract (resize 256, [0,1] scale, argmax).
- :func:`export_stablehlo` / :func:`load_stablehlo`: a serving surface the
  torch reference has no equivalent of — the jitted inference forward
  serialized as a portable StableHLO module (``jax.export``), weights baked
  in as constants, symbolic batch dimension, loadable WITHOUT the model
  code or this package's Python classes.

Hub upload (upload.py) is intentionally out of scope in the zero-egress
build environment; the artifact directory is `huggingface_hub.upload_folder`
-ready.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..utils import checkpoint as ckpt_lib

MODEL_CARD = """---
tags: [image-segmentation, jax, flax, tpu]
---

# {name}

TPU-native JAX/Flax segmentation model (Oxford-IIIT-Pet: background/cat/dog).
Load with `image_segmentation_tpu.engine.export.load_model("{dirname}")`.
"""


def export_model(
    state: Dict[str, Any],
    model_name: str,
    model_args: Optional[Dict[str, Any]] = None,
    out_dir: str = "exported-model",
    torch_format: bool = False,
    stablehlo: bool = False,
    image_size: int = 256,
) -> str:
    """Write an inference artifact directory from a train state.

    With ``torch_format`` (supported for unet/large_unet/clip_unet), also
    writes ``model_torch.pt`` — a torch state dict in the REFERENCE's key
    layout (utils/torch_export.py), matching the model.pt the reference's
    huggingface-models bundle ships, so reference/torch users can consume
    the artifact directly.  With ``stablehlo``, also writes
    ``model.stablehlo`` — the compiled inference forward as a portable
    StableHLO module (see :func:`export_stablehlo`)."""
    os.makedirs(out_dir, exist_ok=True)
    infer_state = {
        "params": state["params"],
        "batch_stats": state.get("batch_stats", {}),
    }
    ckpt_lib.save_checkpoint(os.path.join(out_dir, "model.npz"), infer_state)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({"model": model_name, "model_args": model_args or {}}, f, indent=2)
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write(MODEL_CARD.format(name=model_name, dirname=out_dir))
    if torch_format:
        import jax
        import torch

        from ..utils import torch_export as tx

        if model_name not in tx.EXPORTERS:
            raise ValueError(
                f"torch_format supports {sorted(tx.EXPORTERS)}, "
                f"not {model_name!r}"
            )
        host = jax.device_get(infer_state)
        sd = tx.EXPORTERS[model_name](host["params"], host["batch_stats"])
        torch.save(
            {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
            os.path.join(out_dir, "model_torch.pt"),
        )
    if stablehlo:
        model, variables = load_model(out_dir)
        export_stablehlo(
            model,
            variables,
            os.path.join(out_dir, "model.stablehlo"),
            image_size=image_size,
        )
    return out_dir


def export_stablehlo(
    model,
    variables: Dict,
    out_path: str,
    *,
    image_size: int = 256,
    channels: int = 3,
    batch_size: Optional[int] = None,
    platforms=None,
) -> str:
    """Serialize ``model.apply(variables, x, train=False)`` as StableHLO.

    The exported module takes ONE argument — a float32 NHWC image batch
    (symbolic batch dim when ``batch_size`` is None) — and returns the
    class logits.  Weights are embedded as module constants, so the
    artifact is self-contained: :func:`load_stablehlo` (or any StableHLO
    runtime) can run it with no model code at all.  ``platforms`` follows
    ``jax.export.export`` (default: the current backend only; pass e.g.
    ``["cpu", "tpu"]`` for a multi-platform module).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jxe

    def infer(x):
        return model.apply(variables, x, train=False)

    if batch_size is None:
        (b,) = jxe.symbolic_shape("b")
    else:
        b = batch_size
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, channels), jnp.float32)
    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jxe.export(jax.jit(infer), **kwargs)(spec)
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    return out_path


def load_stablehlo(path: str):
    """Deserialize a :func:`export_stablehlo` artifact into a callable.

    Returns a function ``f(images_f32_nhwc) -> logits`` backed by the
    serialized module (recompiled for the local backend on first call).
    """
    from jax import export as jxe

    with open(path, "rb") as f:
        exported = jxe.deserialize(f.read())
    return exported.call


def load_model(artifact_dir: str, dtype=None) -> Tuple[Any, Dict]:
    """Reconstruct (model, variables) from an exported artifact directory."""
    import jax
    import jax.numpy as jnp

    from ..models.registry import build_model

    with open(os.path.join(artifact_dir, "config.json")) as f:
        cfg = json.load(f)
    model = build_model(
        cfg["model"], dtype=dtype or jnp.bfloat16, **cfg.get("model_args", {})
    )
    flat = ckpt_lib.load_checkpoint_flat(os.path.join(artifact_dir, "model.npz"))
    variables: Dict[str, Any] = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = variables
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return model, variables


def predict(model, variables: Dict, image) -> np.ndarray:
    """PIL image or HWC array -> (256, 256) class-id mask.

    Mirrors huggingface-models/ClipUnet/inference.py: resize to 256x256,
    scale to [0,1], forward, argmax over classes.
    """
    import jax.numpy as jnp
    from ..models.blocks import resize_bilinear_align_corners

    arr = np.asarray(image, dtype=np.float32)
    if arr.max() > 1.5:  # uint8-range input
        arr = arr / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    x = jnp.asarray(arr)[None]
    if x.shape[1:3] != (256, 256):
        # torchvision Resize uses plain bilinear for PIL inputs
        import jax

        x = jax.image.resize(x, (1, 256, 256, x.shape[-1]), method="bilinear")
    logits = model.apply(variables, x, train=False)
    return np.asarray(jnp.argmax(logits, axis=-1)[0])

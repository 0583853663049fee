"""Model registry: config string -> flax module factory.

CLIP-family entries are registered lazily (they pull in the CLIP/ResNet
towers); plain conv models import eagerly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def build_model(name: str, dtype=jnp.bfloat16, **kwargs):
    if name not in _REGISTRY:
        # Trigger lazy registrations.
        from . import unet, autoencoder  # noqa: F401

        if name.startswith("clip") or name == "clip_unet_prompt":
            from . import clip_models  # noqa: F401
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](dtype=dtype, **kwargs)


def _eager_registrations():
    from .unet import UNet, LargeUNet
    from .autoencoder import Autoencoder, Encoder, Decoder

    _REGISTRY.setdefault("unet", lambda **kw: UNet(**kw))
    _REGISTRY.setdefault("large_unet", lambda **kw: LargeUNet(**kw))
    _REGISTRY.setdefault("autoencoder", lambda **kw: Autoencoder(**kw))


_eager_registrations()

"""Generic prompt-fusion model (reference prompt_encoder.py realization)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.prompt_fusion import (
    PromptEncoderV1,
    SegmentationModelWithPrompt,
)

KEY = jax.random.PRNGKey(0)


def test_prompt_encoder_v1_shape():
    m = PromptEncoderV1(64, dtype=jnp.float32)
    p = jnp.zeros((2, 64, 64, 1))
    v = m.init(KEY, p, train=False)
    out = m.apply(v, p, train=False)
    assert out.shape == (2, 8, 8, 64)


@pytest.mark.parametrize("fusion", ["concat", "add"])
def test_fusion_forward(fusion):
    m = SegmentationModelWithPrompt(out_channels=1, fusion=fusion,
                                    dtype=jnp.float32)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    p = jax.random.normal(KEY, (2, 64, 64, 1))
    v = m.init(KEY, x, p, train=False)
    out = m.apply(v, x, p, train=False)
    assert out.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_prompt_changes_output():
    m = SegmentationModelWithPrompt(dtype=jnp.float32)
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    p1 = jnp.zeros((1, 64, 64, 1))
    p2 = jnp.ones((1, 64, 64, 1))
    v = m.init(KEY, x, p1, train=False)
    o1 = m.apply(v, x, p1, train=False)
    o2 = m.apply(v, x, p2, train=False)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_registry():
    from image_segmentation_tpu.models.registry import build_model
    import image_segmentation_tpu.models.prompt_fusion  # noqa: F401

    assert build_model("prompt_fusion", dtype=jnp.float32) is not None

"""Joint segmentation+classification task (reference ClassImageDataset +
the intended-but-undefined ClipResSegmentationClassification)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.config import DataConfig, TrainConfig
from image_segmentation_tpu.engine.train import Trainer


@pytest.fixture(scope="module")
def class_cfg(tmp_path_factory):
    return TrainConfig(
        model="clip_res_class",
        model_args={
            "clip_kwargs": dict(
                hidden=32, layers=1, heads=2, mlp_dim=64, patch=32, proj_dim=32
            )
        },
        loss="class_binary",
        batch_size=8,
        num_epochs=1,
        save_dir=str(tmp_path_factory.mktemp("class-runs")),
        data=DataConfig(
            dataset="synthetic",
            synthetic_length=8,
            image_size=64,  # ResNet /32 needs >= 64 input
            augmentations_per_datapoint=1,
        ),
    )


def test_class_training_smoke(class_cfg):
    t = Trainer(class_cfg, make_artifacts=False)
    assert t.task == "class"
    out = t.train(1)
    row = out["history"][0]
    assert np.isfinite(row["train_loss"])
    assert 0 <= row["val_iou"] <= 1
    assert 0 <= row["val_dice"] <= 1


def test_model_outputs_mask_and_class():
    from image_segmentation_tpu.models.clip_models import (
        ClipResSegmentationClassification,
    )

    m = ClipResSegmentationClassification(
        dtype=jnp.float32,
        clip_kwargs=dict(hidden=32, layers=1, heads=2, mlp_dim=64, patch=32,
                         proj_dim=32),
    )
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    mask_logits, class_logits = m.apply(v, x, train=False)
    assert mask_logits.shape == (2, 64, 64, 1)
    assert class_logits.shape == (2, 1)

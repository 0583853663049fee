"""End-to-end LEARNING check: the full stack (pipeline -> augmentor -> UNet
-> CE -> Adam) must actually segment a learnable synthetic dataset, not just
produce decreasing loss.  This is the correctness evidence the reference's
eval-as-test strategy (SURVEY.md §4) never automates."""

import numpy as np
import pytest

from image_segmentation_tpu.config import DataConfig, TrainConfig
from image_segmentation_tpu.data.datasets import synthetic_shapes_dataset
from image_segmentation_tpu.engine.train import Trainer


@pytest.mark.slow
def test_unet_learns_shapes(tmp_path):
    train = synthetic_shapes_dataset(length=32, height=64, width=64, seed=0)
    val = synthetic_shapes_dataset(length=8, height=64, width=64, seed=1)
    cfg = TrainConfig(
        model="unet",
        model_args={"stem_features": 8, "encoder_features": (16, 32)},
        batch_size=8,
        num_epochs=6,
        save_dir=str(tmp_path),
        data=DataConfig(
            dataset="synthetic", image_size=64, augmentations_per_datapoint=0
        ),
    )
    t = Trainer(cfg, train_data=train, val_data=val, make_artifacts=False)
    out = t.train()
    ious = [row["val_iou"] for row in out["history"]]
    # Random init gives IoU ~0.15 on 3 classes; learning must lift it.
    assert ious[-1] > 0.45, f"model failed to learn: IoU history {ious}"
    assert ious[-1] > ious[0]


def test_shapes_dataset_structure():
    ds = synthetic_shapes_dataset(length=4, height=32, width=32, seed=3)
    assert ds.images.shape == (4, 32, 32, 3)
    assert set(np.unique(ds.masks)).issubset({0, 1, 2})
    # Masks align with colour cues: class-1 pixels are predominantly red.
    m1 = ds.masks == 1
    if m1.any():
        reds = ds.images[..., 0][m1].mean()
        blues = ds.images[..., 2][m1].mean()
        assert reds > blues

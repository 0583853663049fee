"""Smoke coverage for the visualization helpers (utils/plotting.py —
reference helperFunctions.py:210-266 + scripts/plot_*.py equivalents) and
the device prefetcher: every function must render/iterate headless and
write well-formed artifacts."""

import csv
import os

import numpy as np

from image_segmentation_tpu.data.pipeline import prefetch_to_device
from image_segmentation_tpu.utils import plotting as P


def test_logits_to_class_map():
    logits = np.zeros((2, 4, 4, 3), np.float32)
    logits[..., 1] = 5.0
    assert (P.logits_to_class_map(logits) == 1).all()


def test_plot_segmentations_from_logits(tmp_path):
    rng = np.random.default_rng(0)
    images = rng.random((3, 16, 16, 3)).astype(np.float32)
    logits = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)
    out = P.plot_segmentations(
        images, logits, save_path=str(tmp_path / "seg.png")
    )
    assert os.path.getsize(out) > 0


def test_plot_loss_curves(tmp_path):
    loss_csv = tmp_path / "loss.csv"
    with open(loss_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Epoch", "Train Loss", "Validation Loss",
                    "Val Pixel Accuracy", "Val Mean Dice", "Val IoU"])
        for e in range(3):
            w.writerow([e, 1.0 - 0.1 * e, 1.1 - 0.1 * e, 0.5, 0.5, 0.4])
    out = P.plot_loss_curves(str(loss_csv), save_path=str(tmp_path / "l.png"))
    assert os.path.getsize(out) > 0


def test_plot_robustness_scores(tmp_path):
    res = tmp_path / "robustness_scores.csv"
    with open(res, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["perturbation_type", "param_value", "mean_dice"])
        for name in ("gaussian_noise", "occlusion"):
            for p in (0, 5, 10):
                w.writerow([name, p, 0.9 - 0.01 * p])
    paths = P.plot_robustness_scores(str(res), out_dir=str(tmp_path / "plots"))
    assert len(paths) == 2
    assert all(os.path.getsize(p) > 0 for p in paths)


def test_plot_perturbation_and_autoencoder_pairs(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    p1 = P.plot_perturbation_examples(a, b, save_path=str(tmp_path / "p.png"))
    p2 = P.plot_autoencoder_pairs(
        a / 255.0, b / 255.0, save_path=str(tmp_path / "ae.png")
    )
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_prefetch_to_device_order_and_completeness():
    items = list(range(7))
    assert list(prefetch_to_device(iter(items), size=3)) == items
    assert list(prefetch_to_device(iter([]), size=2)) == []

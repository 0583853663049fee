"""Run-folder allocation and CSV/JSON training artifacts.

Reproduces the reference's observable artifact schemas exactly
(models/helperFunctions.py):

- ``run-%03d/`` folders under ``saved-models/<ModelName>/``
  (helperFunctions.py:127-153)
- ``loss.csv`` header: Epoch, Train Loss, Validation Loss,
  Val Pixel Accuracy, Val Mean Dice, Val IoU (helperFunctions.py:155-208)
- ``model_settings.json`` settings dump (helperFunctions.py:10-125) — here
  generated from the typed config + param counts instead of module
  introspection.
- ``augmentation-results/<name>.csv`` per-corruption sweep CSVs
  (model_wrappers.py:480-521) and ``results/robustness_scores.csv``
  (robustness_evaluation.py:96-99).
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
from typing import Any, Dict, Iterable, Optional

LOSS_CSV_HEADER = [
    "Epoch",
    "Train Loss",
    "Validation Loss",
    "Val Pixel Accuracy",
    "Val Mean Dice",
    "Val IoU",
]

ROBUSTNESS_CSV_HEADER = ["perturbation_type", "param_value", "mean_dice"]

AUGMENTATION_CSV_HEADER = ["param", "iou", "pixel_accuracy", "dice"]


def get_next_run_folder(base_path: str) -> str:
    """Allocate saved-models/<Model>/run-001, run-002, ... (helperFunctions.py:127-153)."""
    i = 1
    while True:
        folder = os.path.join(base_path, f"run-{i:03d}")
        if not os.path.isdir(folder):
            os.makedirs(folder)
            return folder + os.sep
        i += 1


def write_csv_header(run_dir: str) -> None:
    path = os.path.join(run_dir, "loss.csv")
    if not os.path.exists(path):
        with open(path, "w", newline="") as f:
            csv.writer(f).writerow(LOSS_CSV_HEADER)


def log_loss_to_csv(
    epoch: int,
    train_loss: float,
    val_loss: float,
    val_pixel_acc: float,
    val_dice: float,
    val_iou: float,
    run_dir: str,
) -> None:
    with open(os.path.join(run_dir, "loss.csv"), "a", newline="") as f:
        csv.writer(f).writerow(
            [epoch, train_loss, val_loss, val_pixel_acc, val_dice, val_iou]
        )


def write_rows_csv(path: str, header: Iterable[str], rows: Iterable[Iterable]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(list(header))
        for row in rows:
            w.writerow(list(row))


def _jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def save_training_info(
    run_dir: str,
    *,
    model_name: str,
    config: Any,
    num_params: int,
    train_dataset_size: int,
    val_dataset_size: int,
    extra_params: Optional[Dict[str, Any]] = None,
) -> None:
    """Write model_settings.json (helperFunctions.py:10-125 equivalent)."""
    payload = {
        "model": model_name,
        "config": _jsonable(config),
        "num_params": int(num_params),
        "train_dataloader": {"dataset_size": int(train_dataset_size)},
        "val_dataloader": {"dataset_size": int(val_dataset_size)},
    }
    if extra_params:
        payload["extra_params"] = _jsonable(extra_params)
    with open(os.path.join(run_dir, "model_settings.json"), "w") as f:
        json.dump(payload, f, indent=4)

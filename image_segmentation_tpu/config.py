"""Typed training configuration.

The reference has no config system — hyperparameters are Python literals in
each entry script, and ``TrainingWrapper.__init__`` kwargs are the de-facto
schema (model_wrappers.py:30-45).  These dataclasses are that schema, typed,
with the five production presets from ``training_scripts/*``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass
class DataConfig:
    dataset: str = "oxford-pet"          # "oxford-pet" | "synthetic"
    dataset_loc: str = "Data/Oxford-IIIT-Pet-Augmented"
    train_split: str = "train"
    val_split: str = "validation"
    augmentations_per_datapoint: int = 4
    cache: bool = True
    image_size: int = 256
    # Prompt task: Gaussian heatmap sigma (None = binary one-hot point);
    # reference prompt_train.py uses sigma=10.
    prompt_gaussian_sigma: Optional[float] = 10.0
    # synthetic fixture knobs
    synthetic_length: int = 100
    num_classes: int = 3


@dataclasses.dataclass
class OptimizerConfig:
    """torch.optim.Adam(lr=1e-3, weight_decay=1e-4) parity
    (model_wrappers.py:42-43,124): L2 added to the gradient BEFORE the Adam
    moments (not AdamW)."""

    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclasses.dataclass
class TrainConfig:
    model: str = "unet"                  # registry key, see models/registry.py
    model_args: Dict[str, Any] = dataclasses.field(default_factory=dict)
    loss: str = "hybrid"                 # "hybrid"(=CE) | "dice_ce" | "hybrid_binary" | "mse"
    batch_size: int = 16
    num_epochs: int = 2
    seed: int = 0
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    save_dir: str = "saved-models"
    checkpoint_every: int = 1            # epochs (prompt path uses 5: prompt_train.py:135)
    bf16: bool = True
    # Rematerialize the forward pass in backward (jax.checkpoint): trades
    # ~1/3 extra FLOPs for activation memory, unlocking larger batches.
    remat: bool = False
    # NaN sanitizer (SURVEY.md §5: the closest JAX analogue to a race/
    # numerics sanitizer): recompile with NaN checks and fail fast.
    debug_nans: bool = False
    # Persistent XLA compilation cache directory (utils/compile_cache.py):
    # None defers to the IMGSEG_COMPILE_CACHE env var or the default
    # ~/.cache/image_segmentation_tpu/xla; "off" disables.  Compiled
    # executables are served from disk on re-runs — the 512^2 family
    # costs ~4 min of remote toolchain compile otherwise.
    compile_cache: Optional[str] = None
    # Assemble host batches with the C++ background-thread loader
    # (runtime/loader.cpp) instead of the Python BatchPipeline — the torch
    # DataLoader-worker equivalent.  Identical semantics modulo the shuffle
    # RNG stream; falls back to Python if no toolchain is available.
    native_loader: bool = False
    # parallelism
    n_model_shards: int = 1


# The five production configs from training_scripts/* (batch sizes and
# augmentation counts per train_{Unet,Large_Unet,CLIP_Unet,CLIP_RES,
# CLIP_autoencoder}.py).  Split defaults are CORRECTED to 'train' — several
# reference configs train on the test split by mistake (SURVEY.md §7 known
# defects).
def preset(name: str) -> TrainConfig:
    # The silicon-A/B'd fast paths (width-to-depth folded levels with the
    # fused Pallas ConvBN blocks — exact vs the standard blocks under a
    # shared parameter tree, tests/test_folded.py) default ON in the
    # production presets; the models shape-gate them automatically and
    # the kernels fall back to interpret mode off-TPU.
    _w2d = {
        "w2d_level0": True,
        "w2d_impl": "pallas_fused",
        "w2d_level1_fold2": True,
    }
    presets = {
        "unet": TrainConfig(
            model="unet", batch_size=250, num_epochs=200,
            model_args=dict(_w2d),
            data=DataConfig(augmentations_per_datapoint=4),
        ),
        "large_unet": TrainConfig(
            model="large_unet", batch_size=150, num_epochs=200,
            model_args=dict(_w2d),
            data=DataConfig(augmentations_per_datapoint=4),
        ),
        "clip_unet": TrainConfig(
            model="clip_unet", batch_size=100, num_epochs=200,
            model_args=dict(_w2d),
            data=DataConfig(augmentations_per_datapoint=4),
        ),
        "clip_res": TrainConfig(
            model="clip_res", batch_size=100, num_epochs=200,
            # folded decoder level (dec5 + output block) — no level-1 fold
            # exists for this architecture
            model_args={"w2d_level0": True, "w2d_impl": "pallas_fused"},
            data=DataConfig(augmentations_per_datapoint=4),
        ),
        "clip_autoencoder": TrainConfig(
            model="clip_autoencoder", batch_size=150, num_epochs=200,
            data=DataConfig(augmentations_per_datapoint=4),
        ),
        "autoencoder": TrainConfig(
            model="autoencoder", loss="mse", batch_size=16, num_epochs=200,
            # fold-2 dec1 (the 64x64 level) is AE-specific: silicon-A/B'd in
            # round 4 (tools/exp_ae_l2_fold.py), equivalence-tested in
            # tests/test_folded.py.  bench_extra.py derives its model_args
            # from this preset so bench==production by construction.
            model_args=dict(_w2d, w2d_level2_fold2=True),
            data=DataConfig(augmentations_per_datapoint=0),
        ),
        "segment_classifier": TrainConfig(
            model="clip_res_class", loss="class_binary", batch_size=16,
            num_epochs=200,
            model_args={"w2d_level0": True, "w2d_impl": "pallas_fused"},
            data=DataConfig(augmentations_per_datapoint=2),
        ),
        "prompt": TrainConfig(
            model="clip_unet_prompt", loss="hybrid_binary", batch_size=32,
            num_epochs=100, checkpoint_every=5,
            model_args=dict(_w2d),
            data=DataConfig(augmentations_per_datapoint=4),
        ),
        # CPU/CI-feasible smoke config (scripts/model_train.py equivalent).
        # Narrow UNet keeps XLA compile time small on CI hosts.
        "smoke": TrainConfig(
            model="unet", batch_size=8, num_epochs=1,
            model_args={"stem_features": 8, "encoder_features": (16, 32)},
            data=DataConfig(
                dataset="synthetic", synthetic_length=8, image_size=32,
                augmentations_per_datapoint=1,
            ),
        ),
    }
    return presets[name]

"""Training engine: ONE jitted, donated train step.

TPU re-design of the reference's ``TrainingWrapper`` /
``DistributedTrainingWrapper`` (models/model_wrappers.py:16-249,795-1050):

- the whole hot path — uint8 normalize -> on-device augmentation -> bf16
  forward -> loss -> grad -> torch-Adam-parity update — is a single
  ``jax.jit`` with the train state donated (no reallocation, no host sync;
  the reference syncs every batch via ``loss.item()``, model_wrappers.py:180);
- metrics accumulate as device scalars and are fetched ONCE per epoch;
- data parallelism: params replicated, batch sharded over the mesh's
  ``data`` axis; XLA inserts the gradient all-reduce over ICI (replaces
  DDP/NCCL, train_distributed.py:13-23);
- artifacts: run folder + loss.csv + model_settings.json exactly as the
  reference (helperFunctions.py), checkpoints every epoch INCLUDING
  optimizer state (the reference cannot resume; we can).

BatchNorm: because the step is jitted over a batch sharded on the ``data``
mesh axis, XLA computes batch statistics over the GLOBAL batch (equivalent
to SyncBatchNorm, a strict quality upgrade over the reference's per-replica
DDP stats).  The ``model`` axis shards weights, never the batch, so it does
not change BN semantics.  Documented design decision per SURVEY.md §7;
pinned by tests/test_trainer.py.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..data import pipeline as data_pipeline
from ..data.datasets import ArrayDataset, load_pet_dataset, synthetic_dataset
from ..data.prompts import make_prompt_batch
from ..models.registry import build_model
from ..ops import augment as aug_ops
from ..ops import losses as L
from ..parallel import mesh as mesh_lib
from ..utils import compile_cache
from ..utils import checkpoint as ckpt_lib
from ..utils import io as io_lib


def adam_l2(cfg) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) parity: L2 term added to the raw
    gradient BEFORE the Adam moments (torch Adam semantics, NOT AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
        optax.scale(-cfg.learning_rate),
    )


def build_optimizer(opt_cfg, params) -> optax.GradientTransformation:
    """adam_l2 with frozen-subtree masking: params under a FROZEN_PREFIXES
    name (the CLIP tower, the ResNet backbone) get zero updates — the torch
    equivalent of requires_grad=False params being skipped by the optimizer.
    Without the mask, add_decayed_weights would decay them despite their
    zero (stop_gradient'ed) gradients."""
    from ..models.clip_models import FROZEN_PREFIXES

    frozen = set(FROZEN_PREFIXES)

    def label(path, _):
        keys = {str(getattr(p, "key", "")) for p in path}
        return "frozen" if keys & frozen else "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    if all(l == "train" for l in jax.tree.leaves(labels)):
        return adam_l2(opt_cfg)
    return optax.multi_transform(
        {"train": adam_l2(opt_cfg), "frozen": optax.set_to_zero()}, labels
    )


def make_loss_fn(name: str) -> Callable:
    if name in ("hybrid", "ce"):
        return lambda logits, batch: L.hybrid_loss(logits, batch["masks"])
    if name == "dice_ce":
        return lambda logits, batch: L.dice_ce_loss(logits, batch["masks"])
    if name == "hybrid_binary":
        return lambda logits, batch: L.hybrid_loss_binary(logits, batch["masks"])
    if name == "mse":
        return lambda logits, batch: jnp.mean(
            (logits.astype(jnp.float32) - batch["images"]) ** 2
        )
    if name == "class_binary":
        # Joint mask BCE + classification BCE (the loss the reference's
        # broken segment_classifier_model_train.py intends).
        def class_loss(outputs, batch):
            mask_logits, class_logits = outputs
            seg = L.bce_with_logits(
                jnp.squeeze(mask_logits, -1), batch["masks"].astype(jnp.float32)
            )
            cls = L.bce_with_logits(
                jnp.squeeze(class_logits, -1), batch["labels"].astype(jnp.float32)
            )
            return seg + cls

        return class_loss
    raise KeyError(f"unknown loss {name!r}")


def _dataset_from_config(
    cfg: TrainConfig, split: str, train: bool, keep_raw_masks: bool = False
) -> ArrayDataset:
    d = cfg.data
    if d.dataset == "synthetic":
        return synthetic_dataset(
            length=d.synthetic_length,
            height=d.image_size,
            width=d.image_size,
            num_classes=d.num_classes,
            seed=cfg.seed + (0 if train else 1),
            keep_raw_masks=keep_raw_masks,
        )
    return load_pet_dataset(
        split=split, dataset_loc=d.dataset_loc, cache=d.cache,
        keep_raw_masks=keep_raw_masks,
    )


class Trainer:
    """TrainingWrapper equivalent (model_wrappers.py:16-249).

    One Trainer handles both single-chip and multi-chip: pass a mesh (or let
    it build one over all local devices) and the batch axis shards over it.
    """

    def __init__(
        self,
        config: TrainConfig,
        *,
        train_data: Optional[ArrayDataset] = None,
        val_data: Optional[ArrayDataset] = None,
        mesh=None,
        run_dir: Optional[str] = None,
        make_artifacts: bool = True,
    ):
        self.config = config
        if config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        compile_cache.enable_compilation_cache(config.compile_cache)
        self.mesh = (
            mesh
            if mesh is not None
            else mesh_lib.make_mesh(n_model=config.n_model_shards)
        )
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        if config.batch_size % n_data:
            raise ValueError(
                f"batch_size {config.batch_size} must be divisible by the "
                f"data-parallel mesh size {n_data}"
            )
        dtype = jnp.bfloat16 if config.bf16 else jnp.float32
        self.model = build_model(config.model, dtype=dtype, **config.model_args)
        self.model_name = type(self.model).__name__

        # Task selection: prompt models take (image, prompt) inputs and
        # binary labels generated on device; 'class' adds a cat/dog label;
        # 'mse' reconstructs the input.
        if config.model == "clip_unet_prompt":
            self.task = "prompt"
        elif config.model == "clip_res_class":
            self.task = "class"
        elif config.loss == "mse":
            self.task = "reconstruction"
        else:
            self.task = "segmentation"

        needs_raw = self.task in ("prompt", "class")
        self.train_data = train_data or _dataset_from_config(
            config, config.data.train_split, True, keep_raw_masks=needs_raw
        )
        self.val_data = val_data or _dataset_from_config(
            config, config.data.val_split, False, keep_raw_masks=needs_raw
        )

        self.loss_fn = make_loss_fn(config.loss)
        self.is_binary = config.loss == "hybrid_binary"
        self.is_reconstruction = config.loss == "mse"
        aug_n = config.data.augmentations_per_datapoint
        if self.task == "prompt":
            self.augmentor = (
                aug_ops.DataAugmentorPrompt(aug_n) if aug_n > 0 else None
            )
        else:
            self.augmentor = aug_ops.DataAugmentor(aug_n) if aug_n > 0 else None

        # ---- init state (replicated over the mesh) -----------------------
        h = w = config.data.image_size
        sample = jnp.zeros((1, h, w, 3), jnp.float32)
        init_args = (sample,)
        if self.task == "prompt":
            init_args = (sample, jnp.zeros((1, h, w, 1), jnp.float32))
        variables = jax.jit(
            partial(self.model.init, train=False), backend=None
        )(jax.random.PRNGKey(config.seed), *init_args)
        params = variables["params"]
        self.tx = build_optimizer(config.optimizer, params)
        batch_stats = variables.get("batch_stats", {})
        self.num_params = int(
            sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        )
        state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.mesh.shape[mesh_lib.MODEL_AXIS] > 1:
            # Tensor parallelism: large kernels sharded over the model axis.
            self.state = mesh_lib.shard_params_tp(self.mesh, state)
        else:
            self.state = mesh_lib.replicate(self.mesh, state)
        self.base_key = jax.random.PRNGKey(config.seed)

        # ---- artifacts ----------------------------------------------------
        self.run_dir = run_dir
        if make_artifacts and jax.process_index() == 0:
            if run_dir is None:
                self.run_dir = io_lib.get_next_run_folder(
                    os.path.join(config.save_dir, self.model_name)
                )
            io_lib.write_csv_header(self.run_dir)
            io_lib.save_training_info(
                self.run_dir,
                model_name=self.model_name,
                config=config,
                num_params=self.num_params,
                train_dataset_size=len(self.train_data)
                * (config.data.augmentations_per_datapoint + 1),
                val_dataset_size=len(self.val_data),
                params=params,
            )

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------ jit
    def _apply_train(self, params, batch_stats, *inputs):
        def apply(params, batch_stats, *inputs):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                out, mutated = self.model.apply(
                    variables, *inputs, train=True, mutable=["batch_stats"]
                )
                return out, mutated["batch_stats"]
            return self.model.apply(variables, *inputs, train=True), batch_stats

        if self.config.remat:
            apply = jax.checkpoint(apply)
        return apply(params, batch_stats, *inputs)

    def _apply_eval(self, params, batch_stats, *inputs):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return self.model.apply(variables, *inputs, train=False)

    def _prepare_batch(self, images_u8, masks_u8, key, *, augment: bool):
        """uint8 host batch -> model inputs + targets, all on device.

        segmentation:   (images,)          targets = class masks
        prompt:         (images, prompts)  targets = binary label mask
                        (prompt + label generated on device from the palette
                        mask, reference PromptImageDataset semantics)
        reconstruction: (images,)          targets = images
        """
        kp, ka = jax.random.split(key)
        images = aug_ops.normalize_image(images_u8)
        if self.task == "class":
            # ClassImageDataset semantics on device (datasets.py:442-459):
            # binary any-animal mask (cat|dog|uncertain), label 0=cat 1=dog.
            from ..data import records

            seg_u8 = (
                (masks_u8 == records.CAT_PALETTE)
                | (masks_u8 == records.DOG_PALETTE)
                | (masks_u8 == records.UNCERTAIN_PALETTE)
            ).astype(jnp.uint8)
            labels = 1.0 - jnp.any(
                masks_u8 == records.CAT_PALETTE, axis=(1, 2)
            ).astype(jnp.float32)
            if augment and self.augmentor is not None:
                images, seg = self.augmentor.apply_u8(ka, images_u8, seg_u8)
            else:
                seg = seg_u8.astype(jnp.int32)
            return (images,), {"images": images, "masks": seg, "labels": labels}
        if self.task == "prompt":
            prompts_map, labels = make_prompt_batch(
                kp, masks_u8, self.config.data.prompt_gaussian_sigma
            )
            masks = labels.astype(jnp.int32)
            if augment and self.augmentor is not None:
                # uint8-space joint geometry (image+mask packed u8x4 + the
                # f32 heatmap bitcast i32 through the Pallas shear rolls):
                # identical results, one VMEM pass per shear instead of the
                # 5-channel f32 roll/select chain.
                images, masks, prompts_map = self.augmentor.apply_u8(
                    ka, images_u8, labels.astype(jnp.uint8), prompts_map
                )
            return (images, prompts_map), {"images": images, "masks": masks}
        if augment and self.augmentor is not None and self.task != "reconstruction":
            # uint8-space geometry: identical results, 4x less gather traffic.
            images, masks = self.augmentor.apply_u8(ka, images_u8, masks_u8)
        else:
            masks = masks_u8.astype(jnp.int32)
        return (images,), {"images": images, "masks": masks}

    def _build_train_step(self):
        loss_fn = self.loss_fn

        def step(state, images_u8, masks_u8, key):
            inputs, batch = self._prepare_batch(
                images_u8, masks_u8, key, augment=True
            )

            def objective(params):
                logits, new_stats = self._apply_train(
                    params, state["batch_stats"], *inputs
                )
                return loss_fn(logits, batch), new_stats

            (loss, new_stats), grads = jax.value_and_grad(objective, has_aux=True)(
                state["params"]
            )
            updates, new_opt = self.tx.update(
                grads, state["opt_state"], state["params"]
            )
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {
                "params": new_params,
                "batch_stats": new_stats,
                "opt_state": new_opt,
                "step": state["step"] + 1,
            }
            return new_state, loss

        return jax.jit(step, donate_argnums=(0,))

    def _build_eval_step(self):
        loss_fn = self.loss_fn
        is_binary = self.is_binary
        is_recon = self.is_reconstruction
        is_class = self.task == "class"

        def step(state, images_u8, masks_u8, key):
            inputs, batch = self._prepare_batch(
                images_u8, masks_u8, key, augment=False
            )
            masks = batch["masks"]
            logits = self._apply_eval(state["params"], state["batch_stats"], *inputs)
            loss = loss_fn(logits, batch)
            if is_class:
                mask_logits, _ = logits
                return (
                    loss,
                    L.iou_binary(mask_logits, masks),
                    L.pixel_accuracy_binary(mask_logits, masks),
                    L.dice_score_binary(mask_logits, masks),
                )
            if is_recon:
                zero = jnp.zeros((), jnp.float32)
                return loss, zero, zero, zero
            if is_binary:
                iou_v = L.iou_binary(logits, masks)
                pa = L.pixel_accuracy_binary(logits, masks)
                dice = L.dice_score_binary(logits, masks)
            else:
                iou_v = L.iou(logits, masks)
                pa = L.pixel_accuracy(logits, masks)
                dice = L.dice_score(logits, masks)
            return loss, iou_v, pa, dice

        return jax.jit(step)

    # ---------------------------------------------------------------- loops
    def _pipelines(self):
        cfg = self.config
        shard = mesh_lib.batch_sharding(self.mesh)
        mask_attr = "raw_masks" if self.task in ("prompt", "class") else "masks"
        train_cls = data_pipeline.BatchPipeline
        train_kwargs = {}
        if cfg.native_loader:
            from ..data import native_loader

            if native_loader.native_loader_available():
                train_cls = native_loader.NativeBatchPipeline
                train_kwargs = dict(
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                )
        train_pipe = train_cls(
            self.train_data,
            cfg.batch_size,
            augmentations_per_datapoint=cfg.data.augmentations_per_datapoint,
            shuffle=True,
            drop_last=True,
            seed=cfg.seed,
            sharding=shard,
            mask_attr=mask_attr,
            **train_kwargs,
        )
        val_pipe = data_pipeline.BatchPipeline(
            self.val_data,
            cfg.batch_size,
            augmentations_per_datapoint=0,
            shuffle=False,
            drop_last=False,
            seed=cfg.seed,
            sharding=shard,
            mask_attr=mask_attr,
        )
        return train_pipe, val_pipe

    def train(
        self, num_epochs: Optional[int] = None, *, verbose: bool = False
    ) -> Dict[str, Any]:
        cfg = self.config
        num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        train_pipe, val_pipe = self._pipelines()
        history = []

        for epoch in range(num_epochs):
            t0 = time.perf_counter()
            loss_sum = jnp.zeros(())
            n_batches = 0
            for images, masks in train_pipe.epoch(epoch):
                key = jax.random.fold_in(self.base_key, epoch * 100003 + n_batches)
                self.state, loss = self._train_step(self.state, images, masks, key)
                loss_sum = loss_sum + loss
                n_batches += 1
            train_loss = float(loss_sum / max(n_batches, 1))  # one sync/epoch
            dt = time.perf_counter() - t0
            rate = (n_batches * cfg.batch_size) / dt if dt > 0 else 0.0

            val = self.evaluate(val_pipe)
            row = dict(
                epoch=epoch,
                train_loss=train_loss,
                rate=rate,
                **val,
            )
            history.append(row)
            if verbose and jax.process_index() == 0:
                # Reference epoch summary (model_wrappers.py:226-243).
                from ..utils.profiling import format_memory_report

                print(
                    f"Epoch: {epoch}\n"
                    f"Rate: {rate:.1f} datapoints/s\n"
                    f"Train Loss: {train_loss:.4f}\n"
                    f"Validation Loss: {val['val_loss']:.4f}\n"
                    f"Val IoU: {val['val_iou']:.4f}\n"
                    f"Val Pixel Accuracy: {val['val_pixel_accuracy']:.4f}\n"
                    f"Val Dice: {val['val_dice']:.4f}\n"
                    + format_memory_report(),
                    flush=True,
                )
            if jax.process_index() == 0 and self.run_dir:
                io_lib.log_loss_to_csv(
                    epoch,
                    train_loss,
                    val["val_loss"],
                    val["val_pixel_accuracy"],
                    val["val_dice"],
                    val["val_iou"],
                    self.run_dir,
                )
                if (epoch + 1) % cfg.checkpoint_every == 0:
                    ckpt_lib.save_checkpoint(
                        os.path.join(self.run_dir, f"model_{epoch + 1}.npz"),
                        self.state,
                    )
        return {"history": history, "state": self.state}

    def evaluate(self, val_pipe=None) -> Dict[str, float]:
        if val_pipe is None:
            _, val_pipe = self._pipelines()
        sums = None
        n = 0
        for images, masks in val_pipe.epoch(0):
            key = jax.random.fold_in(self.base_key, 7919 + n)
            out = self._eval_step(self.state, images, masks, key)
            sums = out if sums is None else tuple(a + b for a, b in zip(sums, out))
            n += 1
        if n == 0:
            return dict(val_loss=0.0, val_iou=0.0, val_pixel_accuracy=0.0, val_dice=0.0)
        loss, iou_v, pa, dice = (float(s / n) for s in sums)
        return dict(
            val_loss=loss, val_iou=iou_v, val_pixel_accuracy=pa, val_dice=dice
        )

    # ------------------------------------------------------------- resume
    def restore(self, path: str) -> None:
        restored = ckpt_lib.restore_into(jax.device_get(self.state), path)
        if self.mesh.shape[mesh_lib.MODEL_AXIS] > 1:
            self.state = mesh_lib.shard_params_tp(self.mesh, restored)
        else:
            self.state = mesh_lib.replicate(self.mesh, restored)

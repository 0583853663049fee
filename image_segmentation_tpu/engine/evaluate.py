"""Evaluation + robustness sweep engine.

Re-design of the reference's ``TestWrapper`` (model_wrappers.py:251-792) and
``scripts/robustness_evaluation.py``:

- :meth:`Evaluator.test`              ~ model_wrappers.py:341-404
- :meth:`Evaluator.test_augmentation` ~ model_wrappers.py:408-478
- :meth:`Evaluator.test_robustness`   ~ model_wrappers.py:524-764 — the 8
  float-space sweeps, each logged to ``augmentation-results/<name>.csv``.
  (The reference logs the brightness-DECREASE sweep under the increase
  filename, model_wrappers.py:758 — a known defect we do not replicate.)
- :meth:`Evaluator.robustness_evaluation` ~ robustness_evaluation.py:27-133 —
  the integer-space 8x10 grid writing ``results/robustness_scores.csv``
  (mean smp-parity Dice per cell, batch 8).

All perturbations run ON DEVICE over uint8 batches; scalar sweep parameters
are traced arguments wherever possible so one compiled evaluation program
serves the whole 10-point sweep.

The whole battery is DATA-PARALLEL over a device mesh (BASELINE.json config
5: "full 8x10 sweep on-device, data-parallel over ICI"): by default the
Evaluator builds a data-only mesh over every visible device, replicates the
model state across it, and shards each eval batch over the ``data`` axis —
XLA inserts the metric all-reduces.  Remainder batches fall back to
replicated placement (one extra compile, identical math).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import perturbations as pert
from ..data.datasets import ArrayDataset
from ..data.pipeline import BatchPipeline
from ..ops import augment as aug_ops
from ..ops import losses as L
from ..parallel import mesh as mesh_lib
from ..utils import compile_cache
from ..utils import io as io_lib


class Evaluator:
    """Run a trained model over a test split, clean or corrupted.

    ``mesh``: device mesh for data-parallel evaluation.  Default ("auto")
    builds a data-only mesh over all visible devices; pass an existing mesh
    to reuse the trainer's.  The state is replicated over it once.
    """

    def __init__(
        self,
        model,
        state: Dict,
        test_data: ArrayDataset,
        *,
        batch_size: int = 8,
        binary: bool = False,
        seed: int = 42,
        mesh="auto",
    ):
        self.model = model
        compile_cache.enable_compilation_cache()
        self.mesh = mesh_lib.make_mesh(n_model=1) if mesh == "auto" else mesh
        self.state = mesh_lib.replicate(self.mesh, state)
        self.sharding = mesh_lib.batch_sharding(self.mesh)
        self.test_data = test_data
        self.batch_size = batch_size
        self.binary = binary
        self.key = jax.random.PRNGKey(seed)
        self._metric_cache: Dict = {}

    # ------------------------------------------------------------------
    def _apply(self, images):
        variables = {"params": self.state["params"]}
        if self.state.get("batch_stats"):
            variables["batch_stats"] = self.state["batch_stats"]
        return self.model.apply(variables, images, train=False)

    def _metrics(self, logits, masks):
        if self.binary:
            return (
                L.iou_binary(logits, masks),
                L.pixel_accuracy_binary(logits, masks),
                L.dice_score_binary(logits, masks),
            )
        return (
            L.iou(logits, masks),
            L.pixel_accuracy(logits, masks),
            L.dice_score(logits, masks),
        )

    def _eval_fn_raw(self, kind: str, name: Optional[str] = None,
                     static_param=None):
        """The unjitted per-batch eval fn: (images_u8, masks_i32, key,
        param) -> (iou, pa, dice) scalars.  Shared by the per-point path
        (jitted directly) and the batched family path (traced inside its
        scan/map)."""
        if kind == "clean":

            def fn(images_u8, masks, key, param):
                images = aug_ops.normalize_image(images_u8)
                return self._metrics(self._apply(images), masks)

        elif kind == "int":
            info = pert.INT_SWEEPS[name]

            def fn(images_u8, masks, key, param):
                p = static_param if static_param is not None else param
                perturbed = info["fn"](key, images_u8, p)
                images = aug_ops.normalize_image(perturbed)
                return self._metrics(self._apply(images), masks)

        elif kind == "float":
            info = pert.FLOAT_SWEEPS[name]

            def fn(images_u8, masks, key, param):
                p = static_param if static_param is not None else param
                images = aug_ops.normalize_image(images_u8)
                images = info["fn"](key, images, p)
                return self._metrics(self._apply(images), masks)

        else:
            raise ValueError(kind)

        return fn

    def _eval_fn(self, kind: str, name: Optional[str] = None, static_param=None):
        """Build/cache a jitted (state-closed) eval function."""
        cache_key = (kind, name, static_param)
        if cache_key not in self._metric_cache:
            self._metric_cache[cache_key] = jax.jit(
                self._eval_fn_raw(kind, name, static_param)
            )
        return self._metric_cache[cache_key]

    def _run_sweep_point(self, kind: str, name: Optional[str], param) -> tuple:
        """Average (iou, pa, dice) over the split for one battery cell.

        Every sweep family traces its parameter (blur runs max_passes
        masked box passes; occlusion uses traced randint bounds), so a
        full battery compiles ONE program per family — the remote
        compile of a 512^2 evaluator is ~4 min, and the previous
        static-per-value blur/occlusion added ~18 extra compiles."""
        fn = self._eval_fn(kind, name, None)
        pipe = BatchPipeline(
            self.test_data, self.batch_size, shuffle=False, drop_last=False,
            sharding=self.sharding,
        )
        sums = None
        n = 0
        for i, (images, masks) in enumerate(pipe.epoch(0)):
            key = jax.random.fold_in(self.key, i)
            out = fn(images, masks.astype(jnp.int32), key, jnp.float32(param or 0.0))
            sums = out if sums is None else tuple(a + b for a, b in zip(sums, out))
            n += 1
        return tuple(float(s / n) for s in sums)

    # ------------------------------------------------- batched sweep path
    def _staged_split(self):
        """The whole split staged on device ONCE: full batches stacked as
        (nb, b, ...) sharded (None, "data"), plus the replicated remainder
        batch (or None).  Memoized; order matches BatchPipeline
        (shuffle=False -> dataset order)."""
        if getattr(self, "_staged", None) is not None:
            return self._staged
        imgs = np.asarray(self.test_data.images)
        msks = np.asarray(self.test_data.masks)
        b = self.batch_size
        nb = len(imgs) // b
        rep = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )
        # Same placement rule as the per-point pipeline: shard the batch
        # dim over "data" when divisible, else replicate (identical math).
        stack_sh = (
            jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(None, "data")
            )
            if b % self.mesh.shape["data"] == 0
            else rep
        )
        full_i = jax.device_put(
            imgs[: nb * b].reshape(nb, b, *imgs.shape[1:]), stack_sh
        )
        full_m = jax.device_put(
            msks[: nb * b].reshape(nb, b, *msks.shape[1:]), stack_sh
        )
        rem = None
        if len(imgs) % b:
            rem = (
                jax.device_put(imgs[nb * b :], rep),
                jax.device_put(msks[nb * b :], rep),
            )
        self._staged = (full_i, full_m, rem, nb)
        return self._staged

    def _run_sweep_family(self, kind: str, name: Optional[str], params):
        """All sweep points of one family in ONE device dispatch.

        The per-point loop costs ~0.4-0.5 s of remote dispatch latency per
        BATCH on the axon runtime — 640 dispatches for the 8x10 battery
        against ~10 s of device compute.  This path stages the split once
        and runs lax.map over the traced param vector x lax.scan over the
        staged batches inside one jit: 1 dispatch + 1 device_get per
        family.  Key schedule, batching semantics (per-batch metric means
        averaged over batches, remainder included as one batch) and the
        per-batch math are IDENTICAL to ``_run_sweep_point`` (parity
        pinned in tests/test_evaluator.py).  Multi-process runs keep the
        per-point path: staging global arrays per process is the
        pipeline's job (see data/pipeline.py).
        """
        if jax.process_count() > 1:
            return [self._run_sweep_point(kind, name, p) for p in params]
        raw = self._eval_fn_raw(kind, name, None)
        full_i, full_m, rem, nb = self._staged_split()
        cache_key = (kind, name, "family", len(params), nb)
        if cache_key not in self._metric_cache:

            def family(full_i, full_m, rem, base_key, pvec):
                def point(p):
                    def body(carry, xs):
                        i, im, mk = xs
                        key = jax.random.fold_in(base_key, i)
                        out = raw(im, mk.astype(jnp.int32), key, p)
                        return carry + jnp.stack(out), None

                    sums, _ = jax.lax.scan(
                        body,
                        jnp.zeros(3, jnp.float32),
                        (jnp.arange(nb), full_i, full_m),
                    )
                    if rem is not None:
                        key = jax.random.fold_in(base_key, nb)
                        out = raw(
                            rem[0], rem[1].astype(jnp.int32), key, p
                        )
                        sums = sums + jnp.stack(out)
                    return sums

                return jax.lax.map(point, pvec)

            self._metric_cache[cache_key] = jax.jit(family)
        pvec = jnp.asarray(
            [float(p or 0.0) for p in params], jnp.float32
        )
        sums = np.asarray(
            jax.device_get(
                self._metric_cache[cache_key](
                    full_i, full_m, rem, self.key, pvec
                )
            )
        )
        n = nb + (1 if rem is not None else 0)
        return [tuple(float(v) / n for v in row) for row in sums]

    # ----------------------------------------------------------------- API
    def test(self) -> Dict[str, float]:
        """Clean-split IoU / PixelAcc / Dice (model_wrappers.py:341-404)."""
        iou_v, pa, dice = self._run_sweep_point("clean", None, None)
        return {"iou": iou_v, "pixel_accuracy": pa, "dice": dice}

    def test_augmentation(self, name: str, param) -> Dict[str, float]:
        """One float-space corruption point (model_wrappers.py:408-478)."""
        iou_v, pa, dice = self._run_sweep_point("float", name, param)
        return {"iou": iou_v, "pixel_accuracy": pa, "dice": dice}

    def test_robustness(self, out_dir: str = "augmentation-results") -> Dict:
        """All 8 float-space sweeps -> augmentation-results/<name>.csv."""
        results = {}
        for name, info in pert.FLOAT_SWEEPS.items():
            rows = []
            pts = self._run_sweep_family("float", name, info["params"])
            for param, (iou_v, pa, dice) in zip(info["params"], pts):
                rows.append([param, iou_v, pa, dice])
            io_lib.write_rows_csv(
                os.path.join(out_dir, f"{name}.csv"),
                io_lib.AUGMENTATION_CSV_HEADER,
                rows,
            )
            results[name] = rows
        return results

    def robustness_evaluation(
        self, results_file: str = "results/robustness_scores.csv"
    ) -> Dict:
        """Integer-space 8x10 grid -> robustness_scores.csv
        (robustness_evaluation.py:96-127 schema: name, param, mean_dice)."""
        rows = []
        results = {}
        for name, info in pert.INT_SWEEPS.items():
            per_param = []
            pts = self._run_sweep_family("int", name, info["params"])
            for param, (_, _, dice) in zip(info["params"], pts):
                rows.append([name, param, f"{dice:.4f}"])
                per_param.append((param, dice))
            results[name] = per_param
        io_lib.write_rows_csv(results_file, io_lib.ROBUSTNESS_CSV_HEADER, rows)
        return results

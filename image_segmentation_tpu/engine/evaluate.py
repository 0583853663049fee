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

    def _eval_fn(self, kind: str, name: Optional[str] = None, static_param=None):
        """Build/cache a jitted (state-closed) eval function."""
        cache_key = (kind, name, static_param)
        if cache_key in self._metric_cache:
            return self._metric_cache[cache_key]

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

        jitted = jax.jit(fn)
        self._metric_cache[cache_key] = jitted
        return jitted

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
            for param in info["params"]:
                iou_v, pa, dice = self._run_sweep_point("float", name, param)
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
            for param in info["params"]:
                _, _, dice = self._run_sweep_point("int", name, param)
                rows.append([name, param, f"{dice:.4f}"])
                per_param.append((param, dice))
            results[name] = per_param
        io_lib.write_rows_csv(results_file, io_lib.ROBUSTNESS_CSV_HEADER, rows)
        return results

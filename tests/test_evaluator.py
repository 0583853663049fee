"""Evaluator: clean test, sweeps, CSV artifacts (reference TestWrapper +
robustness_evaluation.py schemas)."""

import csv
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.config import preset
from image_segmentation_tpu.data.datasets import synthetic_dataset
from image_segmentation_tpu.engine.evaluate import Evaluator
from image_segmentation_tpu.engine.train import Trainer
from image_segmentation_tpu.utils import io as io_lib


@pytest.fixture(scope="module")
def evaluator(tmp_path_factory):
    cfg = preset("smoke")
    cfg.save_dir = str(tmp_path_factory.mktemp("eval-runs"))
    t = Trainer(cfg, make_artifacts=False)
    t.train(1)
    test_data = synthetic_dataset(length=6, height=32, width=32, seed=9)
    return Evaluator(t.model, jax.device_get(t.state), test_data, batch_size=6)


class TestCleanEval:
    def test_metrics_in_range(self, evaluator):
        out = evaluator.test()
        assert set(out) == {"iou", "pixel_accuracy", "dice"}
        for v in out.values():
            assert 0.0 <= v <= 1.0


class TestSweeps:
    def test_float_point(self, evaluator):
        out = evaluator.test_augmentation("brightness_increase", 20)
        assert 0.0 <= out["dice"] <= 1.0

    def test_identity_perturbation_matches_clean(self, evaluator):
        clean = evaluator.test()
        ident = evaluator.test_augmentation("contrast_increase", 1.0)
        assert ident["dice"] == pytest.approx(clean["dice"], abs=1e-5)

    def test_int_sweep_param_traced_no_extra_compile(self, evaluator):
        # brightness params share one compiled program (traced scalar).
        evaluator._metric_cache.clear()
        evaluator._run_sweep_point("int", "brightness_increase", 5)
        evaluator._run_sweep_point("int", "brightness_increase", 25)
        keys = [k for k in evaluator._metric_cache if k[1] == "brightness_increase"]
        assert len(keys) == 1

    def test_family_path_matches_per_point(self, evaluator):
        """The one-dispatch family path (lax.map over params x lax.scan
        over staged batches, incl. a replicated REMAINDER batch) must
        reproduce the per-point per-batch loop: same key schedule, same
        per-batch means averaged over the same batch count."""
        ev = Evaluator(
            evaluator.model,
            jax.device_get(
                {k: v for k, v in evaluator.state.items()}
            ),
            evaluator.test_data,
            batch_size=4,  # length 6 -> batches (4, 2): remainder covered
        )
        for kind, name, params in [
            ("int", "gaussian_noise", [4, 12]),
            ("float", "contrast_decrease", [1.0, 0.6]),
        ]:
            fam = ev._run_sweep_family(kind, name, params)
            pts = [ev._run_sweep_point(kind, name, p) for p in params]
            for a, b in zip(fam, pts):
                np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_robustness_csv_schema(self, evaluator, tmp_path):
        # restrict to two perturbations for speed
        from image_segmentation_tpu.data import perturbations as P

        full = dict(P.INT_SWEEPS)
        small = {
            "brightness_increase": dict(
                full["brightness_increase"], params=[0, 45]
            ),
            "contrast_decrease": dict(full["contrast_decrease"], params=[1.0, 0.1]),
        }
        P.INT_SWEEPS.clear()
        P.INT_SWEEPS.update(small)
        try:
            csv_path = str(tmp_path / "results/robustness_scores.csv")
            res = evaluator.robustness_evaluation(csv_path)
            with open(csv_path) as f:
                rows = list(csv.reader(f))
            assert rows[0] == io_lib.ROBUSTNESS_CSV_HEADER
            assert len(rows) == 1 + 4  # 2 perturbations x 2 params
            assert rows[1][0] == "brightness_increase"
            float(rows[1][2])  # mean_dice parses
        finally:
            P.INT_SWEEPS.clear()
            P.INT_SWEEPS.update(full)


class TestDataParallelEval:
    """The battery runs data-parallel over the mesh (BASELINE config 5);
    metrics are identical to the single-device evaluation."""

    def test_sharded_batches_and_metric_parity(self, evaluator):
        from image_segmentation_tpu.data.pipeline import BatchPipeline
        from image_segmentation_tpu.parallel import mesh as mesh_lib

        test_data = synthetic_dataset(length=16, height=32, width=32, seed=9)
        ev8 = Evaluator(
            evaluator.model, jax.device_get(evaluator.state), test_data,
            batch_size=8,
        )
        assert ev8.mesh.devices.size == 8  # conftest's virtual mesh

        # Batches really shard over all 8 devices.
        pipe = BatchPipeline(
            test_data, 8, shuffle=False, drop_last=False,
            sharding=ev8.sharding,
        )
        images, _ = next(iter(pipe.epoch(0)))
        assert len(images.sharding.device_set) == 8

        ev1 = Evaluator(
            evaluator.model, jax.device_get(evaluator.state), test_data,
            batch_size=8, mesh=mesh_lib.make_mesh(n_data=1, n_model=1),
        )
        out8 = ev8.test()
        out1 = ev1.test()
        for k in out8:
            assert out8[k] == pytest.approx(out1[k], abs=1e-5), k

        # A random perturbation point: same key + same global batch =>
        # identical metrics independent of the sharding.
        p8 = ev8.test_augmentation("gaussian_noise", 8)
        p1 = ev1.test_augmentation("gaussian_noise", 8)
        assert p8["dice"] == pytest.approx(p1["dice"], abs=1e-5)


class TestExport:
    def test_export_load_predict_roundtrip(self, tmp_path):
        from image_segmentation_tpu.engine import export as ex

        cfg = preset("smoke")
        cfg.save_dir = str(tmp_path)
        t = Trainer(cfg, make_artifacts=False)
        out_dir = ex.export_model(
            jax.device_get(t.state), cfg.model, cfg.model_args,
            str(tmp_path / "artifact"),
        )
        assert os.path.exists(os.path.join(out_dir, "model.npz"))
        assert os.path.exists(os.path.join(out_dir, "config.json"))
        model, variables = ex.load_model(out_dir, dtype=jnp.float32)
        img = np.random.default_rng(0).integers(0, 256, (32, 32, 3), np.uint8)
        mask = ex.predict(model, variables, img)
        assert mask.shape == (256, 256)
        assert set(np.unique(mask)).issubset({0, 1, 2})

    def test_stablehlo_export_runs_without_model_code(self, tmp_path):
        """jax.export round trip: the serialized module must reproduce the
        live model's logits for an arbitrary batch size (symbolic batch dim)
        — and do so through deserialize/call alone, no registry access."""
        from image_segmentation_tpu.engine import export as ex

        cfg = preset("smoke")
        cfg.save_dir = str(tmp_path)
        t = Trainer(cfg, make_artifacts=False)
        out_dir = ex.export_model(
            jax.device_get(t.state), cfg.model, cfg.model_args,
            str(tmp_path / "artifact"), stablehlo=True, image_size=32,
        )
        path = os.path.join(out_dir, "model.stablehlo")
        assert os.path.exists(path)
        model, variables = ex.load_model(out_dir)
        fn = ex.load_stablehlo(path)
        rng = np.random.default_rng(1)
        for batch in (1, 3):  # exercise the symbolic batch dimension
            x = jnp.asarray(rng.random((batch, 32, 32, 3), np.float32))
            got = np.asarray(fn(x))
            want = np.asarray(model.apply(variables, x, train=False))
            # bf16 compute: serialized-module and live-apply fusions may
            # round differently at the last bit.
            np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

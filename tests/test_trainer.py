"""Trainer end-to-end on the 8-virtual-device CPU mesh: loss decreases,
artifacts match the reference schemas, checkpoints resume."""

import csv
import json
import os

import numpy as np
import pytest

import jax

from image_segmentation_tpu.config import DataConfig, TrainConfig, preset
from image_segmentation_tpu.engine.train import Trainer, adam_l2
from image_segmentation_tpu.utils import checkpoint as ckpt_lib
from image_segmentation_tpu.utils import io as io_lib


def test_production_presets_default_to_fast_paths():
    """The silicon-A/B'd folded fast paths (exact vs the standard blocks,
    tests/test_folded.py) are the production defaults — a user running
    `scripts/train.py --preset large_unet` gets the benchmarked step."""
    for name in ("unet", "large_unet", "clip_unet", "autoencoder", "prompt"):
        args = preset(name).model_args
        assert args.get("w2d_level0") is True, name
        assert args.get("w2d_impl") == "pallas_fused", name
        assert args.get("w2d_level1_fold2") is True, name


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = preset("smoke")
    cfg.save_dir = str(tmp_path_factory.mktemp("runs"))
    cfg.num_epochs = 2
    t = Trainer(cfg)
    out = t.train()
    return t, out


class TestTraining:
    def test_loss_decreases(self, trained):
        _, out = trained
        h = out["history"]
        assert h[-1]["train_loss"] < h[0]["train_loss"]

    def test_metrics_in_range(self, trained):
        _, out = trained
        for row in out["history"]:
            assert 0 <= row["val_iou"] <= 1
            assert 0 <= row["val_pixel_accuracy"] <= 1
            assert 0 <= row["val_dice"] <= 1

    def test_loss_csv_schema(self, trained):
        t, _ = trained
        with open(os.path.join(t.run_dir, "loss.csv")) as f:
            rows = list(csv.reader(f))
        assert rows[0] == io_lib.LOSS_CSV_HEADER
        assert len(rows) == 3  # header + 2 epochs

    def test_settings_json(self, trained):
        t, _ = trained
        with open(os.path.join(t.run_dir, "model_settings.json")) as f:
            payload = json.load(f)
        assert payload["model"] == "UNet"
        assert payload["num_params"] == t.num_params
        assert payload["config"]["batch_size"] == 8

    def test_checkpoints_written_every_epoch(self, trained):
        t, _ = trained
        names = sorted(os.listdir(t.run_dir))
        assert "model_1.npz" in names and "model_2.npz" in names

    def test_restore_roundtrip(self, trained):
        t, _ = trained
        path = ckpt_lib.latest_checkpoint(t.run_dir)
        assert path.endswith("model_2.npz")
        before = jax.device_get(t.state["params"])
        t.restore(path)
        after = jax.device_get(t.state["params"])
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(t.state["step"]) > 0

    def test_state_sharded_over_mesh(self, trained):
        t, _ = trained
        leaf = jax.tree.leaves(t.state["params"])[0]
        # params replicated over all 8 virtual devices
        assert len(leaf.sharding.device_set) == 8


class TestAdamL2:
    def test_matches_torch_adam_with_weight_decay(self):
        import torch

        w0 = np.array([1.0, -2.0, 3.0], np.float32)
        g = np.array([0.1, 0.2, -0.3], np.float32)

        p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.Adam([p], lr=1e-3, weight_decay=1e-4)
        for _ in range(3):
            opt.zero_grad()
            p.grad = torch.from_numpy(g.copy())
            opt.step()
        ref = p.detach().numpy()

        from image_segmentation_tpu.config import OptimizerConfig
        import jax.numpy as jnp

        tx = adam_l2(OptimizerConfig())
        params = jnp.asarray(w0)
        state = tx.init(params)
        for _ in range(3):
            updates, state = tx.update(jnp.asarray(g), state, params)
            params = params + updates
        np.testing.assert_allclose(np.asarray(params), ref, rtol=1e-5, atol=1e-7)


class TestAutoencoderTraining:
    def test_mse_path(self, tmp_path):
        cfg = TrainConfig(
            model="autoencoder",
            loss="mse",
            batch_size=8,
            num_epochs=1,
            save_dir=str(tmp_path),
            data=DataConfig(
                dataset="synthetic", synthetic_length=8, image_size=32,
                augmentations_per_datapoint=0,
            ),
        )
        t = Trainer(cfg)
        out = t.train()
        assert out["history"][0]["train_loss"] > 0


class TestBatchNormSemantics:
    """Pin the documented BN behaviour: batch statistics are computed over
    the GLOBAL batch when the batch is sharded on the data axis
    (SyncBatchNorm-equivalent), and the model (TP) axis does not change
    them (it shards weights, never the batch)."""

    @staticmethod
    def _updated_mean(mesh_kwargs):
        import jax.numpy as jnp
        from flax import linen as nn

        from image_segmentation_tpu.models.blocks import BN_MOMENTUM
        from image_segmentation_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(**mesh_kwargs)
        bn = nn.BatchNorm(use_running_average=False, momentum=BN_MOMENTUM)
        # Per-shard means differ wildly: shard i has constant value i.
        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        x = np.repeat(np.arange(n_data, dtype=np.float32), 2)[:, None]
        global_mean = x.mean()
        variables = bn.init(jax.random.PRNGKey(0), x)
        xs = jax.device_put(jnp.asarray(x), mesh_lib.batch_sharding(mesh))
        variables = mesh_lib.replicate(mesh, variables)

        @jax.jit
        def step(variables, x):
            _, mutated = bn.apply(variables, x, mutable=["batch_stats"])
            return mutated["batch_stats"]["mean"]

        new_mean = np.asarray(step(variables, xs))[0]
        expected = (1 - BN_MOMENTUM) * global_mean  # init running mean is 0
        return new_mean, expected

    def test_global_stats_across_data_axis(self):
        new_mean, expected = self._updated_mean(dict(n_data=8))
        np.testing.assert_allclose(new_mean, expected, rtol=1e-6)

    def test_model_axis_does_not_change_stats(self):
        new_mean, expected = self._updated_mean(dict(n_data=4, n_model=2))
        np.testing.assert_allclose(new_mean, expected, rtol=1e-6)


class TestLayerSettings:
    def test_settings_json_has_per_layer_section(self, trained):
        t, _ = trained
        with open(os.path.join(t.run_dir, "model_settings.json")) as f:
            payload = json.load(f)
        layers = payload["layers"]
        convs = {k: v for k, v in layers.items() if v.get("type") == "Conv"}
        norms = {k: v for k, v in layers.items() if v.get("type") == "Norm"}
        assert convs and norms
        # Stem conv of the smoke UNet: 1x1, 3 -> stem_features(8).
        stem = next(v for k, v in convs.items() if v["in_features"] == 3)
        assert stem["kernel_size"] == [1, 1] and stem["out_features"] == 8
        for v in norms.values():
            assert v["features"] > 0

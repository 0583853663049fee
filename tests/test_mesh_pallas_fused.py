"""The production headline config (w2d + Pallas fused ConvBN blocks) under
DATA-PARALLEL sharding: the Pallas custom calls must partition over the
8-device mesh and produce the same chained-step losses and BatchNorm batch
statistics as the dense XLA folded implementation (which test_folded.py in
turn pins to the standard blocks on a single device, and
test_trainer.py::TestBatchNormSemantics pins across the mesh).

Covers what the single-device equivalence tests cannot: GSPMD partitioning
of the pallas_call batch grid plus the cross-device aggregation of the
in-kernel BN statistics epilogue.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.config import DataConfig, TrainConfig
from image_segmentation_tpu.engine.train import Trainer


@pytest.mark.slow
def test_pallas_fused_matches_dense_on_data_parallel_mesh():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    msk = jnp.asarray(rng.integers(0, 3, (8, 32, 32)).astype(np.uint8))

    results = {}
    for impl in ("dense", "pallas_fused"):
        cfg = TrainConfig(
            model="unet", batch_size=8, num_epochs=1, bf16=False, seed=3,
            model_args={"stem_features": 8, "encoder_features": (16, 32),
                        "w2d_level0": True, "w2d_impl": impl},
            data=DataConfig(dataset="synthetic", synthetic_length=8,
                            image_size=32, augmentations_per_datapoint=0),
        )
        trainer = Trainer(cfg, make_artifacts=False)
        assert trainer.mesh.shape["data"] == len(jax.devices())

        state, loss1 = trainer._train_step(
            trainer.state, img, msk, jax.random.PRNGKey(0)
        )
        state, loss2 = trainer._train_step(state, img, msk, jax.random.PRNGKey(1))
        results[impl] = (
            float(loss1), float(loss2), jax.tree.leaves(state["batch_stats"])
        )

    d1, d2, dstats = results["dense"]
    f1, f2, fstats = results["pallas_fused"]
    np.testing.assert_allclose([f1, f2], [d1, d2], rtol=2e-5, atol=2e-6)
    for a, b in zip(dstats, fstats):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )

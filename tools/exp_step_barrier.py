"""Does a barrier after the geometric stage restore the fast gather lowering?"""
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
import numpy as np
import jax
import jax.numpy as jnp


def step_time(label, geometry, barrier_after):
    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.engine.train import Trainer
    from image_segmentation_tpu.ops import augment as aug_ops

    if barrier_after:
        orig = aug_ops.random_geometric
        def patched(key, stacked, max_degrees=90.0, method="gather"):
            return jax.lax.optimization_barrier(orig(key, stacked, max_degrees, method))
        aug_ops.random_geometric = patched

    batch, size = 16, 512
    cfg = TrainConfig(
        model="large_unet", batch_size=batch, num_epochs=1,
        model_args={"w2d_level0": True},
        data=DataConfig(dataset="synthetic", synthetic_length=batch,
                        image_size=size, augmentations_per_datapoint=4),
    )
    trainer = Trainer(cfg, make_artifacts=False)
    trainer.augmentor = aug_ops.DataAugmentor(4, geometry=geometry)
    trainer._train_step = trainer._build_train_step()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)).astype(np.uint8))

    state = trainer.state
    for i in range(3):
        state, loss = trainer._train_step(state, images, masks, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    nn = 15
    for i in range(nn):
        state, loss = trainer._train_step(state, images, masks, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / nn
    print(f"step[{label}]: {dt*1e3:6.1f} ms  ({batch/dt:5.1f} img/s)", flush=True)
    if barrier_after:
        aug_ops.random_geometric = orig


if __name__ == "__main__":
    step_time("gather+barrier", "gather", True)
    step_time("shear3+barrier", "shear3", True)

"""Step time with rotation removed entirely (flip-only geometry)."""
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
import numpy as np
import jax
import jax.numpy as jnp
from image_segmentation_tpu.ops import augment as aug_ops


def flip_only(key, stacked, max_degrees=90.0, method="gather"):
    n = stacked.shape[0]
    k_flip, _ = jax.random.split(key)
    flip = jax.random.bernoulli(k_flip, 0.5, (n,))
    return jnp.where(flip[:, None, None, None], stacked[:, :, ::-1, :], stacked)


aug_ops.random_geometric = flip_only

from image_segmentation_tpu.config import DataConfig, TrainConfig
from image_segmentation_tpu.engine.train import Trainer

batch, size = 16, 512
cfg = TrainConfig(
    model="large_unet", batch_size=batch, num_epochs=1,
    model_args={"w2d_level0": True},
    data=DataConfig(dataset="synthetic", synthetic_length=batch,
                    image_size=size, augmentations_per_datapoint=4),
)
trainer = Trainer(cfg, make_artifacts=False)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)).astype(np.uint8))
state = trainer.state
for i in range(3):
    state, loss = trainer._train_step(state, images, masks, jax.random.PRNGKey(i))
jax.block_until_ready(loss)
t0 = time.perf_counter()
n = 15
for i in range(n):
    state, loss = trainer._train_step(state, images, masks, jax.random.PRNGKey(100 + i))
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / n
print(f"step[no rotation]: {dt*1e3:6.1f} ms  ({batch/dt:5.1f} img/s)")

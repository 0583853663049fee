"""Rotation strategy experiments on the real chip (in-step + standalone)."""
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
import numpy as np


def timeit_keys(f, x, n=20):
    """Time f(key_i, x) with a DIFFERENT key each call (axon caches
    byte-identical executions)."""
    import jax
    keys = [jax.random.PRNGKey(1000 + i) for i in range(n)]
    out = f(keys[0], x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in keys:
        out = f(k, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def step_time(geometry):
    import jax, jax.numpy as jnp
    from image_segmentation_tpu.config import DataConfig, TrainConfig
    from image_segmentation_tpu.engine.train import Trainer
    from image_segmentation_tpu.ops import augment as aug_ops

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
    n = 15
    for i in range(n):
        state, loss = trainer._train_step(state, images, masks, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"step[{geometry:>9}]: {dt*1e3:6.1f} ms  ({batch/dt:5.1f} img/s)", flush=True)


def standalone(methods):
    import jax, jax.numpy as jnp
    from image_segmentation_tpu.ops import augment as A

    n, h, w, c = 16, 512, 512, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (n, h, w, c), dtype=np.uint8))

    for method in methods:
        f = jax.jit(lambda k, s, m=method: A.random_geometric(k, s, 90.0, m))
        try:
            dt = timeit_keys(f, x)
            print(f"standalone[{method:>9}]: {dt*1e3:6.2f} ms", flush=True)
        except Exception as e:
            print(f"standalone[{method:>9}]: FAIL {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    args = sys.argv[1:]
    standalone([a for a in args if not a.startswith("step:")] or ["gather"])
    for a in args:
        if a.startswith("step:"):
            step_time(a[5:])

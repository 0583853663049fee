"""Minimal A/B: why is the same gather 0.3ms in one harness, 35ms in another?"""
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
import numpy as np
import jax
import jax.numpy as jnp
from image_segmentation_tpu.ops import augment as A

rng = np.random.default_rng(0)
x_rand = jnp.asarray(rng.integers(0, 256, (16, 512, 512, 4), dtype=np.uint8))
img = jnp.asarray(rng.integers(0, 256, (16, 512, 512, 3), dtype=np.uint8))
msk = jnp.asarray(rng.integers(0, 3, (16, 512, 512)).astype(np.uint8))
x_cat = jax.device_put(np.concatenate([np.asarray(img), np.asarray(msk)[..., None]], -1))

f_key = jax.jit(lambda key, s: A.random_geometric(key, s, 90.0, "gather"))
f_idx = jax.jit(lambda i, s: A.random_geometric(jax.random.PRNGKey(i), s, 90.0, "gather"))

def t(f, mk, x, n=15):
    for i in range(2):
        out = f(mk(i), x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = f(mk(100 + i), x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

print(f"key-arg, x_rand: {t(f_key, jax.random.PRNGKey, x_rand):7.2f} ms", flush=True)
print(f"key-arg, x_cat:  {t(f_key, jax.random.PRNGKey, x_cat):7.2f} ms", flush=True)
print(f"idx-arg, x_rand: {t(f_idx, lambda i: i, x_rand):7.2f} ms", flush=True)
print(f"idx-arg, x_cat:  {t(f_idx, lambda i: i, x_cat):7.2f} ms", flush=True)

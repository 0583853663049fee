"""Find the smallest standalone repro of the slow in-step rotation gather."""
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
import numpy as np
import jax
import jax.numpy as jnp
from image_segmentation_tpu.ops import augment as A


def timeit_varying(f, n_iter=15):
    outs = [f(i) for i in range(2)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [f(100 + i) for i in range(n_iter)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n_iter


rng = np.random.default_rng(0)
n, h, w = 16, 512, 512
img = jnp.asarray(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
msk = jnp.asarray(rng.integers(0, 3, (n, h, w)).astype(np.uint8))
aug = A.DataAugmentor(4)

f1 = jax.jit(lambda i: aug.apply_u8(jax.random.PRNGKey(i), img, msk))
print(f"apply_u8 full:        {timeit_varying(f1)*1e3:7.2f} ms", flush=True)

# geometry only, but from concat of separate img/mask (as in apply_u8)
def geom_only(i):
    key = jax.random.PRNGKey(i)
    kg, _, _ = jax.random.split(key, 3)
    stacked = jnp.concatenate([img, msk[..., None]], axis=-1)
    return A.random_geometric(kg, stacked, 90.0, "gather")
f2 = jax.jit(geom_only)
print(f"geom from concat:     {timeit_varying(f2)*1e3:7.2f} ms", flush=True)

# geometry + the colour stage consumer (no clean-slot, no normalize of clean)
def geom_colour(i):
    key = jax.random.PRNGKey(i)
    kg, kc, kb = jax.random.split(key, 3)
    stacked = jnp.concatenate([img, msk[..., None]], axis=-1)
    stacked = A.random_geometric(kg, stacked, 90.0, "gather")
    out = aug._colour_stage(kc, kb, stacked[..., :3], from_u8=True, dtype=jnp.float32)
    return out, stacked[..., 3].astype(jnp.int32)
f3 = jax.jit(geom_colour)
print(f"geom+colour:          {timeit_varying(f3)*1e3:7.2f} ms", flush=True)

# --- variants to restore the fast gather ---

def geom_u32(i):
    key = jax.random.PRNGKey(i)
    kg, _, _ = jax.random.split(key, 3)
    stacked = jnp.concatenate([img, msk[..., None]], axis=-1)
    packed = jax.lax.bitcast_convert_type(stacked, jnp.uint32)  # (n,h,w)
    out = A.random_geometric(kg, packed[..., None], 90.0, "gather")
    return jax.lax.bitcast_convert_type(out[..., 0], jnp.uint8)
f4 = jax.jit(geom_u32)
print(f"geom u32-packed:      {timeit_varying(f4)*1e3:7.2f} ms", flush=True)

def geom_sep(i):
    key = jax.random.PRNGKey(i)
    kg, _, _ = jax.random.split(key, 3)
    n_ = img.shape[0]
    k_flip, k_rot = jax.random.split(kg)
    flip = jax.random.bernoulli(k_flip, 0.5, (n_,))
    angles = jax.random.uniform(k_rot, (n_,), minval=-90., maxval=90.)
    fi = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
    fm = jnp.where(flip[:, None, None], msk[:, :, ::-1], msk)
    fi = jax.lax.optimization_barrier(fi)
    fm = jax.lax.optimization_barrier(fm)
    oi = jax.vmap(A._rotate_one)(fi, angles)
    om = jax.vmap(A._rotate_one)(fm[..., None], angles)
    return oi, om[..., 0]
f5 = jax.jit(geom_sep)
print(f"geom separate img/msk:{timeit_varying(f5)*1e3:7.2f} ms", flush=True)

def geom_reshape_trick(i):
    key = jax.random.PRNGKey(i)
    kg, _, _ = jax.random.split(key, 3)
    stacked = jnp.concatenate([img, msk[..., None]], axis=-1)
    stacked = stacked.reshape(n, h * w * 4).reshape(n, h, w, 4)
    return A.random_geometric(kg, stacked, 90.0, "gather")
f6 = jax.jit(geom_reshape_trick)
print(f"geom reshape trick:   {timeit_varying(f6)*1e3:7.2f} ms", flush=True)

def geom_swap_trick(i):
    key = jax.random.PRNGKey(i)
    kg, _, _ = jax.random.split(key, 3)
    stacked = jnp.concatenate([img, msk[..., None]], axis=-1)
    stacked = jnp.swapaxes(jnp.swapaxes(stacked, 0, 3), 0, 3)
    stacked = jax.lax.optimization_barrier(stacked)
    return A.random_geometric(kg, stacked, 90.0, "gather")
f7 = jax.jit(geom_swap_trick)
print(f"geom swap trick:      {timeit_varying(f7)*1e3:7.2f} ms", flush=True)

def geom_xarg(i, stacked):
    key = jax.random.PRNGKey(i)
    kg, _, _ = jax.random.split(key, 3)
    return A.random_geometric(kg, stacked, 90.0, "gather")
x4 = jnp.concatenate([img, msk[..., None]], axis=-1)
x4 = jax.device_put(np.asarray(x4))
f8 = jax.jit(geom_xarg)
print(f"geom x-as-arg:        {timeit_varying(lambda i: f8(i, x4))*1e3:7.2f} ms", flush=True)

"""Fourth bisect: which elementary op hangs the native Mosaic compile?
Suspects from the attention/preprocess kernels: exp, softmax internals,
-inf constants, f32 reduces along lanes."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 256, 128


def run(name, kernel):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(H, W)).astype(np.float32))
    t0 = time.perf_counter()
    print(f"{name}: compiling...", flush=True)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )(x)
        jax.block_until_ready(out)
        print(f"{name}: OK in {time.perf_counter() - t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:130]}", flush=True)


run("copy", lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...]))
run("exp", lambda x_ref, o_ref: o_ref.__setitem__(..., jnp.exp(x_ref[...])))


def k_rmax(x_ref, o_ref):
    m = jnp.max(x_ref[...], axis=-1, keepdims=True)
    o_ref[...] = x_ref[...] - m

run("reduce_max_lanes", k_rmax)


def k_softmax(x_ref, o_ref):
    o_ref[...] = jax.nn.softmax(x_ref[...], axis=-1)

run("softmax", k_softmax)


def k_neginf(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    o_ref[...] = jnp.where(col >= 64, -jnp.inf, x_ref[...])

run("neginf_where", k_neginf)


def k_div(x_ref, o_ref):
    s = jnp.sum(x_ref[...], axis=-1, keepdims=True)
    o_ref[...] = x_ref[...] / s

run("div_by_rowsum", k_div)

print("done")

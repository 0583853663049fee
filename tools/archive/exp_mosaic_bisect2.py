"""Finer bisect of the halo_build crash: lane slice / wp shift / lane concat."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

HT, WP, L, CI, NOUT = 8, 16, 64, 16, 32


def run(name, kernel):
    x = (jnp.arange(2 * 16 * WP * L, dtype=jnp.float32) / 1e5).reshape(2, 16, WP, L).astype(jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(2, 2),
            in_specs=[pl.BlockSpec((1, HT, WP, L), lambda b, i: (b, i, 0, 0))],
            out_specs=pl.BlockSpec((1, HT, WP, NOUT), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 16, WP, NOUT), jnp.bfloat16),
        )(x)
        jax.block_until_ready(out)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")


# a. lane slice at non-zero offset only
def ka(mid, out):
    xv = mid[0]
    out[0] = xv[:, :, (4 - 1) * CI : (4 - 1) * CI + NOUT]

run("lane_slice", ka)


# b. wp (sublane) shift with zero fill
def kb(mid, out):
    xv = mid[0][:, :, :NOUT]
    z = jnp.zeros((HT, 1, NOUT), xv.dtype)
    out[0] = jnp.concatenate([z, xv[:, :-1]], axis=1)

run("wp_shift", kb)


# c. lane concat 16 | 64 -> 80 lanes, then slice 80->32
def kc(mid, out):
    xv = mid[0]
    a = xv[:, :, :CI]
    cat = jnp.concatenate([a, xv], axis=-1)  # 80 lanes
    out[0] = cat[:, :, :NOUT]

run("lane_concat_unaligned", kc)


# d. lane concat with zcol zeros + shift (prev construction, no big concat)
def kd(mid, out):
    xv = mid[0]
    prev_cols = xv[:, :, (4 - 1) * CI : 4 * CI]
    z = jnp.zeros((HT, 1, CI), xv.dtype)
    prev = jnp.concatenate([z, prev_cols[:, :-1]], axis=1)
    out[0] = jnp.concatenate([prev, prev], axis=-1)  # 32 lanes

run("prev_build", kd)


# e. roll-based wp shift + where mask (alternative formulation)
def ke(mid, out):
    xv = mid[0][:, :, :NOUT]
    r = jnp.roll(xv, 1, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (HT, WP, NOUT), 1)
    out[0] = jnp.where(idx == 0, jnp.zeros_like(r), r)

run("roll_mask", ke)

print("done")

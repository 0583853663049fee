"""Bisect which op in the folded-conv kernel body crashes the remote Mosaic
compile (HTTP 500, no diagnostics surfaced).  Runs tiny kernels natively."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

HT, WP, L, CI, NOUT = 8, 16, 64, 16, 32  # small but tile-aligned-ish


def run(name, kernel, n_in=3, extra=()):
    x = jnp.arange(2 * 16 * WP * L, dtype=jnp.float32).reshape(2, 16, WP, L) / 1e5
    x = x.astype(jnp.bfloat16)
    ht = HT
    n_h = 16 // ht
    in_specs = [
        pl.BlockSpec((1, 1, WP, L), lambda b, i: (b, jnp.maximum(i * HT - 1, 0), 0, 0)),
        pl.BlockSpec((1, ht, WP, L), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, 1, WP, L), lambda b, i: (b, jnp.minimum(i * HT + HT, n_h * HT - 1), 0, 0)),
    ][:n_in]
    args = [x] * n_in
    for spec, arr in extra:
        in_specs.append(spec)
        args.append(arr)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(2, n_h),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, ht, WP, NOUT), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 16, WP, NOUT), jnp.bfloat16),
        )(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK")
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return False


# 1. copy mid -> out (slice lanes to NOUT)
def k1(mid, out):
    out[0] = mid[0][:, :, :NOUT]

run("copy", k1, n_in=1)


# 2. concat top/mid/bot on axis 0, use rows
def k2(top, mid, bot, out):
    xv = jnp.concatenate([top[0], mid[0], bot[0]], axis=0)
    out[0] = (xv[0:HT] + xv[1:HT+1] + xv[2:HT+2])[:, :, :NOUT]

run("concat_rows", k2)


# 3. jnp.where with scalar traced pred
def k3(top, mid, bot, out):
    i = pl.program_id(1)
    t = jnp.where(i > 0, top[0], jnp.zeros_like(top[0]))
    b = jnp.where(i < pl.num_programs(1) - 1, bot[0], jnp.zeros_like(bot[0]))
    xv = jnp.concatenate([t, mid[0], b], axis=0)
    out[0] = (xv[0:HT] + xv[1:HT+1] + xv[2:HT+2])[:, :, :NOUT]

run("where_pred", k3)


# 4. lane slices at CI offsets + wp shift + lane concat (the halo build)
def k4(top, mid, bot, out):
    xv = jnp.concatenate([top[0], mid[0], bot[0]], axis=0)
    prev_cols = xv[:, :, (4 - 1) * CI : 4 * CI]
    next_cols = xv[:, :, 0:CI]
    zcol = jnp.zeros((HT + 2, 1, CI), xv.dtype)
    prev = jnp.concatenate([zcol, prev_cols[:, :-1]], axis=1)
    nxt = jnp.concatenate([next_cols[:, 1:], zcol], axis=1)
    aug = jnp.concatenate([prev, xv, nxt], axis=-1)  # (HT+2, WP, L+2CI)
    out[0] = aug[1:HT+1, :, :NOUT]

run("halo_build", k4)


# 5. reshape + dot + store
def k5(top, mid, bot, w, out):
    xv = jnp.concatenate([top[0], mid[0], bot[0]], axis=0)
    acc = jnp.zeros((HT * WP, NOUT), jnp.float32)
    for dy in range(3):
        a = xv[dy:dy+HT].reshape(HT * WP, L)
        acc = acc + jnp.dot(a, w[dy], preferred_element_type=jnp.float32)
    out[0] = acc.reshape(HT, WP, NOUT).astype(jnp.bfloat16)

w = jnp.ones((3, L, NOUT), jnp.bfloat16)
run("reshape_dot", k5, extra=[(pl.BlockSpec((3, L, NOUT), lambda b, i: (0, 0, 0)), w)])


# 6. full body: halo build + non-aligned kdim dot
def k6(top, mid, bot, w, out):
    xv = jnp.concatenate([top[0], mid[0], bot[0]], axis=0)
    prev_cols = xv[:, :, (4 - 1) * CI:4 * CI]
    next_cols = xv[:, :, 0:CI]
    zcol = jnp.zeros((HT + 2, 1, CI), xv.dtype)
    prev = jnp.concatenate([zcol, prev_cols[:, :-1]], axis=1)
    nxt = jnp.concatenate([next_cols[:, 1:], zcol], axis=1)
    aug = jnp.concatenate([prev, xv, nxt], axis=-1)
    kd = L + 2 * CI
    acc = jnp.zeros((HT * WP, NOUT), jnp.float32)
    for dy in range(3):
        a = aug[dy:dy+HT].reshape(HT * WP, kd)
        acc = acc + jnp.dot(a, w[dy], preferred_element_type=jnp.float32)
    out[0] = acc.reshape(HT, WP, NOUT).astype(jnp.bfloat16)

w2 = jnp.ones((3, L + 2 * CI, NOUT), jnp.bfloat16)
run("full_body", k6, extra=[(pl.BlockSpec((3, L + 2 * CI, NOUT), lambda b, i: (0, 0, 0)), w2)])

print("done")

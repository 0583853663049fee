"""Third bisect round: isolate the offset lane-slice crash."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

HT, WP, L = 8, 16, 64


def run(name, kernel, out_l):
    x = (jnp.arange(2 * 16 * WP * L, dtype=jnp.float32) / 1e5).reshape(2, 16, WP, L).astype(jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(2, 2),
            in_specs=[pl.BlockSpec((1, HT, WP, L), lambda b, i: (b, i, 0, 0))],
            out_specs=pl.BlockSpec((1, HT, WP, out_l), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 16, WP, out_l), jnp.bfloat16),
        )(x)
        jax.block_until_ready(out)
        print(f"{name}: OK")
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return False


run("slice_off32_w32", lambda m, o: o.__setitem__(0, m[0][:, :, 32:64]), 32)
run("slice_off48_w16", lambda m, o: o.__setitem__(0, m[0][:, :, 48:64]), 16)


def k_shift0(m, o):  # offset-0 16-wide slice + wp shift
    s = m[0][:, :, 0:16]
    z = jnp.zeros((HT, 1, 16), s.dtype)
    o[0] = jnp.concatenate([z, s[:, :-1]], axis=1)

run("shift_of_slice_off0_w16", k_shift0, 16)


def k_shift48(m, o):  # offset-48 16-wide slice + wp shift
    s = m[0][:, :, 48:64]
    z = jnp.zeros((HT, 1, 16), s.dtype)
    o[0] = jnp.concatenate([z, s[:, :-1]], axis=1)

run("shift_of_slice_off48_w16", k_shift48, 16)


def k_lanecat16(m, o):  # lane concat of two 16-wide (from offset slices)
    a = m[0][:, :, 48:64]
    b = m[0][:, :, 0:16]
    o[0] = jnp.concatenate([a, b], axis=-1)

run("lanecat_two_w16", k_lanecat16, 32)


def k_zcol_lanecat(m, o):  # zeros + slice lane concat
    a = m[0][:, :, 0:16]
    z = jnp.zeros((HT, WP, 16), a.dtype)
    o[0] = jnp.concatenate([z, a], axis=-1)

run("lanecat_zeros_w16", k_zcol_lanecat, 32)

print("done")

"""Pallas per-row / per-column variable shift for the shear-roll rotation.

The augmentor's rotation (ops/augment._rotate_shear3 — TPU-native
re-derivation of the reference's kornia RandomRotation,
processing_blocks.py:350-353) decomposes into three shears, each a
per-row (or per-column) constant shift.  The XLA formulation
(ops/augment._row_shift) applies log2(W) conditional static rolls, each
a full HBM pass over the batch (~9.5 ms of the 512^2 batch-16 step).
These kernels do the same binary-decomposed rolls INSIDE VMEM: one HBM
read + one write per shear, with the image+mask uint8 channels packed
into one int32 plane per pixel (bit-exact: the rolls and selects move
whole pixels).

out[n, i, j] = x[n, i, j - s[n, i]]   (row kernel;  zero fill outside)
out[n, i, j] = x[n, i - s[n, j], j]   (col kernel)

Instead of physically padding by max_shift like the XLA path, the rolls
wrap modulo W and a (j >= s) & (j < W + s) mask supplies the zero fill —
identical results for any |s| < W (the XLA path requires |s| <= max_shift;
equivalence is tested in tests/test_pallas_roll.py and on silicon in
tests/test_real_tpu_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _shift_kernel_body(x_ref, t_ref, o_ref, *, axis: int, size: int):
    """Binary-decomposed per-row (axis=1) / per-column (axis=0) roll.

    x_ref: (1, h, w) i32;  t_ref: (1, h, 1) or (1, 1, w) i32 raw shifts
    with |s| < size;  o_ref: (1, h, w) i32.
    """
    x = x_ref[0]
    t = t_ref[0]  # broadcasts against (h, w) along the shifted axis
    # Roll amount r = s mod size without a remainder op: |s| < size.
    r = jnp.where(t < 0, t + size, t)
    out = x
    bit = 1
    while bit < size:
        rolled = jnp.roll(out, bit, axis=axis)
        out = jnp.where((r & bit) > 0, rolled, out)
        bit <<= 1
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    valid = (idx >= t) & (idx < size + t)
    o_ref[0] = jnp.where(valid, out, jnp.zeros((), jnp.int32))


@functools.lru_cache(maxsize=None)
def _make_shift(
    n: int, h: int, w: int, axis: int, interpret: bool = False
):
    size = w if axis == 1 else h
    t_block = (1, h, 1) if axis == 1 else (1, 1, w)
    return pl.pallas_call(
        functools.partial(_shift_kernel_body, axis=axis, size=size),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda b: (b, 0, 0)),
            pl.BlockSpec(t_block, lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * w * max(size.bit_length() - 1, 1),
            bytes_accessed=2 * n * h * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def pallas_row_shift(
    x_i32: jax.Array, shifts: jax.Array, interpret: bool = False
) -> jax.Array:
    """out[n, i, j] = x[n, i, j - shifts[n, i]], zero fill; x (n, h, w) i32."""
    n, h, w = x_i32.shape
    fn = _make_shift(n, h, w, axis=1, interpret=interpret)
    return fn(x_i32, shifts.astype(jnp.int32)[:, :, None])


def pallas_col_shift(
    x_i32: jax.Array, shifts: jax.Array, interpret: bool = False
) -> jax.Array:
    """out[n, i, j] = x[n, i - shifts[n, j], j], zero fill; x (n, h, w) i32."""
    n, h, w = x_i32.shape
    fn = _make_shift(n, h, w, axis=0, interpret=interpret)
    return fn(x_i32, shifts.astype(jnp.int32)[:, None, :])


def pack_u8x4(x_u8: jax.Array) -> jax.Array:
    """(n, h, w, 4) uint8 -> (n, h, w) int32, one pixel per element."""
    return jax.lax.bitcast_convert_type(x_u8, jnp.int32)


def unpack_u8x4(x_i32: jax.Array) -> jax.Array:
    """(n, h, w) int32 -> (n, h, w, 4) uint8."""
    return jax.lax.bitcast_convert_type(x_i32, jnp.uint8)

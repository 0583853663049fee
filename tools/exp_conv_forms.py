"""A/B alternative formulations of the width-folded 3x3 conv on the real TPU.

The current FoldedConv (models/folded.py) expands a 3x3 Ci->Co conv on a
width-folded-by-4 tensor into a dense (3,3,4Ci,4Co) conv: 4x the logical
FLOPs.  The expanded kernel is only 25% dense, so sparser decompositions
exist:

  aug6:   materialize 6 columns of context per 4-column block
          (B,H,W/4,6Ci) and convolve with a (3,1,6Ci,4Co) kernel -> 2.0x
  cc:     (3,1,4Ci,4Co) "center" conv (within-block taps, 10/16 dense)
          + two cross-block rank-Ci correction matmuls               -> 1.5x
  f2aug:  fold by 2 instead: aug4 (B,H,W/2,4Ci) x (3,1,4Ci,2Co)     -> 1.33x
          (but 2Ci/2Co-channel buffers lane-pad 2x for Ci=32)

All are exact (same math, reordered).  Times fwd and fwd+bwd with varying
inputs (axon caches byte-identical executions).
"""
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.folded import _expand_kernel

F = 4


def timeit(f, args_fn, n=12):
    outs = [f(*args_fn(i)) for i in range(2)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [f(*args_fn(100 + i)) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def conv_unfolded(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_dense_folded(x4, w):
    wp = _expand_kernel(w, F)
    return jax.lax.conv_general_dilated(
        x4, wp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _aug_kernel(w, f):
    """(3,3,Ci,Co) -> (3,1,(f+2)Ci,fCo): K'[dy,0,(t,ci),(qx,co)] = w[dy,t-qx,ci,co]."""
    kh, kw, ci, co = w.shape
    sel = np.zeros((f + 2, f, 3), np.float32)  # t, qx, kw_idx
    for qx in range(f):
        for dj in (-1, 0, 1):
            sel[qx + dj + 1, qx, dj + 1] = 1.0
    selj = jnp.asarray(sel, w.dtype)
    kp = jnp.einsum("tqD,aDio->atiqo", selj, w)  # (3, f+2, ci, f, co)
    return kp.reshape(kh, 1, (f + 2) * ci, f * co)


def _augment6(x4, ci, f=F):
    """(B,H,Wp,f*Ci) -> (B,H,Wp,(f+2)*Ci): cols [fJ-1 .. fJ+f] per block."""
    b, h, wp, _ = x4.shape
    x5 = x4.reshape(b, h, wp, f, ci)
    z = jnp.zeros((b, h, 1, ci), x4.dtype)
    prev_last = jnp.concatenate([z, x5[:, :, :-1, f - 1]], axis=2)
    next_first = jnp.concatenate([x5[:, :, 1:, 0], z], axis=2)
    return jnp.concatenate(
        [prev_last, x4, next_first], axis=-1)


def conv_aug6(x4, w, ci):
    kp = _aug_kernel(w, F)
    aug = _augment6(x4, ci, F)
    return jax.lax.conv_general_dilated(
        aug, kp, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _center_kernel(w, f):
    """within-block taps only: Kc[dy,0,(px,ci),(qx,co)] = w[dy,qx-px+1,ci,co]."""
    kh, kw, ci, co = w.shape
    sel = np.zeros((f, f, 3), np.float32)  # px, qx, kw
    for qx in range(f):
        for px in range(f):
            if abs(qx - px) <= 1:
                sel[px, qx, px - qx + 1] = 1.0
    selj = jnp.asarray(sel, w.dtype)
    kp = jnp.einsum("pqD,aDio->apiqo", selj, w)
    return kp.reshape(kh, 1, f * ci, f * co)


def conv_cc(x4, w, ci):
    b, h, wp, _ = x4.shape
    co = w.shape[-1]
    kc = _center_kernel(w, F)
    out = jax.lax.conv_general_dilated(
        x4, kc, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x5 = x4.reshape(b, h, wp, F, ci)
    z = jnp.zeros((b, h, 1, ci), x4.dtype)
    prev_last = jnp.concatenate([z, x5[:, :, :-1, F - 1]], axis=2)
    next_first = jnp.concatenate([x5[:, :, 1:, 0], z], axis=2)
    # out slot 0 += conv(prev_last, w[:, 0]); out slot 3 += conv(next_first, w[:, 2])
    c1 = jax.lax.conv_general_dilated(
        prev_last, w[:, :1], (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    c2 = jax.lax.conv_general_dilated(
        next_first, w[:, 2:], (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    pad1 = jnp.pad(c1, ((0, 0),) * 3 + (((0, (F - 1) * co)),))
    pad2 = jnp.pad(c2, ((0, 0),) * 3 + ((((F - 1) * co, 0)),))
    return out + pad1 + pad2


def conv_f2aug(x2, w, ci):
    """fold-2 variant: x2 (B,H,W/2,2Ci) -> (B,H,W/2,2Co)."""
    f = 2
    b, h, wp, _ = x2.shape
    kp = _aug_kernel(w, f)
    x5 = x2.reshape(b, h, wp, f, ci)
    z = jnp.zeros((b, h, 1, ci), x2.dtype)
    prev_last = jnp.concatenate([z, x5[:, :, :-1, f - 1]], axis=2)
    next_first = jnp.concatenate([x5[:, :, 1:, 0], z], axis=2)
    aug = jnp.concatenate([prev_last, x2, next_first], axis=-1)
    return jax.lax.conv_general_dilated(
        aug, kp, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check_exact():
    rng = np.random.default_rng(0)
    b, h, w, ci, co = 2, 16, 16, 3, 5
    x = jnp.asarray(rng.normal(size=(b, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32))
    ref = conv_unfolded(x, k)
    x4 = x.reshape(b, h, w // F, F * ci)
    for name, fn in [("dense", lambda: conv_dense_folded(x4, k)),
                     ("aug6", lambda: conv_aug6(x4, k, ci)),
                     ("cc", lambda: conv_cc(x4, k, ci))]:
        got = fn().reshape(b, h, w // F, F, co).reshape(b, h, w, co)
        err = float(jnp.abs(got - ref).max())
        print(f"  {name:6s} max_err={err:.2e}")
        assert err < 1e-4, name
    got = conv_f2aug(x.reshape(b, h, w // 2, 2 * ci), k, ci)
    got = got.reshape(b, h, w, co)
    err = float(jnp.abs(got - ref).max())
    print(f"  f2aug  max_err={err:.2e}")
    assert err < 1e-4


def bench_shape(b, h, w, ci, co, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    # one input, VARYING kernels per iteration: the axon runtime caches
    # byte-identical executions, so at least one argument must be fresh
    # every call; kernels are cheap to keep resident.
    ks = [jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32),
                      dtype=dtype) for _ in range(16)]
    x = jnp.asarray(rng.normal(size=(b, h, w, ci)).astype(np.float32), dtype=dtype)
    x4 = x.reshape(b, h, w // F, F * ci)
    x2 = x.reshape(b, h, w // 2, 2 * ci)

    logical_tflops = 2 * 9 * ci * co * b * h * w / 1e12
    print(f"shape B{b} {h}x{w} {ci}->{co}  (logical fwd {logical_tflops:.3f} TFLOP)", flush=True)

    forms = {
        "unfolded": (jax.jit(conv_unfolded), x),
        "dense": (jax.jit(conv_dense_folded), x4),
        "aug6": (jax.jit(partial(conv_aug6, ci=ci)), x4),
        "cc": (jax.jit(partial(conv_cc, ci=ci)), x4),
        "f2aug": (jax.jit(partial(conv_f2aug, ci=ci)), x2),
    }
    for name, (f, inp) in forms.items():
        ms = timeit(lambda i, f=f, inp=inp: f(inp, ks[i % len(ks)]),
                    lambda i: (i,))
        eff = logical_tflops / (ms / 1e3) / 197 * 100
        print(f"  fwd  {name:9s} {ms:7.2f} ms  ({eff:5.1f}% of peak at logical FLOPs)", flush=True)

    # bwd only: vjp with a RANDOM cotangent (an all-ones cotangent lets XLA
    # constant-fold most of the backward pass).
    for name, (f, inp) in forms.items():
        out_shape = jax.eval_shape(f, inp, ks[0])
        ct_arr = jnp.asarray(
            rng.normal(size=out_shape.shape).astype(np.float32), dtype=dtype)

        def bwd(x, k, ct, f=f):
            out, pull = jax.vjp(f, x, k)
            return pull(ct)

        g = jax.jit(bwd)
        ms = timeit(lambda i, g=g, inp=inp, ct=ct_arr: g(inp, ks[i % len(ks)], ct),
                    lambda i: (i,))
        eff = 2 * logical_tflops / (ms / 1e3) / 197 * 100
        print(f"  bwd  {name:9s} {ms:7.2f} ms  ({eff:5.1f}%)", flush=True)


if __name__ == "__main__":
    print("exactness (CPU-sized):")
    check_exact()
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [(16, 512, 512, 32, 64),
              (16, 512, 512, 64, 64),
              (16, 256, 256, 64, 128),
              (16, 256, 256, 128, 128)]
    if len(sys.argv) > 1:  # e.g. "16,512,512,64,32 16,512,512,32,32"
        shapes = [tuple(int(v) for v in s.split(",")) for s in sys.argv[1:]]
    for shape in shapes:
        bench_shape(*shape)

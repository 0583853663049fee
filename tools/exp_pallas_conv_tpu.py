"""Native TPU timing: Pallas folded halo conv vs the dense folded conv.

Methodology (tools/exp_time_probe.py): independent dispatches return in
~0.04 ms regardless of work on the axon backend — block_until_ready does
not reflect device completion for un-consumed outputs — so every timing
here runs N iterations CHAINED inside one jit via lax.fori_loop (the
kernel weight is scaled by a scalar read from the previous output, which
serializes iterations at negligible cost) and reports wall/N.

Usage: python tools/exp_pallas_conv_tpu.py [B,H,W,Ci,Co ...]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.folded import _expand_kernel, w2d
from image_segmentation_tpu.ops.pallas_conv import make_folded_conv3x3

F = 4
PEAK_TFLOPS = 197.0
N = 20


def conv_dense_folded(x4, w, b):
    wp = _expand_kernel(w, F)
    y = jax.lax.conv_general_dilated(
        x4, wp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.tile(b, F).astype(y.dtype)


def _chain(x0, y):
    """Next chain input from the FULL conv output (every element consumed,
    so nothing can be dead-code-eliminated or short-circuited)."""
    li, lo = x0.shape[-1], y.shape[-1]
    reps = -(-li // lo)
    yt = jnp.tile(y, (1, 1, 1, reps))[..., :li] if reps > 1 else y[..., :li]
    return x0 + yt * jnp.asarray(1e-3, x0.dtype)


def time_chained_fwd(convfn, x4, k0, bias):
    @jax.jit
    def loop(x0, k0, bias):
        def body(i, x):
            return _chain(x0, convfn(x, k0, bias))
        return jax.lax.fori_loop(0, N, body, x0)

    jax.block_until_ready(loop(x4, k0, bias))  # compile + warm
    t0 = time.perf_counter()
    out = loop(x4 * jnp.asarray(1.001, x4.dtype), k0, bias)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N * 1e3


def time_chained_bwd(convfn, x4, k0, bias, ct):
    def fb(x4_, k_, b_):
        out, pull = jax.vjp(convfn, x4_, k_, b_)
        return pull(ct)

    @jax.jit
    def loop(x0, k0, bias):
        def body(i, x):
            dx, dk, db = fb(x, k0, bias)
            return x0 + dx * jnp.asarray(1e-3, x0.dtype)
        return jax.lax.fori_loop(0, N, body, x0)

    jax.block_until_ready(loop(x4, k0, bias))
    t0 = time.perf_counter()
    out = loop(x4 * jnp.asarray(1.001, x4.dtype), k0, bias)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N * 1e3


def bench_shape(bsz, h, w, ci, co, dtype=jnp.bfloat16):
    rng = np.random.default_rng(time.time_ns() % (1 << 32))
    k0 = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32),
                     dtype=dtype) * jnp.bfloat16(0.2)
    bias = jnp.zeros((co,), jnp.float32)
    x = jnp.asarray(rng.normal(size=(bsz, h, w, ci)).astype(np.float32),
                    dtype=dtype)
    x4 = w2d(x, F)
    logical_tflops = 2 * 9 * ci * co * bsz * h * w / 1e12
    print(f"shape B{bsz} {h}x{w} {ci}->{co} (logical fwd {logical_tflops:.3f} TFLOP)",
          flush=True)

    pconv = make_folded_conv3x3(ci, co, F)
    forms = {"dense": conv_dense_folded, "pallas": pconv}
    for name, f in forms.items():
        try:
            ms = time_chained_fwd(f, x4, k0, bias)
        except Exception as e:
            print(f"  fwd  {name:7s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        eff = logical_tflops / (ms / 1e3) / PEAK_TFLOPS * 100
        print(f"  fwd  {name:7s} {ms:7.2f} ms ({eff:5.1f}% of logical peak)", flush=True)

    ct = jnp.asarray(rng.normal(size=(bsz, h, w // F, F * co)).astype(np.float32),
                     dtype=dtype)
    for name, f in forms.items():
        try:
            ms = time_chained_bwd(f, x4, k0, bias, ct)
        except Exception as e:
            print(f"  bwd  {name:7s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        eff = 2 * logical_tflops / (ms / 1e3) / PEAK_TFLOPS * 100
        print(f"  bwd  {name:7s} {ms:7.2f} ms ({eff:5.1f}%)", flush=True)

    yd = conv_dense_folded(x4, k0, bias)
    yp = pconv(x4, k0, bias)
    err = float(jnp.max(jnp.abs(yd.astype(jnp.float32) - yp.astype(jnp.float32))))
    print(f"  max |dense - pallas| = {err:.3e}", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [(16, 512, 512, 32, 64),
              (16, 512, 512, 64, 64),
              (16, 512, 512, 64, 32),
              (16, 512, 512, 32, 32)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in s.split(",")) for s in sys.argv[1:]]
    for shape in shapes:
        bench_shape(*shape)

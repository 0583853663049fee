"""Probe: deep-level BatchNorm reductions — XLA vs Pallas grid accumulation.

Round-3 XProf at the 154.5 headline: the deep (unfolded, C>=256) levels
spend ~13.8 ms/step in convert_reduce fusions around the convs — the BN
batch statistics (S, Q) in the forward and the (sum g, sum g*y)
reductions in the backward — each running ~9x slower than HBM bandwidth
(1.6 ms for a 143 MB pass).  If a Pallas kernel that accumulates the
per-channel sums grid-wide (the same VMEM-resident revisiting pattern as
the folded conv's stats epilogue) runs these at ~bandwidth, the deep
levels get most of that time back without touching XLA's (excellent)
deep convs.

Timing per the PERFORMANCE.md caveat: N iterations chained in ONE jit
(fori_loop threading the tensor, per-iteration perturbation from the
stats so nothing hoists), finished by jax.device_get.

Usage: python tools/exp_bn_stats.py [--iters 50]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _stats_kernel(x_ref, s_ref, q_ref):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    xf = x_ref[0].astype(jnp.float32)
    s_ref[0] = s_ref[0] + jnp.sum(xf, axis=(0, 1))
    q_ref[0] = q_ref[0] + jnp.sum(xf * xf, axis=(0, 1))


def pallas_stats(x, ht):
    b, h, w, c = x.shape
    return pl.pallas_call(
        _stats_kernel,
        grid=(b, h // ht),
        in_specs=[pl.BlockSpec((1, ht, w, c), lambda b, i: (b, i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
            pl.BlockSpec((1, c), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
    )(x)


def xla_stats(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(0, 1, 2)), jnp.sum(xf * xf, axis=(0, 1, 2))


def bench(shape, ht, iters):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    x1 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    def loop(fn, unpack):
        def body(_, x):
            s, q = unpack(fn(x))
            # feed a stats-dependent epsilon back so nothing hoists
            return x + (s[0] * 1e-20 + q[0] * 1e-20).astype(x.dtype)

        def run(x, n):
            x = jax.lax.fori_loop(0, n, body, x)
            # device_get only the (transitively chain-dependent) stats:
            # pulling the full tensor back through the tunnel would
            # dominate the wall clock.
            s, q = unpack(fn(x))
            return s, q

        return jax.jit(run, static_argnums=1)

    results = {}
    for name, fn, unpack in [
        ("xla", xla_stats, lambda r: (r[0], r[1])),
        ("pallas", functools.partial(pallas_stats, ht=ht),
         lambda r: (r[0][0], r[1][0])),
    ]:
        lf = loop(fn, unpack)
        # Warm at the SAME static iter count (a different count would
        # recompile inside the timed call) on a DIFFERENT input (the axon
        # runtime caches byte-identical executions).
        jax.device_get(lf(x1, iters))
        t0 = time.perf_counter()
        jax.device_get(lf(x0, iters))
        dt = (time.perf_counter() - t0) / iters
        gbps = x0.size * 2 / dt / 1e9
        results[name] = dt
        print(f"  {name:7s} {dt*1e3:7.3f} ms/iter  ({gbps:6.0f} GB/s)")
    # value check
    s_x, q_x = xla_stats(x0)
    s_p, q_p = pallas_stats(x0, ht)
    err = float(jnp.max(jnp.abs(s_x - s_p[0]))) + float(
        jnp.max(jnp.abs(q_x - q_p[0]))
    )
    print(f"  max |diff| S+Q: {err:.3e}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    for shape, ht in [
        ((16, 128, 128, 256), 16),  # enc3 @ 512^2 headline
        ((16, 64, 64, 512), 16),    # enc4
        ((16, 32, 32, 1024), 8),    # bottleneck
    ]:
        print(f"shape {shape}:")
        bench(shape, ht, args.iters)


if __name__ == "__main__":
    main()

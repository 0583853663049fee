"""Probe: is fold-2 at the 64x64 level (AE enc3/dec1) a win on silicon?

The AE@256 residue map (PERFORMANCE.md, round 4) shows enc3+dec1 running
as unfolded 64-lane XLA convs at 4.0 ms of the 26.6 ms step.  This probe
times the candidate replacements in isolation before touching the model:

  enc3:  ConvBlockDownsample(64) on (32,64,64,64)
     vs  FoldedConvBlockDownsample(64,64,2) on (32,64,32,128)
  dec1:  ConvBlockUpsample(64) on (32,32,32,64)
     vs  FoldedConvBlockUpsample(64,64,2) on (32,32,32,64) (unfolded in)

Timing: N train-style iterations (value+grad of sum(out*g)) CHAINED in
one jit via lax.fori_loop threading params, finished by device_get —
the only methodology the axon runtime cannot misreport (CLAUDE.md).

Usage: python tools/exp_ae_l2_fold.py [--iters 30]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.models import folded
from image_segmentation_tpu.models.blocks import (
    ConvBlockDownsample, ConvBlockUpsample,
)


def time_block(name, module, x, iters):
    key = jax.random.PRNGKey(0)
    variables = module.init(key, x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    out_shape = jax.eval_shape(
        lambda p: module.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )[0],
        params,
    )
    g = jax.random.normal(jax.random.PRNGKey(1), out_shape.shape, jnp.float32)

    def loss(p, xx):
        out, _ = module.apply(
            {"params": p, "batch_stats": stats}, xx, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) * g)

    grad_fn = jax.grad(loss)

    @jax.jit
    def run_n(p, xx):
        def body(i, carry):
            p = carry
            # fold the iteration into the input so XLA cannot hoist
            xi = xx + (i.astype(xx.dtype) * 1e-6)
            gp = grad_fn(p, xi)
            return jax.tree.map(lambda a, b: a + 1e-6 * b, p, gp)
        return jax.lax.fori_loop(0, iters, body, p)

    p = run_n(params, x)  # compile + warm
    jax.device_get(jax.tree.leaves(p)[0])
    t0 = time.perf_counter()
    p = run_n(p, x)
    jax.device_get(jax.tree.leaves(p)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:55s} {dt*1e3:8.3f} ms/iter")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    b = 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # enc3 candidates: input 64x64 spatial, 64 ch
    x_u = jnp.asarray(rng.normal(size=(b, 64, 64, 64)), dt)
    x_f2 = folded.w2d(x_u, 2)
    time_block(
        "enc3 ConvBlockDownsample(64) unfolded",
        ConvBlockDownsample(64, dtype=dt), x_u, args.iters,
    )
    time_block(
        "enc3 FoldedConvBlockDownsample(64,64,2) pallas_fused",
        folded.FoldedConvBlockDownsample(64, 64, 2, dt, impl="pallas_fused"),
        x_f2, args.iters,
    )

    # dec1 candidates: input 32x32 spatial, 64 ch -> upsample to 64x64
    y_u = jnp.asarray(rng.normal(size=(b, 32, 32, 64)), dt)
    time_block(
        "dec1 ConvBlockUpsample(64) unfolded",
        ConvBlockUpsample(64, dtype=dt), y_u, args.iters,
    )
    time_block(
        "dec1 FoldedConvBlockUpsample(64,64,2) pallas_fused",
        folded.FoldedConvBlockUpsample(64, 64, 2, dt, impl="pallas_fused"),
        y_u, args.iters,
    )


if __name__ == "__main__":
    main()

"""Probe: level-0 conv2 (64->64 @ 512^2) as fold-2 vs fold-4 halo conv.

Motivation (round-3 roofline correction): the halo kernel executes
(f+2)/3 x the logical FLOPs — 2x at f=4 but only 4/3 at f=2 — and at
Ci=Co=64 a fold-2 layout still fills 128 lanes on BOTH operand sides.
If the fold-2 form wins standalone at enc1-conv2 shapes, the level-0
interior (conv2 + pool) could run at fold 2 and cut ~1/3 of the
biggest Pallas kernels' executed FLOPs.

Timing per the PERFORMANCE.md caveat: N iterations chained in ONE jit
(fori_loop threading x AND the kernel through a grad update), finished
by jax.device_get.

Usage: python tools/exp_fold2_conv.py [--iters 30]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--impl", default="pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from image_segmentation_tpu.models import folded

    b, hw, c = args.batch, args.width, args.ch
    logical_gflop = 2 * b * hw * hw * 9 * c * c / 1e9

    for f in (4, 2):
        mod = folded.FoldedConv(c, c, fold=f, impl=args.impl)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.normal(size=(b, hw, hw // f, f * c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        params = mod.init(jax.random.key(0), x)

        def loss_fn(p, x):
            y = mod.apply(p, x)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        @jax.jit
        def chain(p, x):
            def body(_, carry):
                p, x = carry
                _, (dp, dx) = grad_fn(p, x)
                p = jax.tree_util.tree_map(lambda a, g: a - 1e-3 * g, p, dp)
                return p, x - 1e-3 * dx.astype(x.dtype)

            return lax.fori_loop(0, args.iters, body, (p, x))

        out = chain(params, x)  # compile + warm
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        out = chain(params, x)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.iters
        executed = logical_gflop * (f + 2) / 3 * 3  # fwd+dx+wgrad
        print(
            f"fold={f}: {dt*1e3:8.3f} ms/iter (fwd+dx+wgrad)  "
            f"logical {3*logical_gflop:.1f} GFLOP  executed ~{executed:.1f}  "
            f"-> {executed/dt/1e3:.0f} TFLOPS executed"
        )


if __name__ == "__main__":
    main()

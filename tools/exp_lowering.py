"""Probe: where does the warm bench's ~217 s of host-side lowering go?

The round-4 persistent compile cache removed the remote XLA compile from
warm bench runs, leaving a 355 s warm wall of which ~217 s is host-side
jaxpr->MLIR lowering on this 1-core machine (PERFORMANCE.md, compile-cache
section).  This probe splits the headline run_n program's host cost into
trace / lower / compile stages, and cProfiles the lowering to name the hot
functions (Mosaic kernel lowering? jaxpr passes? MLIR printing?).

Usage:
  python tools/exp_lowering.py            # stage timings
  python tools/exp_lowering.py --profile  # + cProfile of the lower() stage
"""
import argparse
import cProfile
import functools
import io
import pstats
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    t00 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from image_segmentation_tpu.engine.train import Trainer

    print(f"imports                {time.perf_counter()-t00:7.1f} s", flush=True)

    t0 = time.perf_counter()
    cfg = bench.make_cfg()
    trainer = Trainer(cfg, make_artifacts=False)
    print(f"trainer init           {time.perf_counter()-t0:7.1f} s", flush=True)

    batch, size = cfg.batch_size, cfg.data.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    )
    masks = jnp.asarray(rng.integers(0, 3, (batch, size, size)).astype(np.uint8))
    key = jax.random.PRNGKey(0)
    step = trainer._train_step

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def run_n(state, images, masks, key, n):
        def body(i, st):
            st2, _loss = step(st, images, masks, jax.random.fold_in(key, i))
            return st2
        return jax.lax.fori_loop(0, n, body, state)

    t0 = time.perf_counter()
    traced = run_n.trace(trainer.state, images, masks, key, args.steps)
    t_trace = time.perf_counter() - t0
    print(f"trace                  {t_trace:7.1f} s", flush=True)
    print(f"  jaxpr eqns (outer): {len(traced.jaxpr.jaxpr.eqns)}", flush=True)

    prof = cProfile.Profile() if args.profile else None
    t0 = time.perf_counter()
    if prof:
        prof.enable()
    lowered = traced.lower()
    if prof:
        prof.disable()
    t_lower = time.perf_counter() - t0
    print(f"lower                  {t_lower:7.1f} s", flush=True)

    if prof:
        s = io.StringIO()
        ps = pstats.Stats(prof, stream=s)
        ps.sort_stats("cumulative").print_stats(45)
        print(s.getvalue(), flush=True)
        s = io.StringIO()
        ps = pstats.Stats(prof, stream=s)
        ps.sort_stats("tottime").print_stats(35)
        print(s.getvalue(), flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile (cache-hit?)   {time.perf_counter()-t0:7.1f} s", flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"  exe size hint: {mem}", flush=True)
    except Exception:
        pass
    print(f"TOTAL                  {time.perf_counter()-t00:7.1f} s", flush=True)


if __name__ == "__main__":
    main()

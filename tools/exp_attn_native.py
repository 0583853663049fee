"""Bisect the native-compile hang of pallas_cross_attention on the axon
remote toolchain.  Each config is compiled in sequence with progress
prints; run under `timeout` and see the last line printed."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import time

import numpy as np
import jax
import jax.numpy as jnp

from image_segmentation_tpu.ops.cross_attention import (
    pallas_cross_attention,
    reference_cross_attention,
)


def probe(b, l, s, d, heads, block_q):
    tag = f"b{b} l{l} s{s} d{d} h{heads} blk{block_q}"
    print(f"{tag}: compiling...", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    t0 = time.perf_counter()
    try:
        out = jax.jit(
            lambda q, k, v: pallas_cross_attention(
                q, k, v, heads, block_q=block_q, interpret=False
            )
        )(q, k, v)
        ref = reference_cross_attention(q, k, v, heads)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{tag}: OK in {time.perf_counter() - t0:.1f}s, err={err:.2e}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    cases = [
        (1, 256, 1, 128, 1, 256),    # smallest
        (1, 256, 1, 512, 1, 256),    # wider d
        (1, 256, 1, 512, 4, 256),    # multi-head
        (2, 1024, 1, 512, 4, 512),   # the failing test's shape
        (1, 4096, 8, 512, 1, 512),   # blockwise test's shape
    ]
    if len(sys.argv) > 1:
        idx = [int(v) for v in sys.argv[1:]]
        cases = [cases[i] for i in idx]
    for c in cases:
        probe(*c)

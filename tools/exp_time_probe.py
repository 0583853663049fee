"""Probe the timing methodology on axon: independent varying-input calls vs
a chained lax.fori_loop inside one jit.  The dense folded conv at
B16 512^2 32->64 must cost >= ~3 ms (0.62 TFLOP at 197 TFLOPS peak);
anything far below is a caching/async artifact."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from image_segmentation_tpu.models.folded import _expand_kernel

F = 4
B, H, W, CI, CO = 16, 512, 512, 32, 64


def conv(x4, w):
    wp = _expand_kernel(w, F)
    return jax.lax.conv_general_dilated(
        x4, wp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


rng = np.random.default_rng(time.time_ns() % (1 << 32))
x4 = jnp.asarray(rng.normal(size=(B, H, W // F, F * CI)).astype(np.float32),
                 dtype=jnp.bfloat16)
ks = [jnp.asarray(rng.normal(size=(3, 3, CI, CO)).astype(np.float32),
                  dtype=jnp.bfloat16) for _ in range(14)]

jc = jax.jit(conv)
# warmup/compile
jax.block_until_ready(jc(x4, ks[0]))

# A: independent calls, varying kernel
t0 = time.perf_counter()
outs = [jc(x4, ks[2 + i]) for i in range(12)]
jax.block_until_ready(outs)
ta = (time.perf_counter() - t0) / 12 * 1e3
print(f"A independent varying-k : {ta:8.3f} ms/iter")

# B: same but device_get each output (forces full round trip)
t0 = time.perf_counter()
for i in range(6):
    np.asarray(jax.device_get(jc(x4, ks[2 + i])[0, 0, 0, :3]))
tb = (time.perf_counter() - t0) / 6 * 1e3
print(f"B independent + get     : {tb:8.3f} ms/iter")

# C: chained fori_loop inside one jit (20 iterations)
N = 20

@jax.jit
def chained(x4, k):
    def body(i, x):
        y = conv(x, k)  # (B,H,Wp,F*CO)
        return y[:, :, :, : F * CI] * jnp.bfloat16(0.01)
    return jax.lax.fori_loop(0, N, body, x4)

jax.block_until_ready(chained(x4, ks[0]))
t0 = time.perf_counter()
jax.block_until_ready(chained(x4, ks[1]))
tc = (time.perf_counter() - t0) / N * 1e3
print(f"C chained fori_loop     : {tc:8.3f} ms/iter (incl. lane-slice chain op)")

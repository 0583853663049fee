"""Row-shift lowering experiments + no-rotation step upper bound."""
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time
import numpy as np
import jax
import jax.numpy as jnp


def row_shift_gather(x, shifts, m):
    """Explicit lax.gather of whole rows with batching dims."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (m, m), (0, 0)))
    starts = (m - shifts)[..., None]  # (n, h, 1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3),
        collapsed_slice_dims=(),
        start_index_map=(2,),
        operand_batching_dims=(0, 1),
        start_indices_batching_dims=(0, 1),
    )
    return jax.lax.gather(
        xp, starts, dnums, slice_sizes=(1, 1, w, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(n, h, w, c)


def timeit_varying(build, n_iter=15):
    outs = None
    fns = [build(i) for i in range(n_iter)]
    jax.block_until_ready(fns[0]())
    t0 = time.perf_counter()
    for f in fns:
        outs = f()
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n_iter


def main():
    rng = np.random.default_rng(0)
    n, h, w, c = 16, 512, 512, 4
    x = jnp.asarray(rng.integers(0, 256, (n, h, w, c), dtype=np.uint8))
    m = 112
    f = jax.jit(lambda key, x: row_shift_gather(
        x, jax.random.randint(key, (n, h), -m, m), m))
    dt = timeit_varying(lambda i: (lambda: f(jax.random.PRNGKey(i), x)))
    print(f"row_shift_gather (u8, c=4): {dt*1e3:6.2f} ms")

    # u32-packed variant: pack 4 u8 channels into one u32 lane
    xu = jax.lax.bitcast_convert_type(x, jnp.uint32)  # (n,h,w)
    f2 = jax.jit(lambda key, x: row_shift_gather(
        x[..., None], jax.random.randint(key, (n, h), -m, m), m))
    dt = timeit_varying(lambda i: (lambda: f2(jax.random.PRNGKey(i), xu)))
    print(f"row_shift_gather (u32 packed): {dt*1e3:6.2f} ms")

    # full shear3 with gather-based row shift
    from image_segmentation_tpu.ops import augment as A
    orig = A._row_shift
    A._row_shift = lambda x, s, mm: row_shift_gather(x, s, mm)
    f3 = jax.jit(lambda key, s: A.random_geometric(key, s, 90.0, "shear3"))
    dt = timeit_varying(lambda i: (lambda: f3(jax.random.PRNGKey(i), x)))
    print(f"shear3 via gather rows: {dt*1e3:6.2f} ms")
    A._row_shift = orig

    # direct 2-D gather standalone for comparison
    f4 = jax.jit(lambda key, s: A.random_geometric(key, s, 90.0, "gather"))
    dt = timeit_varying(lambda i: (lambda: f4(jax.random.PRNGKey(i), x)))
    print(f"direct 2-D gather: {dt*1e3:6.2f} ms")


if __name__ == "__main__":
    main()

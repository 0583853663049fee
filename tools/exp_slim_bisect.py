"""Bisect which folded-conv slice geometries Mosaic rejects with slim
column-halo shifts (IMGSEG_PALLAS_SLIMSHIFT=1, ops/pallas_conv._build_aug).

The first full-model A/B with slim shifts crashed the remote compile on a
LargeUNet@512 forward kernel even after gating slim to >=64-wide,
64-aligned slices (2026-08-21).  The production kernels use three slim
slice geometries — (offset 192, w 64) at f4/ci64, (offset 128, w 128) at
f2/ci128, (offset 64, w 64) at f2/ci64 — this probe natively compiles
fwd+grad of a block per geometry (plus the gate-excluded f4/ci32 control
and the dual-input concat-perm form) and prints OK/FAIL each, so the
gate can be tightened to exactly what the toolchain accepts.

Usage: IMGSEG_PALLAS_SLIMSHIFT=1 python tools/exp_slim_bisect.py
"""
import sys
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.models import folded


def try_block(name, module, *args):
    key = jax.random.PRNGKey(0)
    try:
        variables = module.init(key, *args, train=False)

        def loss(p, *a):
            out = module.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                *a, train=True, mutable=["batch_stats"],
            )[0]
            if isinstance(out, tuple):  # raw_out path returns (y, ab)
                out = out[0]
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))(variables["params"], *args)
        jax.block_until_ready(g)
        print(f"{name:50s} OK", flush=True)
    except Exception as e:  # noqa: BLE001 - bisect probe
        msg = str(e).split("\n")[0][:110]
        print(f"{name:50s} FAIL {type(e).__name__}: {msg}", flush=True)
        if "--trace" in sys.argv:
            traceback.print_exc()


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def arr(shape):
        return jnp.asarray(rng.normal(size=shape), dt)

    b = 2
    try_block(
        "f4 ci64 (slim offs 192/0, w 64) wp128",
        folded.FoldedConvBlock(64, 64, 4, dt, impl="pallas_fused"),
        arr((b, 64, 128, 256)),
    )
    try_block(
        "f2 ci128 (slim offs 128/0, w 128) wp128",
        folded.FoldedConvBlock(128, 128, 2, dt, impl="pallas_fused"),
        arr((b, 64, 128, 256)),
    )
    try_block(
        "f2 ci64 (slim offs 64/0, w 64) wp128",
        folded.FoldedConvBlock(64, 64, 2, dt, impl="pallas_fused"),
        arr((b, 64, 128, 128)),
    )
    try_block(
        "f4 ci32 control (gate-excluded, full shifts)",
        folded.FoldedConvBlock(32, 32, 4, dt, impl="pallas_fused"),
        arr((b, 64, 128, 128)),
    )
    # dual-input [up | skip] VMEM concat (decoder blocks): the halo runs
    # address the concat-perm layout.
    perm = folded.concat_perm(16, 16, 4)
    try_block(
        "dual f4 ci32+32 concat-perm (test shape)",
        folded.FoldedConvBlock(
            32, 16, dtype=jnp.float32, in_perm=perm, impl="pallas_fused"
        ),
        arr((b, 64, 16, 64)).astype(jnp.float32),
        arr((b, 64, 16, 64)).astype(jnp.float32),
    )
    perm2 = folded.concat_perm(64, 64, 4)
    try_block(
        "dual f4 ci64+64 concat-perm wp128",
        folded.FoldedConvBlock(
            128, 64, 4, dt, in_perm=perm2, impl="pallas_fused"
        ),
        arr((b, 64, 128, 256)),
        arr((b, 64, 128, 256)),
    )


if __name__ == "__main__":
    main()

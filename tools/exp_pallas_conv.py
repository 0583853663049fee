"""Scratch driver for ops/pallas_conv.py: interpret-mode equivalence, then
(with IMGSEG_REAL_TPU=1) native compile + timing on the real chip."""
import os
import sys

REAL = os.environ.get("IMGSEG_REAL_TPU", "0") == "1"
if not REAL:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from image_segmentation_tpu.models.folded import w2d, d2w, concat_perm
from image_segmentation_tpu.ops.pallas_conv import make_folded_conv3x3


def ref_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


def check(bsz, h, w, ci, co, fold, in_perm=None, dtype=jnp.float32, tol=2e-5):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (bsz, h, w, ci), dtype)
    kern = jax.random.normal(k2, (3, 3, ci, co), dtype) * 0.2
    bias = jax.random.normal(k3, (co,), dtype) * 0.1

    x4 = w2d(x, fold)
    if in_perm is not None:
        # actual[j] = canonical[perm[j]]  (perm[actual_lane] = canonical idx)
        pa = np.asarray(in_perm)
        x4 = x4[..., pa]

    conv = make_folded_conv3x3(
        ci, co, fold, in_perm=tuple(in_perm) if in_perm is not None else None,
        interpret=not REAL,
    )

    y4 = conv(x4, kern, bias)
    y = d2w(y4, co, fold)
    y_ref = ref_conv(x, kern, bias)
    err = float(jnp.max(jnp.abs(y - y_ref)))
    scale = float(jnp.max(jnp.abs(y_ref))) + 1e-9

    # grads
    g = jax.random.normal(k4, y4.shape, dtype)

    def loss_p(x4_, k_, b_):
        return jnp.sum(conv(x4_, k_, b_) * g)

    def loss_r(x_, k_, b_):
        gu = d2w(g, co, fold)
        return jnp.sum(ref_conv(x_, k_, b_) * gu.astype(jnp.float32))

    dx4, dk, db = jax.grad(loss_p, argnums=(0, 1, 2))(x4, kern, bias)
    dxr, dkr, dbr = jax.grad(loss_r, argnums=(0, 1, 2))(x, kern, bias)
    dxr4 = w2d(dxr, fold)
    if in_perm is not None:
        dxr4 = dxr4[..., pa]
    edx = float(jnp.max(jnp.abs(dx4 - dxr4)))
    edk = float(jnp.max(jnp.abs(dk - dkr)))
    edb = float(jnp.max(jnp.abs(db - dbr)))
    ok = max(err, edx, edk, edb) / scale < tol
    print(
        f"B{bsz} {h}x{w} {ci}->{co} f{fold} perm={in_perm is not None}: "
        f"fwd {err:.2e} dx {edx:.2e} dk {edk:.2e} db {edb:.2e} "
        f"(scale {scale:.1f}) {'OK' if ok else 'FAIL'}"
    )
    return ok


if __name__ == "__main__":
    oks = []
    oks.append(check(2, 16, 32, 32, 32, 4))
    oks.append(check(1, 8, 16, 8, 16, 4))
    oks.append(check(2, 16, 32, 16, 8, 4, in_perm=concat_perm(8, 8, 4)))
    oks.append(check(1, 32, 32, 4, 4, 2))
    oks.append(check(1, 64, 32, 8, 8, 4))  # n_h > 1: exercises halo-row DMAs
    print("ALL OK" if all(oks) else "FAILURES")

"""Scratch check: make_folded_conv_bn3x3 (pre/stats fusions) vs a pure-JAX
reference, values + all gradients, interpret mode on CPU."""
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
from image_segmentation_tpu.ops.pallas_conv import make_folded_conv_bn3x3

jax.config.update("jax_default_matmul_precision", "highest")


def ref_fused(x, k, bias, a, b, pre, stats):
    inp = jnp.maximum(x * a + b, 0.0) if pre else x
    y = jax.lax.conv_general_dilated(
        inp, k, (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    if not stats:
        return y, None, None
    return y, jnp.sum(y, axis=(0, 1, 2)), jnp.sum(y * y, axis=(0, 1, 2))


def check(bsz, h, w, ci, co, fold, pre, stats, in_perm=None):
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (bsz, h, w, ci), jnp.float32)
    kern = jax.random.normal(ks[1], (3, 3, ci, co), jnp.float32) * 0.2
    bias = jax.random.normal(ks[2], (co,), jnp.float32) * 0.1
    a = jax.random.normal(ks[3], (ci,), jnp.float32) * 0.5 + 1.0
    b = jax.random.normal(ks[4], (ci,), jnp.float32) * 0.3
    gy = jax.random.normal(ks[5], (bsz, h, w // fold, fold * co), jnp.float32)
    g1 = jax.random.normal(ks[6], (co,), jnp.float32)
    g2 = jax.random.normal(ks[7], (co,), jnp.float32)

    x4 = w2d(x, fold)
    pa = np.asarray(in_perm) if in_perm is not None else None
    if pa is not None:
        x4 = x4[..., pa]

    conv = make_folded_conv_bn3x3(
        ci, co, fold,
        in_perm=tuple(in_perm) if in_perm is not None else None,
        pre=pre, stats=stats, interpret=not REAL,
    )

    def loss_p(x4_, k_, bias_, a_=None, b_=None):
        args = (x4_, k_, bias_) + ((a_, b_) if pre else ())
        out = conv(*args)
        if stats:
            y, s1, s2 = out
            return jnp.sum(y * gy) + jnp.sum(s1 * g1) + jnp.sum(s2 * g2)
        return jnp.sum(out * gy)

    def loss_r(x_, k_, bias_, a_, b_):
        y, s1, s2 = ref_fused(x_, k_, bias_, a_, b_, pre, stats)
        gyu = d2w(gy, co, fold)
        v = jnp.sum(y * gyu)
        if stats:
            v = v + jnp.sum(s1 * g1) + jnp.sum(s2 * g2)
        return v

    # values
    args_p = (x4, kern, bias) + ((a, b) if pre else ())
    out = conv(*args_p)
    y_p = out[0] if stats else out
    y_r, s1_r, s2_r = ref_fused(x, kern, bias, a, b, pre, stats)
    errs = {"y": float(jnp.max(jnp.abs(d2w(y_p, co, fold) - y_r)))}
    if stats:
        errs["s1"] = float(jnp.max(jnp.abs(out[1] - s1_r)))
        errs["s2"] = float(jnp.max(jnp.abs(out[2] - s2_r)))

    gp = jax.grad(loss_p, argnums=tuple(range(3 + (2 if pre else 0))))(*args_p)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, kern, bias, a, b)
    dxr4 = w2d(gr[0], fold)
    if pa is not None:
        dxr4 = dxr4[..., pa]
    errs["dx"] = float(jnp.max(jnp.abs(gp[0] - dxr4)))
    errs["dk"] = float(jnp.max(jnp.abs(gp[1] - gr[1])))
    errs["db"] = float(jnp.max(jnp.abs(gp[2] - gr[2])))
    if pre:
        errs["da"] = float(jnp.max(jnp.abs(gp[3] - gr[3])))
        errs["dbp"] = float(jnp.max(jnp.abs(gp[4] - gr[4])))

    scale = float(jnp.max(jnp.abs(y_r))) + abs(float(jnp.max(jnp.abs(s2_r)))) ** 0.5 if stats else float(jnp.max(jnp.abs(y_r)))
    worst = max(errs.values())
    ok = worst / (abs(scale) + 1.0) < 5e-5
    print(
        f"B{bsz} {h}x{w} {ci}->{co} f{fold} pre={pre} stats={stats} "
        f"perm={in_perm is not None}: "
        + " ".join(f"{k}={v:.2e}" for k, v in errs.items())
        + f" {'OK' if ok else 'FAIL'}"
    )
    return ok


if __name__ == "__main__":
    oks = []
    oks.append(check(2, 16, 32, 8, 16, 4, pre=False, stats=True))
    oks.append(check(2, 16, 32, 8, 16, 4, pre=True, stats=True))
    oks.append(check(2, 16, 32, 8, 16, 4, pre=True, stats=False))
    oks.append(check(1, 64, 32, 8, 8, 4, pre=True, stats=True))
    oks.append(check(2, 16, 32, 16, 8, 4, pre=True, stats=True,
                     in_perm=concat_perm(8, 8, 4)))
    print("ALL OK" if all(oks) else "FAILURES")

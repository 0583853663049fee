"""Pallas folded halo conv (ops/pallas_conv.py): exact equivalence with
``lax.conv_general_dilated`` on the unfolded tensor — forward and all three
gradients — plus FoldedConv(impl="pallas") equivalence under a shared
parameter tree.

Runs in interpret mode on the CPU mesh; the native-compile counterpart is
tests/test_real_tpu_kernels.py::test_folded_conv_native.

Reference parity: computes the reference ConvBlock's 3x3 SAME conv
(models/processing_blocks.py:15-35) on the width-folded layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models import folded
from image_segmentation_tpu.models.folded import concat_perm, d2w, w2d
from image_segmentation_tpu.ops.pallas_conv import make_folded_conv3x3

jax.config.update("jax_default_matmul_precision", "highest")
KEY = jax.random.PRNGKey(7)


def ref_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


@pytest.mark.parametrize(
    "bsz,h,w,ci,co,fold,perm",
    [
        (2, 16, 32, 8, 16, 4, False),
        (1, 64, 32, 8, 8, 4, False),   # multi-h-tile: halo rows cross tiles
        (2, 16, 32, 16, 8, 4, True),   # decoder concat layout
        (1, 32, 32, 4, 4, 2, False),
    ],
)
def test_matches_lax_conv(bsz, h, w, ci, co, fold, perm):
    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    x = jax.random.normal(k1, (bsz, h, w, ci), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, ci, co), jnp.float32) * 0.2
    bias = jax.random.normal(k3, (co,), jnp.float32) * 0.1

    in_perm = concat_perm(ci // 2, ci - ci // 2, fold) if perm else None
    x4 = w2d(x, fold)
    if in_perm is not None:
        # actual[j] = canonical[perm[j]]
        x4 = x4[..., np.asarray(in_perm)]

    conv = make_folded_conv3x3(ci, co, fold, in_perm=in_perm, interpret=True)
    y = d2w(conv(x4, kern, bias), co, fold)
    ref = ref_conv(x, kern, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # gradients vs the lax formulation
    g = jax.random.normal(k4, (bsz, h, w // fold, fold * co), jnp.float32)

    dx4, dk, db = jax.grad(
        lambda x4_, k_, b_: jnp.sum(conv(x4_, k_, b_) * g), argnums=(0, 1, 2)
    )(x4, kern, bias)
    dxr, dkr, dbr = jax.grad(
        lambda x_, k_, b_: jnp.sum(ref_conv(x_, k_, b_) * d2w(g, co, fold)),
        argnums=(0, 1, 2),
    )(x, kern, bias)
    dxr4 = w2d(dxr, fold)
    if in_perm is not None:
        dxr4 = dxr4[..., np.asarray(in_perm)]
    np.testing.assert_allclose(np.asarray(dx4), np.asarray(dxr4), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dkr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dbr), rtol=2e-4, atol=2e-4)


def test_folded_conv_module_pallas_impl():
    """FoldedConv(impl='pallas') == FoldedConv(impl='dense') under one tree."""
    x = jax.random.normal(KEY, (2, 16, 16, 8), jnp.float32)
    x4 = w2d(x)
    dense = folded.FoldedConv(8, 16, dtype=jnp.float32, impl="dense")
    variables = dense.init(KEY, x4)
    ref = dense.apply(variables, x4)
    pal = folded.FoldedConv(8, 16, dtype=jnp.float32, impl="pallas")
    out = pal.apply(variables, x4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestFoldedConvBlockFused:
    """FoldedConvBlock(impl='pallas_fused') — stats epilogue + pre-op fusion
    — matches the standard ConvBlock under one parameter tree."""

    def _mk(self, seed=11):
        from image_segmentation_tpu.models.blocks import ConvBlock

        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, (2, 16, 16, 8), jnp.float32)
        std = ConvBlock(16, dtype=jnp.float32)
        variables = std.init(KEY, x, train=False)
        return std, x, variables

    def test_train_values_and_batch_stats(self):
        std, x, variables = self._mk()
        ref, m_std = std.apply(variables, x, train=True, mutable=["batch_stats"])
        fused = folded.FoldedConvBlock(8, 16, dtype=jnp.float32, impl="pallas_fused")
        out4, m_f = fused.apply(
            variables, w2d(x), train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(d2w(out4, 16)), np.asarray(ref), rtol=2e-4, atol=2e-4
        )
        for a, b in zip(
            jax.tree.leaves(m_std["batch_stats"]),
            jax.tree.leaves(m_f["batch_stats"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )

    def test_eval_values(self):
        std, x, variables = self._mk()
        ref = std.apply(variables, x, train=False)
        fused = folded.FoldedConvBlock(8, 16, dtype=jnp.float32, impl="pallas_fused")
        out4 = fused.apply(variables, w2d(x), train=False)
        np.testing.assert_allclose(
            np.asarray(d2w(out4, 16)), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_train_gradients_match_dense_impl(self):
        _, x, variables = self._mk()
        x4 = w2d(x)
        g = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 4, 64), jnp.float32)

        def loss(params, impl):
            m = folded.FoldedConvBlock(8, 16, dtype=jnp.float32, impl=impl)
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x4, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * g)

        gd = jax.grad(lambda p: loss(p, "dense"))(variables["params"])
        gf = jax.grad(lambda p: loss(p, "pallas_fused"))(variables["params"])
        flat_d = jax.tree_util.tree_leaves_with_path(gd)
        flat_f = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(gf)
        )
        for k, vd in flat_d:
            vf = flat_f[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(vd), np.asarray(vf), rtol=5e-4, atol=5e-4,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_bf16_relu_gating_consistent_fwd_bwd(self):
        """In bf16 the whole-block VJP's backward ReLU mask must agree with
        the forward activation's zeros: perturbing the cotangent ONLY at
        out==0 positions must leave every input/param gradient unchanged
        (regression: the backward once used unrounded f32 bn2 scalars while
        the forward rounded them to bf16, leaking gradient at borderline
        activations)."""
        _, x, variables = self._mk()
        x4 = w2d(x).astype(jnp.bfloat16)
        m = folded.FoldedConvBlock(8, 16, dtype=jnp.bfloat16, impl="pallas_fused")

        def fwd(p, xx):
            out, _ = m.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                xx, train=True, mutable=["batch_stats"],
            )
            return out

        out, vjp_fn = jax.vjp(fwd, variables["params"], x4)
        clamped = np.asarray(out == 0)
        assert clamped.any() and (~clamped).any()

        g1 = jax.random.normal(jax.random.PRNGKey(9), out.shape, jnp.bfloat16)
        g2 = jnp.where(jnp.asarray(clamped), g1 + 7.0, g1)
        grads1 = vjp_fn(g1)
        grads2 = vjp_fn(g2)
        for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_merged_bwd_matches_two_kernel_path(self, monkeypatch):
        """IMGSEG_PALLAS_MERGED_BWD=0 (two dx/wgrad kernels) and =1 (one
        fused kernel) must produce identical gradients — the merged kernel
        only changes data movement.  f32 => exact equality is expected, but
        allclose guards against benign reassociation."""
        from image_segmentation_tpu.ops.pallas_conv import make_folded_block

        _, x, variables = self._mk()
        x4 = w2d(x)
        g = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 4, 64), jnp.float32)

        def grads(flag):
            monkeypatch.setenv("IMGSEG_PALLAS_MERGED_BWD", flag)
            make_folded_block.cache_clear()

            def loss(params):
                m = folded.FoldedConvBlock(
                    8, 16, dtype=jnp.float32, impl="pallas_fused"
                )
                out, _ = m.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x4, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(out * g)

            return jax.grad(loss)(variables["params"])

        g_two = grads("0")
        g_one = grads("1")
        # Non-default transposed-cotangent wgrad dots (the orientation is
        # the only change; dkp is un-transposed outside the kernel).
        monkeypatch.setenv("IMGSEG_PALLAS_WGRAD_TG", "1")
        g_tg = grads("1")
        monkeypatch.delenv("IMGSEG_PALLAS_WGRAD_TG")
        make_folded_block.cache_clear()
        for a, b, c in zip(
            jax.tree.leaves(g_two), jax.tree.leaves(g_one),
            jax.tree.leaves(g_tg),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-6, atol=1e-6
            )

    def test_slimshift_matches_full_shift(self, monkeypatch):
        """IMGSEG_PALLAS_SLIMSHIFT=1 (slice the consumed halo lanes before
        the wp shift) must produce identical forward values and gradients
        to the default full-lane shift — the orders commute exactly.  The
        slim gate needs a >=256-lane single-input slab (ci >= 64), so this
        runs a 64-channel fold-4 block, unlike the tiny ci=8 block above
        (where the gate never fires and both flags take the same path)."""
        from image_segmentation_tpu.ops.pallas_conv import make_folded_block

        key = jax.random.PRNGKey(17)
        x4 = jax.random.normal(key, (1, 8, 8, 256), jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(18), (1, 8, 8, 256),
                              jnp.float32)
        m = folded.FoldedConvBlock(64, 64, dtype=jnp.float32,
                                   impl="pallas_fused")
        variables = m.init(KEY, x4, train=False)

        def run(flag):
            monkeypatch.setenv("IMGSEG_PALLAS_SLIMSHIFT", flag)
            make_folded_block.cache_clear()

            def loss(params, xx):
                out, _ = m.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    xx, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(out * g), out

            (val, out), grads = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True
            )(variables["params"], x4)
            return out, grads

        out0, g0 = run("0")
        out1, g1 = run("1")
        make_folded_block.cache_clear()
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )

    def test_input_grad_false_param_grads_unchanged(self):
        """input_grad=False (wgrad-only conv1 backward, no dx kernel) must
        leave every PARAMETER gradient identical to the default path, and
        return exactly zero for the input cotangent — the contract the
        prompt encoder's first block relies on (its input is the raw
        heatmap, a non-differentiated model input)."""
        _, x, variables = self._mk()
        x4 = w2d(x)
        g = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 4, 64), jnp.float32)

        def loss(params, xx, input_grad):
            m = folded.FoldedConvBlock(
                8, 16, dtype=jnp.float32, impl="pallas_fused",
                input_grad=input_grad,
            )
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xx, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * g)

        g_ref, dx_ref = jax.grad(
            lambda p, xx: loss(p, xx, True), argnums=(0, 1)
        )(variables["params"], x4)
        g_ng, dx_ng = jax.grad(
            lambda p, xx: loss(p, xx, False), argnums=(0, 1)
        )(variables["params"], x4)
        assert np.asarray(jnp.abs(dx_ref)).max() > 0
        np.testing.assert_array_equal(np.asarray(dx_ng), 0.0)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ng)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )

    def test_train_values_with_concat_perm(self):
        """dec-style block: plain concat layout absorbed via in_perm."""
        key = jax.random.PRNGKey(4)
        x = jax.random.normal(key, (2, 8, 16, 16), jnp.float32)
        from image_segmentation_tpu.models.blocks import ConvBlock

        std = ConvBlock(8, dtype=jnp.float32)
        variables = std.init(KEY, x, train=False)
        ref, _ = std.apply(variables, x, train=True, mutable=["batch_stats"])

        perm = folded.concat_perm(8, 8, 4)
        x4c = w2d(x)[..., np.asarray(perm)]  # actual[j] = canonical[perm[j]]
        fused = folded.FoldedConvBlock(
            16, 8, dtype=jnp.float32, in_perm=perm, impl="pallas_fused"
        )
        out4, _ = fused.apply(
            variables, x4c, train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(d2w(out4, 8)), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_folded_1x1_merged_bwd_matches_autodiff(monkeypatch):
    """IMGSEG_PALLAS_1X1_BWD=1 (one Pallas pass: dx+dk+db) vs the default
    kron-autodiff backward — identical values and gradients.  The merged
    path is OFF by default (silicon A/B loss, see PERFORMANCE.md) but must
    stay correct as an A/B hook."""
    from image_segmentation_tpu.models import folded
    from image_segmentation_tpu.ops.pallas_conv import make_folded_1x1

    x4 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 32), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4, 48), jnp.float32)

    def run(flag):
        monkeypatch.setenv("IMGSEG_PALLAS_1X1_BWD", flag)
        make_folded_1x1.cache_clear()
        m = folded.Folded1x1(8, 12, fold=4, dtype=jnp.float32)
        v = m.init(KEY, x4)
        y = m.apply(v, x4)
        gp, gx = jax.grad(
            lambda p, xx: jnp.sum(m.apply(p, xx) * g), argnums=(0, 1)
        )(v, x4)
        return y, gp, gx

    y0, gp0, gx0 = run("0")
    y1, gp1, gx1 = run("1")
    make_folded_1x1.cache_clear()
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_fused_factory_cold_cache_inside_jit_no_leak():
    """The lru_cached factory's first call may happen INSIDE a jit trace
    (the Evaluator jits one function per sweep point); constants it closes
    over must not be trace-bound or the SECOND jit raises
    UnexpectedTracerError."""
    from image_segmentation_tpu.ops.pallas_conv import make_folded_conv_bn3x3

    ci, co, f = 12, 8, 4  # unique config -> cold factory cache
    x4 = jax.random.normal(KEY, (1, 8, 8, f * ci), jnp.float32)
    kern = jax.random.normal(KEY, (3, 3, ci, co), jnp.float32)
    bias = jnp.zeros((co,))
    a = jnp.ones((ci,))
    b = jnp.zeros((ci,))

    def call(x4_, k_, b_):
        conv = make_folded_conv_bn3x3(
            ci, co, f, pre=True, stats=True, interpret=True
        )
        return conv(x4_, k_, b_, a, b)[0]

    y1 = jax.jit(call)(x4, kern, bias)
    y2 = jax.jit(lambda *t: call(*t) * 1.0)(x4, kern, bias)  # second trace
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6, atol=1e-6)


class TestFoldedPoolPallas:
    """make_folded_pool (Pallas fwd/bwd) vs the jnp folded_max_pool_2x2 —
    values AND the routed gradient, incl. through a full Downsample block."""

    def test_values_and_grad_match_jnp_pool(self):
        from image_segmentation_tpu.ops.pallas_conv import make_folded_pool

        c, f = 16, 4
        z = jax.random.normal(KEY, (2, 16, 8, f * c), jnp.float32)
        dp = jax.random.normal(
            jax.random.PRNGKey(3), (2, 8, 8, (f // 2) * c), jnp.float32
        )
        pool = make_folded_pool(c, f, interpret=True)
        ref = folded.folded_max_pool_2x2(z, c, f)
        np.testing.assert_allclose(
            np.asarray(pool(z)), np.asarray(ref), rtol=1e-6, atol=1e-6
        )
        gp = jax.grad(lambda t: jnp.sum(pool(t) * dp))(z)
        gr = jax.grad(
            lambda t: jnp.sum(folded.folded_max_pool_2x2(t, c, f) * dp)
        )(z)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-6, atol=1e-6
        )

    def test_downsample_fused_matches_dense_impl(self, monkeypatch):
        # let the Pallas pool run at test-sized widths (the production
        # default gate is wp >= 64 — models/folded._pallas_min_wp)
        monkeypatch.setenv("IMGSEG_PALLAS_MIN_WP", "1")
        from image_segmentation_tpu.models.blocks import ConvBlockDownsample

        x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 8), jnp.float32)
        std = ConvBlockDownsample(16, dtype=jnp.float32)
        variables = std.init(KEY, x, train=False)
        x4 = w2d(x)
        g = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 4, 32), jnp.float32)

        def loss(params, impl):
            m = folded.FoldedConvBlockDownsample(
                8, 16, dtype=jnp.float32, impl=impl
            )
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x4, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * g), out

        (_, od), gd = jax.value_and_grad(
            lambda p: loss(p, "dense"), has_aux=True
        )(variables["params"])
        (_, of), gf = jax.value_and_grad(
            lambda p: loss(p, "pallas_fused"), has_aux=True
        )(variables["params"])
        np.testing.assert_allclose(
            np.asarray(of), np.asarray(od), rtol=2e-4, atol=2e-4
        )
        flat_f = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(gf)
        )
        for k, vd in jax.tree_util.tree_leaves_with_path(gd):
            np.testing.assert_allclose(
                np.asarray(vd),
                np.asarray(flat_f[jax.tree_util.keystr(k)]),
                rtol=5e-4, atol=5e-4, err_msg=jax.tree_util.keystr(k),
            )


class TestFoldedConvTransposePallas:
    """make_folded_convtranspose2x2 (Pallas fwd/bwd) vs the einsum-path
    FoldedConvTranspose2x2 — values and all three gradients — plus the full
    FoldedConvBlockUpsampleSkip block dense-vs-pallas_fused."""

    def test_values_and_grads_match_einsum_path(self):
        from image_segmentation_tpu.ops.pallas_conv import (
            make_folded_convtranspose2x2,
        )

        f, ci, co = 4, 12, 8
        m = f // 2
        b, hin, win = 2, 8, 16
        x = jax.random.normal(KEY, (b, hin, win, ci), jnp.float32)
        mod = folded.FoldedConvTranspose2x2(ci, co, f, jnp.float32)
        variables = mod.init(KEY, x)
        kernel = variables["params"]["kernel"]
        bias = variables["params"]["bias"]
        ref = mod.apply(variables, x)
        ct = make_folded_convtranspose2x2(ci, co, f, interpret=True)
        xf = x.reshape(b, hin, win // m, m * ci)
        np.testing.assert_allclose(
            np.asarray(ct(xf, kernel, bias)), np.asarray(ref),
            rtol=1e-5, atol=1e-5,
        )
        g = jax.random.normal(jax.random.PRNGKey(1), ref.shape, jnp.float32)
        gr = jax.grad(
            lambda k, bb, xx: jnp.sum(
                mod.apply({"params": {"kernel": k, "bias": bb}}, xx) * g
            ),
            argnums=(0, 1, 2),
        )(kernel, bias, x)
        gc = jax.grad(
            lambda k, bb, xx: jnp.sum(
                ct(xx.reshape(b, hin, win // m, m * ci), k, bb) * g
            ),
            argnums=(0, 1, 2),
        )(kernel, bias, x)
        for name, a, c in zip(("dk", "db", "dx"), gr, gc):
            np.testing.assert_allclose(
                np.asarray(c.reshape(a.shape)), np.asarray(a),
                rtol=1e-4, atol=1e-4, err_msg=name,
            )

    def test_upsample_skip_fused_matches_dense_impl(self, monkeypatch):
        monkeypatch.setenv("IMGSEG_PALLAS_MIN_WP", "1")
        f, ci, co = 4, 16, 8
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 16, ci), jnp.float32)
        skip4 = jax.random.normal(
            jax.random.PRNGKey(6), (2, 16, 8, f * co), jnp.float32
        )
        g = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 8, f * co), jnp.float32)
        init = folded.FoldedConvBlockUpsampleSkip(
            ci, co, f, jnp.float32, impl="dense"
        ).init(KEY, x, skip4, train=False)

        def loss(params, impl):
            m = folded.FoldedConvBlockUpsampleSkip(
                ci, co, f, jnp.float32, impl=impl
            )
            out, _ = m.apply(
                {"params": params, "batch_stats": init["batch_stats"]},
                x, skip4, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * g), out

        (_, od), gd = jax.value_and_grad(
            lambda p: loss(p, "dense"), has_aux=True
        )(init["params"])
        (_, of), gf = jax.value_and_grad(
            lambda p: loss(p, "pallas_fused"), has_aux=True
        )(init["params"])
        np.testing.assert_allclose(
            np.asarray(of), np.asarray(od), rtol=2e-4, atol=2e-4
        )
        flat_f = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(gf)
        )
        for k, vd in jax.tree_util.tree_leaves_with_path(gd):
            np.testing.assert_allclose(
                np.asarray(vd),
                np.asarray(flat_f[jax.tree_util.keystr(k)]),
                rtol=5e-4, atol=5e-4, err_msg=jax.tree_util.keystr(k),
            )


class TestRawBlockOut:
    """IMGSEG_RAW_BLOCK_OUT: the encoder block returns its second conv RAW
    plus the resolved bn2 affine, and the Pallas pool computes
    relu(y*a + b) on its own VMEM read (make_folded_pool with_ab) — the
    activated full-resolution tensor never exists in HBM.  Equivalence
    incl. ALL gradients (the affine cotangent flows back into the block's
    custom VJP as mean2/var2 cotangents) vs both the eager fused path and
    the dense impl, under the shared parameter tree."""

    def _losses(self, raw, monkeypatch):
        monkeypatch.setenv("IMGSEG_PALLAS_MIN_WP", "1")
        monkeypatch.setenv("IMGSEG_RAW_BLOCK_OUT", "1" if raw else "0")
        from image_segmentation_tpu.models.blocks import ConvBlockDownsample

        x = jax.random.normal(
            jax.random.PRNGKey(7), (2, 16, 16, 8), jnp.float32
        )
        std = ConvBlockDownsample(16, dtype=jnp.float32)
        variables = std.init(KEY, x, train=False)
        x4 = w2d(x)
        g = jax.random.normal(
            jax.random.PRNGKey(8), (2, 8, 4, 32), jnp.float32
        )
        m = folded.FoldedConvBlockDownsample(
            8, 16, dtype=jnp.float32, impl="pallas_fused"
        )

        def loss(params):
            out, upd = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x4, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * g), (out, upd)

        (_, (out, upd)), grads = jax.value_and_grad(loss, has_aux=True)(
            variables["params"]
        )
        ev = m.apply(variables, x4, train=False)
        return out, upd, grads, ev

    def test_matches_eager_fused_path(self, monkeypatch):
        o0, u0, g0, e0 = self._losses(False, monkeypatch)
        o1, u1, g1, e1 = self._losses(True, monkeypatch)
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o0), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(e1), np.asarray(e0), rtol=1e-5, atol=1e-5
        )
        for a, b in zip(jax.tree.leaves(u0), jax.tree.leaves(u1)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5
            )
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5,
                err_msg=jax.tree_util.keystr(kp),
            )

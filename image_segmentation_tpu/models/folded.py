"""Width-to-depth ("w2d") folded convolution blocks.

Small-channel convolutions at high resolution are the throughput bottleneck
on TPU: a 3x3 C=32 conv at 512^2 runs at ~4% of bf16 peak because (a) 32
channels underfill the 128-wide MXU and (b) XLA lane-pads NHWC buffers
32 -> 128 lanes (4x HBM traffic).  Folding the WIDTH axis by F=4 into the
channel axis makes every level-0 tensor 128-channel:

    x4[b, h, J, (t, c)] = x[b, h, 4J + t, c]             (a free reshape)

A 3x3 conv becomes an EXACT (3, 3) conv over folded channels with a
block-sparse expanded kernel W'[a, b', (qx, ci), (px, co)] = w[a, dj, ci, co]
where dj = 4(b'-1) + qx - px when |dj| <= 1 (else zero) — 4x the dense
FLOPs, but measured 2.3x faster on the dominant blocks (14 -> 6 ms per
level-0 ConvBlock pair, v5e, batch 16 @ 512^2) because the MXU-efficiency
and traffic wins dominate.

Every module declares the SAME parameter tree as its unfolded counterpart
(nn.Conv / nn.ConvTranspose / nn.BatchNorm), so folded and standard models
share checkpoints; numerical equivalence is asserted in
tests/test_folded.py.  BatchNorm reduces over the fold axis via a 5-D view
(identical statistics); 2x2 max-pool becomes a fold-slot max + regroup.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import BN_EPS, BN_MOMENTUM

FOLD = 4  # 4 * 32 channels == the 128-lane register width


def _pallas_min_wp(kind: str = "") -> int:
    """Folded-width threshold below which the Pallas pool / ConvTranspose
    kernels fall back to XLA.  Round-2 measured both together as a LOSS at
    wp=64 (412 -> 380 img/s) and gated them at 128; after the whole-block
    custom VJP rework the round-3 A/B (ClipUnet@256 batch 32, each gate
    individually) flipped: pool 429.8 -> 480.0, ConvTranspose -> 446.5,
    both -> 504.4 img/s, so the default is now 64.  Env-overridable
    globally (``IMGSEG_PALLAS_MIN_WP`` — the CPU suite sets 1 to exercise
    kernels at tiny shapes) and per-kernel (``..._POOL`` / ``..._CT``)."""
    import os

    base = os.environ.get("IMGSEG_PALLAS_MIN_WP", "64")
    if kind:
        return int(os.environ.get(f"IMGSEG_PALLAS_MIN_WP_{kind}", base))
    return int(base)


def w2d(x: jax.Array, f: int = FOLD) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/f, f*C); slot-major channel layout (t, c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // f, f * c)


def d2w(x: jax.Array, c: int, f: int = FOLD) -> jax.Array:
    b, h, wp, fc = x.shape
    return x.reshape(b, h, wp * f, c)


def refold(x4: jax.Array, c: int, f_from: int, f_to: int) -> jax.Array:
    """Change the fold factor (a relayout; used only off the default path)."""
    if f_from == f_to:
        return x4
    return w2d(d2w(x4, c, f_from), f_to)


def _expand_kernel(w: jax.Array, f: int) -> jax.Array:
    """(kh, 3, Ci, Co) -> (kh, 3, f*Ci, f*Co) folded 3x3 kernel."""
    kh, kw, ci, co = w.shape
    assert kw == 3, "w2d expansion is derived for 3x3 kernels"
    t = np.zeros((3, f, f, 3), np.float32)  # b', qx, px, dj+1
    for bb in range(3):
        for qx in range(f):
            for px in range(f):
                dj = f * (bb - 1) + qx - px
                if -1 <= dj <= 1:
                    t[bb, qx, px, dj + 1] = 1.0
    tj = jnp.asarray(t, w.dtype)
    wp = jnp.einsum("bqpD,aDio->abqipo", tj, w)
    return wp.reshape(kh, 3, f * ci, f * co)


def _halo_kernel(w: jax.Array, f: int) -> jax.Array:
    """(kh, 3, Ci, Co) -> (kh, 1, (f+2)*Ci, f*Co) kernel over a haloed input.

    With the input augmented per block by one column of halo on each side
    (slot t = original column f*J + t - 1), the folded 3x3 conv is a width-1
    conv: K'[dy, 0, (t, ci), (qx, co)] = w[dy, t-qx, ci, co] for t-qx in
    {0, 1, 2}.  Dense FLOPs = 3*(f+2)/(9/f)... = (f+2)/3 x logical — 2x for
    f=4 vs the 4x of :func:`_expand_kernel`.
    """
    kh, kw, ci, co = w.shape
    assert kw == 3
    sel = np.zeros((f + 2, f, 3), np.float32)  # t, qx, dj+1
    for qx in range(f):
        for dj in (-1, 0, 1):
            sel[qx + dj + 1, qx, dj + 1] = 1.0
    selj = jnp.asarray(sel, w.dtype)
    kp = jnp.einsum("tqD,aDio->atiqo", selj, w)  # (kh, f+2, ci, f, co)
    return kp.reshape(kh, 1, (f + 2) * ci, f * co)


def _halo(x4: jax.Array, ci: int, f: int, inv_perm=None) -> jax.Array:
    """(B, H, Wp, f*Ci) -> (B, H, Wp, (f+2)*Ci): columns [fJ-1 .. fJ+f]
    per block (zero-padded at the image edges, matching SAME padding).

    ``inv_perm`` (canonical slot-major index -> actual channel) lets the
    halo columns (canonical slot f-1 of the previous block, slot 0 of the
    next) be gathered from a non-canonical input layout; the halo slots of
    the result are always in canonical ci order, while the middle f*Ci
    channels stay in the actual layout (the kernel permutation handles it).
    """
    b, h, wp, _ = x4.shape
    if inv_perm is None:
        x5 = x4.reshape(b, h, wp, f, ci)
        last, first = x5[:, :, :, f - 1], x5[:, :, :, 0]
    else:
        inv = np.asarray(inv_perm, np.int32)
        last = x4[..., inv[(f - 1) * ci + np.arange(ci)]]
        first = x4[..., inv[np.arange(ci)]]
    z = jnp.zeros((b, h, 1, ci), x4.dtype)
    prev_last = jnp.concatenate([z, last[:, :, :-1]], axis=2)
    next_first = jnp.concatenate([first[:, :, 1:], z], axis=2)
    return jnp.concatenate([prev_last, x4, next_first], axis=-1)


class FoldedConv(nn.Module):
    """3x3 SAME conv on a folded tensor; param tree identical to nn.Conv.

    ``impl``: "dense" expands to a width-3 folded kernel (f x logical
    FLOPs) with no extra buffers; "halo" materializes a 2-column halo per
    block and contracts a width-1 kernel ((f+2)/3 x logical FLOPs — 2x at
    f=4); "pallas" runs the fused halo kernel (ops/pallas_conv.py) that
    builds the halo in VMEM — (f+2)/3 x logical FLOPs with zero extra HBM
    traffic.  All exact.  Measured on v5e (tools/exp_conv_forms.py,
    B16 512^2 32->64): dense 7.1 ms fwd vs halo 12.4 ms — the XLA halo
    materialization (strided sublane copies + a 192->256 lane-padded
    buffer) costs more than the FLOPs it saves, so "dense" is the XLA
    default; see tools/exp_pallas_conv_tpu.py for the Pallas numbers.
    """

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16
    impl: str = "dense"
    # Optional input-channel permutation absorbed into the expanded kernel:
    # in_perm[actual_channel] = canonical slot-major index (t*Ci + ci).
    # Lets callers feed non-canonical layouts (e.g. a plain block concat
    # [A | B] instead of a per-slot interleave) at ZERO tensor cost — the
    # reindex happens on the (3,3,f*Ci,f*Co) kernel, not the activations.
    in_perm: Any = None
    # Declare the parameters and return them instead of computing (used by
    # the fused FoldedConvBlock path, which runs the conv itself).
    expose_params: bool = False

    @nn.compact
    def __call__(self, x4: jax.Array) -> Any:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.expose_params:
            return kernel, bias
        if self.impl == "pallas":
            from ..ops.pallas_conv import make_folded_conv3x3

            conv = make_folded_conv3x3(
                self.in_features,
                self.features,
                self.fold,
                in_perm=(
                    tuple(int(p) for p in self.in_perm)
                    if self.in_perm is not None
                    else None
                ),
                # Mosaic only exists on TPU; tests on the virtual CPU mesh
                # run the same kernel in interpret mode.
                interpret=jax.default_backend() not in ("tpu", "axon"),
            )
            return conv(x4.astype(self.dtype), kernel, bias)
        if self.impl == "halo":
            ci, f = self.in_features, self.fold
            wp = _halo_kernel(kernel.astype(self.dtype), f)
            if self.in_perm is not None:
                # in_perm covers the f*Ci block channels; the halo slots are
                # gathered into canonical ci order by _halo, so the kernel
                # permutation is identity on them and in_perm (shifted by
                # the leading halo slot) on the middle rows.
                p = np.asarray(self.in_perm, np.int64)
                inv = np.empty_like(p)
                inv[p] = np.arange(p.size)
                full_perm = np.concatenate(
                    [np.arange(ci), ci + p, (f + 1) * ci + np.arange(ci)]
                )
                wp = wp[:, :, full_perm, :]
                inp = _halo(x4.astype(self.dtype), ci, f, inv_perm=inv)
            else:
                inp = _halo(x4.astype(self.dtype), ci, f)
            pad_w = (0, 0)
        else:
            wp = _expand_kernel(kernel.astype(self.dtype), self.fold)
            inp = x4.astype(self.dtype)
            if self.in_perm is not None:
                wp = wp[:, :, np.asarray(self.in_perm, np.int32), :]
            pad_w = (1, 1)
        out = jax.lax.conv_general_dilated(
            inp,
            wp,
            (1, 1),
            padding=((1, 1), pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + jnp.tile(bias.astype(self.dtype), self.fold)


class Folded1x1(nn.Module):
    """1x1 conv on a width-folded tensor as ONE matmul with a
    block-diagonal (kron) weight; param tree identical to
    ``nn.Conv(features, (1, 1))``.

    Replaces the 5-D-view conv (``reshape -> nn.Conv -> reshape``), whose
    XLA lowering materializes two full-size layout copies per direction
    (XProf: ~0.9 ms each at B16 512^2 on the stem/out convs)."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16
    # input lane permutation: actual[j] = canonical[in_perm[j]] (e.g. a
    # block concat of two folded tensors, concat_perm) — absorbed into the
    # weight, zero activation relayout.
    in_perm: Optional[tuple] = None

    @nn.compact
    def __call__(self, x4: jax.Array) -> jax.Array:
        import os

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if (
            self.in_perm is None
            and os.environ.get("IMGSEG_PALLAS_1X1_BWD", "0") == "1"
        ):
            # Identical forward matmul; the BACKWARD runs as one Pallas
            # pass (dx + dk + db) instead of XLA's transpose-heavy
            # autodiff wgrad (ops/pallas_conv.make_folded_1x1).  Default
            # OFF: the silicon A/B LOST (headline 154.5 -> 145.7) — like
            # the round-3 split custom-VJP attempt, XLA overlaps the
            # wgrad transposes in context better than the merged kernel
            # runs; kept as a verified A/B hook for future toolchains.
            from ..ops.pallas_conv import make_folded_1x1

            interp = jax.default_backend() not in ("tpu", "axon")
            f1 = make_folded_1x1(
                self.in_features, self.features, self.fold,
                jnp.dtype(self.dtype).name, interpret=interp,
            )
            return f1(x4.astype(self.dtype), kernel, bias)
        k = kernel[0, 0].astype(self.dtype)
        wbd = jnp.kron(jnp.eye(self.fold, dtype=self.dtype), k)
        if self.in_perm is not None:
            wbd = wbd[np.asarray(self.in_perm, np.int64)]
        return x4.astype(self.dtype) @ wbd + jnp.tile(
            bias, self.fold
        ).astype(self.dtype)


class FoldedBatchNorm(nn.Module):
    """BatchNorm over a width-folded tensor with NO 5-D reshape.

    Parameter/variable tree identical to ``nn.BatchNorm(features)`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``, all ``(features,)``),
    so checkpoints are shared with the standard blocks.

    The 5-D view the previous implementation used
    (``(B,H,Wp,f*C) -> (B,H,Wp,f,C)``) retiles the whole activation (lane
    dim f*C -> C), a physical relayout copy in BOTH directions that XProf
    showed costing multiple ms per block at 512^2.  Instead: reduce the FLAT
    (f*C,) channel axis, fold the resulting length-f*C vectors to (C,) (a
    tiny op), and apply the normalization with ``jnp.tile``-broadcast
    vectors directly on the folded buffer.  Statistics are identical (the
    fold axis is just more reduced elements per logical channel); numerics
    match flax's fast-variance formulation.
    """

    features: int
    fold: int = FOLD
    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Any = jnp.bfloat16
    # apply=False returns the resolved per-channel f32 affine (a, b) with
    # y == x*a + b instead of applying it — the fused conv path folds the
    # affine (+ ReLU) into the next Pallas conv's slab read.
    apply: bool = True

    @nn.compact
    def __call__(self, x4: jax.Array = None, stats=None, raw: bool = False) -> Any:
        """``stats`` (optional): precomputed per-channel f32 (mean, var) —
        e.g. from the fused conv's s1/s2 epilogue — instead of reducing
        ``x4``.  ``raw``: declare the parameters/variables and return
        ``(scale, bias)`` untouched (the whole-block custom-vjp path
        resolves the affine itself); combine with a later ``stats=...``
        call on the same instance to commit the running averages."""
        c, f = self.features, self.fold
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if raw:
            self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
            )
            self.variable(
                "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
            )
            return scale, bias
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean_c, var_c = ra_mean.value, ra_var.value
        else:
            if stats is not None:
                mean_c, var_c = stats
            else:
                xf = x4.astype(jnp.float32)
                m1 = jnp.mean(xf, axis=(0, 1, 2))            # (f*c,)
                m2 = jnp.mean(xf * xf, axis=(0, 1, 2))
                mean_c = m1.reshape(f, c).mean(axis=0)
                mean2_c = m2.reshape(f, c).mean(axis=0)
                var_c = jnp.maximum(0.0, mean2_c - mean_c * mean_c)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean_c
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var_c
                )
        # y = (x - mean) * rsqrt(var+eps) * scale + bias  ==  x*a + b
        a = jax.lax.rsqrt(var_c + self.epsilon) * scale
        b = bias - mean_c * a
        if not self.apply:
            return a, b
        a_f = jnp.tile(a, f).astype(self.dtype)
        b_f = jnp.tile(b, f).astype(self.dtype)
        return x4.astype(self.dtype) * a_f + b_f


class FoldedConvBlock(nn.Module):
    """[FoldedConv -> BN -> ReLU] x2; tree identical to blocks.ConvBlock.

    ``in_perm`` (optional) is absorbed into conv1's expanded kernel (see
    :class:`FoldedConv`)."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16
    in_perm: Any = None
    impl: str = "dense"
    # False: the block input is a non-differentiated model input (raw
    # heatmap/image) — the fused backward skips the conv1 dx kernel
    # (param grads unchanged; dense/XLA impls DCE the dx dot on their own).
    # CONTRACT HAZARD: under impl="pallas_fused" the input cotangent is
    # then SILENTLY ZERO (XLA cannot DCE inside the opaque custom call, so
    # the kernel returns symbolic zeros instead), while the dense/XLA
    # impls still return true input gradients.  Only set False when no
    # caller ever differentiates w.r.t. the block input; anything like
    # input saliency or prompt optimization requires input_grad=True.
    input_grad: bool = True

    @nn.compact
    def __call__(
        self, x4: jax.Array, x4b: jax.Array = None, *, train: bool = False,
        raw_out: bool = False,
    ) -> jax.Array:
        """``x4b`` (optional): the input is the lane concat ``[x4 | x4b]``
        (the decoder's [up | skip]).  The fused impl joins the parts in
        VMEM on every kernel read (the concat buffer never exists in HBM);
        other impls concatenate eagerly.

        ``raw_out`` (fused impl only): return ``(y2_raw, ab)`` instead of
        the activated output — y2_raw the second conv's raw output and ab
        (2, f*C) f32 the resolved bn2 affine (dt-rounded) — for consumers
        that compute ``relu(y2*a + b)`` on their own kernel read (the
        pool's ``with_ab``), so the activated tensor never exists in HBM.
        Gradients through ab flow back into the block as mean2/var2
        cotangents (handled exactly by the block's custom VJP)."""
        f, feats = self.fold, self.features
        if self.impl == "pallas_fused":
            return self._fused_forward(x4, x4b, train, raw_out)
        assert not raw_out, "raw_out requires impl='pallas_fused'"
        if x4b is not None:
            x4 = jnp.concatenate([x4, x4b.astype(x4.dtype)], axis=-1)

        def bn(name, h4):
            return FoldedBatchNorm(
                feats,
                f,
                use_running_average=not train,
                dtype=self.dtype,
                name=name,
            )(h4)

        h = FoldedConv(
            self.in_features, feats, f, self.dtype, impl=self.impl,
            in_perm=self.in_perm, name="conv1",
        )(x4)
        h = nn.relu(bn("bn1", h))
        h = FoldedConv(
            feats, feats, f, self.dtype, impl=self.impl, name="conv2"
        )(h)
        return nn.relu(bn("bn2", h))

    def _fused_forward(
        self, x4: jax.Array, x4b: jax.Array, train: bool,
        raw_out: bool = False,
    ) -> jax.Array:
        """Fused Pallas path (same parameter tree as the standard path):

        conv1 emits its output's batch statistics as a kernel epilogue
        (no reduce pass); bn1-apply + ReLU are folded into conv2's VMEM
        slab read (never materialized); conv2 emits bn2's statistics; the
        final bn2-apply + ReLU is one XLA elementwise that fuses into the
        consumer (pool / output conv).

        Training runs the WHOLE block as one custom-vjp node
        (ops/pallas_conv.make_folded_block) so the BatchNorm backward
        elementwise is computed inside the Pallas kernels' operand reads
        instead of as separate full-tensor XLA passes.
        """
        from ..ops.pallas_conv import make_folded_block, make_folded_conv_bn3x3

        f, feats, cin = self.fold, self.features, self.in_features
        interp = jax.default_backend() not in ("tpu", "axon")
        in_split = None if x4b is None else int(x4.shape[-1])
        perm_t = (
            tuple(int(p) for p in self.in_perm)
            if self.in_perm is not None
            else None
        )
        k1, c1b = FoldedConv(
            cin, feats, f, self.dtype, in_perm=self.in_perm,
            expose_params=True, name="conv1",
        )(x4)
        k2, c2b = FoldedConv(
            feats, feats, f, self.dtype, expose_params=True, name="conv2"
        )(x4)
        bn1 = FoldedBatchNorm(
            feats, f, use_running_average=not train,
            dtype=self.dtype, apply=False, name="bn1",
        )
        bn2 = FoldedBatchNorm(
            feats, f, use_running_average=not train,
            dtype=self.dtype, apply=False, name="bn2",
        )

        x4 = x4.astype(self.dtype)
        if x4b is not None:
            x4b = x4b.astype(self.dtype)
        def _ab_lanes(a2, b2):
            # dt-rounded lane affine, f32 arithmetic — same discipline as
            # the in-block activation, so consumers reproduce it exactly.
            a2l = jnp.tile(a2, f).astype(self.dtype).astype(jnp.float32)
            b2l = jnp.tile(b2, f).astype(self.dtype).astype(jnp.float32)
            return jnp.stack([a2l, b2l])

        if train:
            scale1, bias1 = bn1(raw=True)
            scale2, bias2 = bn2(raw=True)
            block = make_folded_block(
                cin, feats, f, in_perm=perm_t, eps=BN_EPS, interpret=interp,
                in_split=in_split, raw_out=raw_out,
                input_grad=self.input_grad,
            )
            z, mean1, var1, mean2, var2 = block(
                *((x4,) if x4b is None else (x4, x4b)),
                k1, c1b, k2, c2b, scale1, bias1, scale2, bias2,
            )
            # Commit the running averages (the returned affines are unused
            # and dead-code eliminated).
            bn1(stats=(mean1, var1))
            bn2(stats=(mean2, var2))
            if raw_out:
                # Resolve bn2's affine OUTSIDE the custom-vjp node, from
                # its differentiable (mean2, var2) outputs — the same
                # formula as the in-block bn_scalars.
                a2 = jax.lax.rsqrt(var2 + BN_EPS) * scale2
                b2 = bias2 - mean2 * a2
                return z, _ab_lanes(a2, b2)
            return z
        conv1 = make_folded_conv_bn3x3(
            cin, feats, f, in_perm=perm_t, pre=False, stats=False,
            interpret=interp, in_split=in_split,
        )
        y1 = conv1(*((x4,) if x4b is None else (x4, x4b)), k1, c1b)
        a1, b1 = bn1()
        conv2 = make_folded_conv_bn3x3(
            feats, feats, f, pre=True, stats=False, interpret=interp
        )
        y2 = conv2(y1, k2, c2b, a1, b1)
        a2, b2 = bn2()
        if raw_out:
            return y2, _ab_lanes(a2, b2)
        a2f = jnp.tile(a2, f).astype(self.dtype)
        b2f = jnp.tile(b2, f).astype(self.dtype)
        return nn.relu(y2 * a2f + b2f)


def folded_max_pool_2x2(x4: jax.Array, features: int, fold: int = FOLD) -> jax.Array:
    """2x2/2 max-pool on a folded tensor; output folded by ``fold // 2``.

    Width pairs live in ADJACENT fold slots, i.e. channel slices — the max
    is a pure lane operation, and halving the fold factor means the result
    needs no regrouping at all (the previous 6-D regroup was a relayout
    copy).  Output block J holds pooled columns ``(fold//2)*J + u`` in slot
    u — exactly the ``w2d(pooled, fold//2)`` canonical layout.
    """
    b, h, wp, fc = x4.shape
    c, half = features, fold // 2
    cols = [
        jnp.maximum(
            x4[..., (2 * t) * c : (2 * t + 1) * c],
            x4[..., (2 * t + 1) * c : (2 * t + 2) * c],
        )
        for t in range(half)
    ]
    m = cols[0] if half == 1 else jnp.concatenate(cols, axis=-1)
    return jnp.maximum(m[:, 0::2], m[:, 1::2])  # (b, h/2, wp, half*c)


class FoldedConvTranspose2x2(nn.Module):
    """ConvTranspose(k=2, s=2) from an UNFOLDED input straight to a FOLDED
    output; param tree identical to nn.ConvTranspose.  One matmul over a
    reindexed kernel + a folded row interleave — the unfolded small-channel
    tensor never materializes."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16
    impl: str = "dense"
    # x is already the slot-major (B, Hin, Win/m, m*Cin) view (e.g. the
    # fold-2 output of a fold-2 decoder block) — skip the reshape, which
    # on TPU is a physical lane relayout, not a free view.
    in_folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, Hin, Win, Cin) -> folded (B, 2*Hin, 2*Win/f, f*Co)."""
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        f = self.fold
        m = f // 2  # input fold factor: each input col feeds 2 output cols
        cin = self.in_features
        co = self.features
        k = kernel.astype(self.dtype)

        if self.in_folded:
            assert x.shape[-1] == m * cin, (x.shape, m, cin)
            b, hin = x.shape[0], x.shape[1]
            xf = x.astype(self.dtype)
        else:
            b, hin, win, _ = x.shape
            xf = x.astype(self.dtype).reshape(b, hin, win // m, m * cin)
        if self.impl == "pallas_fused" and xf.shape[2] >= _pallas_min_wp("CT"):
            # Pallas kernel: same matmul, but the dy row interleave stays
            # in VMEM instead of XLA's transpose+copy through HBM.
            # (ClipUnet@256 A/B: 429.8 -> 446.5 img/s at wp=64.)
            from ..ops.pallas_conv import make_folded_convtranspose2x2

            interp = jax.default_backend() not in ("tpu", "axon")
            return make_folded_convtranspose2x2(
                cin, co, f, interpret=interp
            )(xf, kernel, bias)
        # flax ConvTranspose(k=2, s=2, VALID) applies the kernel FLIPPED:
        # out[2i+dy, 2j+dx] = in[i, j] * K[1-dy, 1-dx]  (probed empirically).
        k = k[::-1, ::-1]
        # out[2i+dy, f*J + v, o] = sum_c K'[dy, dx, c, o] * x[i, m*J + m', c]
        # with v = 2*m' + dx.  Build K'[(m', c), (dy, v, o)] (block sparse).
        kp = jnp.zeros((m, cin, 2, f, co), self.dtype)
        for mm in range(m):
            for dx in range(2):
                v = 2 * mm + dx
                # K[dy, dx, c, o] -> slot [mm, c, dy, v, o]
                kp = kp.at[mm, :, :, v, :].set(jnp.transpose(k[:, dx], (1, 0, 2)))
        wpm = xf.shape[2]
        e = xf @ kp.reshape(m * cin, 2 * f * co)  # (B, Hin, Win/m, 2*f*Co)
        e = e.reshape(b, hin, wpm, 2, f * co)
        e = jnp.transpose(e, (0, 1, 3, 2, 4))  # (B, Hin, dy, Win/m, f*Co)
        out = e.reshape(b, 2 * hin, wpm, f * co)
        return out + jnp.tile(bias.astype(self.dtype), f)


def concat_perm(ca: int, cb: int, fold: int = FOLD) -> tuple:
    """Kernel-side permutation for a PLAIN channel concat of two folded
    tensors (``[A | B]``, block layout) feeding a :class:`FoldedConv`.

    perm[actual] = canonical slot-major index (t, ci) with ci < ca from A
    and ci >= ca from B.  A per-slot interleaved concat (the old
    ``folded_concat``) would relayout both activations; the plain concat +
    kernel permutation moves zero activation bytes.
    """
    perm = []
    for t in range(fold):
        for i in range(ca):
            perm.append(t * (ca + cb) + i)
    for t in range(fold):
        for i in range(cb):
            perm.append(t * (ca + cb) + ca + i)
    return tuple(perm)


class FoldedConvBlockDownsample(nn.Module):
    """Folded ConvBlock + folded 2x2 max-pool; tree == ConvBlockDownsample.

    NOTE: the output is folded by ``fold // 2`` (see
    :func:`folded_max_pool_2x2`)."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16
    impl: str = "dense"
    input_grad: bool = True  # see FoldedConvBlock.input_grad

    @nn.compact
    def __call__(self, x4: jax.Array, *, train: bool = False) -> jax.Array:
        import os

        if (
            self.impl == "pallas_fused"
            and self.fold > 1
            and x4.shape[2] >= _pallas_min_wp("POOL")
            and os.environ.get("IMGSEG_RAW_BLOCK_OUT", "1") == "1"
        ):
            # Raw-output boundary: the block returns its second conv RAW
            # plus the resolved bn2 affine, and the pool computes
            # relu(y*a+b) on its own VMEM read — the activated full-res
            # tensor (whose only consumer is this pool, an XLA-opaque
            # custom call) never exists in HBM.  Silicon A/B (2026-08-18,
            # B16 @ 512^2): headline 128.75 -> 134.51 img/s; default ON.
            from ..ops.pallas_conv import make_folded_pool

            y2, ab2 = FoldedConvBlock(
                self.in_features, self.features, self.fold, self.dtype,
                impl=self.impl, input_grad=self.input_grad,
                name="conv_block",
            )(x4, train=train, raw_out=True)
            interp = jax.default_backend() not in ("tpu", "axon")
            return make_folded_pool(
                self.features, self.fold, interpret=interp, with_ab=True
            )(y2, ab2)
        h = FoldedConvBlock(
            self.in_features, self.features, self.fold, self.dtype,
            impl=self.impl, input_grad=self.input_grad, name="conv_block",
        )(x4, train=train)
        if self.fold == 1:
            # fold 1 == plain NHWC (the ``fused_deep`` wide-channel levels):
            # width pairs are adjacent wp positions, not lane slots — the
            # standard spatial pool applies.
            from .blocks import max_pool_2x2

            return max_pool_2x2(h)
        if self.impl == "pallas_fused" and h.shape[2] >= _pallas_min_wp("POOL"):
            # Pallas pool: identical values; its hand-written backward
            # replaces XLA's select/pad/interleave chain (~9 ms/step at
            # 512^2 batch 16 — round-3 XProf, folded.py:441-442 fusions;
            # ClipUnet@256 A/B at wp=64: 429.8 -> 480.0 img/s).
            from ..ops.pallas_conv import make_folded_pool

            interp = jax.default_backend() not in ("tpu", "axon")
            return make_folded_pool(
                self.features, self.fold, interpret=interp
            )(h)
        return folded_max_pool_2x2(h, self.features, self.fold)


class FoldedConvBlockUpsample(nn.Module):
    """Folded ConvTranspose -> folded ConvBlock, no skip; tree ==
    ConvBlockUpsample (the autoencoder decoder's full-resolution level,
    reference processing_blocks.py:111-133)."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16
    impl: str = "dense"
    in_folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        up4 = FoldedConvTranspose2x2(
            self.in_features, self.features, self.fold, self.dtype,
            impl=self.impl, in_folded=self.in_folded, name="up",
        )(x)
        return FoldedConvBlock(
            self.features, self.features, self.fold, self.dtype,
            impl=self.impl, name="conv_block",
        )(up4, train=train)


class FoldedConvBlockUpsampleSkip(nn.Module):
    """Folded ConvTranspose -> folded concat -> folded ConvBlock; tree ==
    ConvBlockUpsampleSkip.  Only valid when the upsampled map already matches
    the skip resolution (the full-resolution decoder level — where the
    reference's align-corners resize is the identity)."""

    in_features: int
    features: int
    fold: int = FOLD
    dtype: Any = jnp.bfloat16
    impl: str = "dense"
    # x is already the (B, H, W/m, m*Cin) slot-major view (see
    # FoldedConvTranspose2x2.in_folded).
    in_folded: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, skip4: jax.Array, *, train: bool = False
    ) -> jax.Array:
        if self.fold == 1:
            # fold 1 == plain NHWC (the ``fused_deep`` wide-channel
            # levels): standard ConvTranspose + the reference's
            # align-corners resize (non-identity only at dec1, where the
            # skip lives at the bottleneck's resolution — UNet.py:69-72),
            # then the dual-input fused block joins [up | skip] in VMEM.
            from .blocks import resize_bilinear_align_corners

            up = nn.ConvTranspose(
                self.features, (2, 2), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="up",
            )(x)
            up = resize_bilinear_align_corners(
                up, skip4.shape[1], skip4.shape[2]
            )
            return FoldedConvBlock(
                2 * self.features, self.features, 1, self.dtype,
                impl=self.impl, name="conv_block",
            )(up, skip4, train=train)
        up4 = FoldedConvTranspose2x2(
            self.in_features, self.features, self.fold, self.dtype,
            impl=self.impl, in_folded=self.in_folded, name="up",
        )(x)
        assert up4.shape[:3] == skip4.shape[:3], (
            "folded decoder requires matching resolutions (resize would be "
            f"non-identity): {up4.shape} vs {skip4.shape}"
        )
        cb = skip4.shape[-1] // self.fold
        # plain block concat; the slot interleave is absorbed into the next
        # conv's expanded kernel (zero activation relayout).  The fused
        # impl never materializes the concat at all: the block takes the
        # two halves and joins them in VMEM on each kernel read.
        block = FoldedConvBlock(
            2 * self.features, self.features, self.fold, self.dtype,
            in_perm=concat_perm(self.features, cb, self.fold),
            impl=self.impl, name="conv_block",
        )
        if self.impl == "pallas_fused":
            return block(up4, skip4.astype(up4.dtype), train=train)
        h = jnp.concatenate([up4, skip4.astype(up4.dtype)], axis=-1)
        return block(h, train=train)

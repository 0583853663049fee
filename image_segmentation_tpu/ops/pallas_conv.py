"""Pallas TPU kernel for the width-folded 3x3 convolution.

The folded layout (models/folded.py) keeps level-0/1 activations as
``(B, H, W/f, f*C)`` so the lane dimension is a full 128 multiple — no
XLA lane padding, 1x HBM traffic.  XLA's best formulations on this layout
still run the dominant convs at 7-14% of bf16 MXU peak (measured,
tools/exp_conv_forms.py): the dense expanded kernel pays 4x logical
FLOPs, and the 2x "halo" form loses its advantage to the halo
materialization round-trip through HBM.

This kernel gets both wins at once: the halo (one extra column of
context per side of each fold block) is built **in VMEM** from the row
slab with two sublane shifts + lane slices (no HBM traffic), and the
conv contracts as three per-``dy`` matmuls

    out[(h,wp), (qx,co)] += aug[(h+dy,wp), (t,ci)] @ K'[dy][(t,ci),(qx,co)]

with ``K' = _halo_kernel(w)`` — contraction width ``(f+2)*Ci`` (192..1152
lanes at the shapes that matter), output width ``f*Co`` (128..512): the
MXU runs near-full instead of 9 underfilled ``Ci``-deep taps.

Grid: ``(B, H/h_tile)``; the +-1 ``dy`` halo rows are delivered by passing
the SAME input array through three BlockSpecs with offset index maps
(mid: ``h_tile`` rows at tile i; top/bot: one row clamped to the image),
so Mosaic's automatic pipelining double-buffers everything — no manual
DMA, no dynamic scratch indexing (both crash this remote-compile
toolchain).  SAME zero padding is reproduced exactly: edge rows/columns
of the halo are zero-filled in VMEM.

Layout permutations (``in_perm`` — e.g. the decoder's plain ``[up|skip]``
channel concat) are absorbed into the *weight matrices* (rows for the
forward, columns for the input-gradient), so activations are never
re-laid-out; the halo columns are extracted from the permuted lanes via
statically-derived contiguous runs.

Gradients: ``dx`` is the same kernel with the flipped/transposed kernel
(reference conv backward identity); ``dw``/``db`` are XLA contractions
(large-K matmuls, already MXU-efficient).

Reference parity: this computes exactly ``nn.Conv(features, (3, 3),
padding=SAME)`` on the unfolded tensor (reference ConvBlock conv,
models/processing_blocks.py:15-35); equivalence is asserted in
tests/test_pallas_conv.py against lax.conv_general_dilated.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# A/B hook: contract the three per-dy matmuls as ONE K=3*kdim dot
# (read at kernel-build time; see _conv_kernel_body).
_FATDOT = os.environ.get("IMGSEG_PALLAS_FATDOT", "0") == "1"


def _wgrad_tg_enabled() -> bool:
    """Transposed-cotangent weight-gradient dots in the merged backward
    kernel: transpose g2 ONCE per grid cell and run every dkp dot in the
    MXU-native (lhs lanes x rhs sublanes) orientation, accumulating dkp
    TRANSPOSED (un-transposed once outside the kernel — a sub-MB f32
    tensor).  The doubly-sublane-contracting dot_general form measured
    2.37 ms/kernel on the enc1-conv2 shape vs 1.94 native with a ~free
    transpose (tools/exp_bwd_decomp.py, 2026-08-19); the executed-FLOP
    peak bound of those dots is 2.09 ms, so the native form runs at
    ~MXU peak.  Default OFF: the full-step silicon A/B is a WASH
    (TG=0 {154.31, 154.57} vs TG=1 {154.14, 154.11, 153.18} img/s,
    paired warm runs 2026-08-19) — the per-kernel 0.4 ms does not
    surface in the composed step.  ``IMGSEG_PALLAS_WGRAD_TG=1`` opts in
    (exact math; the equivalence suites pass either way)."""
    return os.environ.get("IMGSEG_PALLAS_WGRAD_TG", "0") == "1"


def _merged_bwd_enabled() -> bool:
    """Fused dx+wgrad backward kernels (see
    :func:`_bwd_fused_kernel_body`); ``IMGSEG_PALLAS_MERGED_BWD=0`` opts
    out (read at block-factory build time)."""
    return os.environ.get("IMGSEG_PALLAS_MERGED_BWD", "1") == "1"


def _subfold_enabled() -> bool:
    """Sub-fold banded decomposition (see :func:`_pick_subfold`) — default
    ON since the round-3 silicon A/B; ``IMGSEG_PALLAS_SUBFOLD=0`` opts out."""
    return os.environ.get("IMGSEG_PALLAS_SUBFOLD", "1") == "1"


def _slimshift_enabled() -> bool:
    """SLIM column-halo shifts in :func:`_build_aug`: the wp-shifted slabs
    are consumed for only ``ci`` of their ``lanes`` lanes, so shifting the
    full-lane tensor does ``fold`` x the needed VPU copy work — slice the
    consumed lanes FIRST, shift only those.  Exact math (the sublane shift
    and the lane slice commute).  Mosaic rejects the slice-then-shift
    order for most geometries (round 2: tools/archive/exp_mosaic_bisect3
    .py; round 5 silicon bisect tools/exp_slim_bisect.py: only >=256-lane
    single-input slabs with >=64-wide 64-aligned slices compile), so the
    slim order applies per-slice under those gates only.  Probe win:
    9.40 -> 8.68 ms on the standalone enc1-conv2 backward shape
    (tools/exp_bwd_decomp.py ``slimshift``, 2026-08-21) — but the FULL
    STEP is a wash (slim0 {154.48, 154.72, 154.58, 154.54} vs slim1
    {154.03, 154.66, 154.44, 154.41} img/s, paired in-process runs,
    2026-08-21), the same composed-step overlap that voided the wgrad_tg
    per-kernel win.  Default OFF; ``IMGSEG_PALLAS_SLIMSHIFT=1`` opts in
    (exact math; equivalence suites pass either way)."""
    return os.environ.get("IMGSEG_PALLAS_SLIMSHIFT", "0") == "1"


def _pick_subfold(fold: int, co: int, canonical: bool) -> int:
    """Sub-block width ``g`` for the banded dot decomposition.

    The dense halo dot executes ``(f+2)/3`` x the logical FLOPs because the
    ((f+2)Ci, fCo) matrix is block-banded: output slot q only reaches input
    slots q..q+2, so only 3f of (f+2)f blocks are non-zero — and the MXU
    multiplies the zeros anyway.  Splitting the contraction into ``f/g``
    sub-dots of ((g+2)Ci, gCo) executes ``(g+2)/3`` x logical instead:
    2x -> 4/3 at (f=4, g=2), 4/3 -> 1x (exactly logical) at (f=2, g=1).

    ``g`` must divide f, and ``g*co`` should fill the 128-lane MXU width —
    smaller g on narrow outputs would pay back the saved FLOPs as lane
    padding.  Returns ``fold`` (= the dense path) when no smaller g
    qualifies or the operand layout is non-canonical (permuted lanes make
    the sub-band input ranges non-contiguous).

    Silicon (tools/exp_fold2_conv.py, 64ch @ 512^2 b16, fwd+dx+wgrad):
    the g=2-equivalent form runs 12.74 ms/iter vs 15.89 dense at f=4.
    """
    if not canonical or not _subfold_enabled():
        return fold
    for g in (1, 2):
        if g < fold and fold % g == 0 and g * co >= 128:
            return g
    return fold


def _halo_matrices(kernel: jax.Array, fold: int, dtype: Any) -> jax.Array:
    """(3, 3, Ci, Co) -> (3, (f+2)*Ci, f*Co) canonical per-dy halo matrices.

    Same construction as models/folded._halo_kernel, kept local so the op
    has no module-level import cycle with models/.
    """
    kh, kw, ci, co = kernel.shape
    assert kh == 3 and kw == 3, "halo matrices are derived for 3x3 kernels"
    f = fold
    sel = np.zeros((f + 2, f, 3), np.float32)  # t, qx, dj+1
    for qx in range(f):
        for dj in (-1, 0, 1):
            sel[qx + dj + 1, qx, dj + 1] = 1.0
    selj = jnp.asarray(sel, kernel.dtype)
    kp = jnp.einsum("tqD,aDio->atiqo", selj, kernel)  # (3, f+2, ci, f, co)
    return kp.reshape(3, (f + 2) * ci, f * co).astype(dtype)


def _subfold_matrices(
    kernel: jax.Array, fold: int, g: int, dtype: Any
) -> jax.Array:
    """(3, 3, Ci, Co) -> (3, f//g, (g+2)*Ci, g*Co) banded sub-matrices.

    Sub-block j's matrix is the dense halo matrix restricted to its
    non-zero band: output slots jg..jg+g-1 (columns) against halo-row
    slots jg..jg+g+1 (i.e. canonical input slots jg-1..jg+g)."""
    kh, kw, ci, co = kernel.shape
    kp = _halo_matrices(kernel, fold, dtype)  # (3, (f+2)ci, f*co)
    nj = fold // g
    subs = [
        kp[:, (j * g) * ci : (j * g + g + 2) * ci,
            (j * g) * co : (j * g + g) * co]
        for j in range(nj)
    ]
    return jnp.stack(subs, axis=1)


def _dkp_from_subfold(
    dkp_sub: jax.Array, fold: int, g: int, ci: int, co: int
) -> jax.Array:
    """Adjoint of :func:`_subfold_matrices`'s banding: scatter the per-j
    (3, (g+2)ci, g*co) blocks back into the dense (3, (f+2)ci, f*co) frame
    (disjoint column ranges — each cell belongs to exactly one j)."""
    nj = fold // g
    dkp = jnp.zeros((3, (fold + 2) * ci, fold * co), dkp_sub.dtype)
    for j in range(nj):
        dkp = dkp.at[
            :, (j * g) * ci : (j * g + g + 2) * ci,
            (j * g) * co : (j * g + g) * co,
        ].set(dkp_sub[:, j])
    return dkp


def _wgrad_from_halo(dkp: jax.Array, fold: int, ci: int, co: int) -> jax.Array:
    """Adjoint of :func:`_halo_matrices`: (3, (f+2)*Ci, f*Co) -> (3,3,Ci,Co)."""
    f = fold
    sel = np.zeros((f + 2, f, 3), np.float32)
    for qx in range(f):
        for dj in (-1, 0, 1):
            sel[qx + dj + 1, qx, dj + 1] = 1.0
    selj = jnp.asarray(sel, dkp.dtype)
    dkp5 = dkp.reshape(3, f + 2, ci, f, co)
    return jnp.einsum("tqD,atiqo->aDio", selj, dkp5)


def _slot_runs(perm: np.ndarray, ci: int, slot: int) -> list[tuple[int, int]]:
    """Contiguous lane runs (start, length) holding canonical ``slot``'s
    channels, in canonical channel order, under the actual layout ``perm``
    (perm[actual_lane] = canonical slot-major index)."""
    lanes = [
        (perm[j] % ci, j) for j in range(len(perm)) if perm[j] // ci == slot
    ]
    lanes.sort()
    order = [j for _, j in lanes]
    assert len(order) == ci
    runs: list[tuple[int, int]] = []
    start = order[0]
    length = 1
    for j in order[1:]:
        if j == start + length:
            length += 1
        else:
            runs.append((start, length))
            start, length = j, 1
    runs.append((start, length))
    return runs


def _pick_h_tile(
    h: int, wp: int, lanes: int, kdim: int, n_out: int, itemsize: int
) -> int:
    """Largest h_tile whose VMEM footprint stays under the ~16 MiB scoped
    limit (with headroom).  Footprint model (measured 17.0 MiB at the shape
    that OOMed with ht=32, wp=128, lanes=256, kdim=384, n_out=256):
    double-buffered mid/out blocks + xv + xv_r/xv_l shifts + aug + f32 acc.
    """
    budget = 12 * 1024 * 1024
    per_row = wp * itemsize * (
        2 * lanes        # mid block, double-buffered
        + 2 * n_out      # out block, double-buffered
        + 3 * lanes      # xv + xv_r + xv_l
        + kdim           # aug
        + 2 * n_out      # f32 accumulator
    )
    for t in (32, 16, 8, 4, 2, 1):
        if h % t == 0 and t * per_row <= budget:
            return t
    return 1


def _gfold_transform(g, y, gf_ref, mode, lanes):
    """Stats-folded cotangent computed ON READ (in f32, cast back).

    ``mode == "stats"``  (gf (2, lanes) rows [c1, c2]):
        ge = g + c1 + 2*y*c2
    ``mode == "affine"`` (gf (4, lanes) rows [a, b, c1, c2]):
        ge = g * a * ((y*a + b) > 0) + c1 + 2*y*c2
    — i.e. the backward of ``z = relu(y*a + b)`` composed with the batch-
    statistic cotangents (c1 = dS, c2 = dQ per lane), which XLA otherwise
    materializes as separate full-tensor passes (round-3 XProf: ~7 ms of
    divide/multiply fusions + ~4.7 ms of converts per step at 512^2).
    """
    gfl = g.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    if mode == "affine":
        a_p = gf_ref[0:1].reshape(1, 1, lanes)
        b_p = gf_ref[1:2].reshape(1, 1, lanes)
        c1 = gf_ref[2:3].reshape(1, 1, lanes)
        c2 = gf_ref[3:4].reshape(1, 1, lanes)
        gfl = jnp.where(yf * a_p + b_p > 0.0, gfl * a_p, 0.0)
    else:
        c1 = gf_ref[0:1].reshape(1, 1, lanes)
        c2 = gf_ref[1:2].reshape(1, 1, lanes)
    return (gfl + c1 + 2.0 * yf * c2).astype(g.dtype)


def _build_aug(
    top_ref, mid_ref, bot_ref, *, ht, wp, lanes, prev_runs, next_runs,
    ab_ref=None, y_refs=None, gf_ref=None, gfold=None, b_refs=None,
    subfold=None, want_mid=False,
):
    """(ht+2, wp, lanes + 2*ci) haloed slab built entirely in VMEM — or,
    with ``subfold`` ((g, ci, f), canonical layouts only), the list of
    f//g banded sub-slabs of (ht+2, wp, (g+2)*ci) each.

    ``want_mid``: also return the transformed/activated MID tile
    (ht, wp, lanes) — the fused-backward kernel feeds it to the weight-
    gradient contraction so the cotangent transform happens exactly once.

    ``ab_ref`` (2, lanes): apply ``relu(x*a + b)`` to the RAW slab reads
    BEFORE any zero insertion — SAME padding pads the *activated* tensor
    with zeros, so inserted pad positions must stay 0, not relu(b).

    ``y_refs``/``gf_ref``/``gfold``: the slab is a COTANGENT whose stats
    fold is computed on read (:func:`_gfold_transform`); ``y_refs`` are the
    matching forward-output slabs (same index maps).  Zero insertion after
    the transform keeps conv-backward SAME-padding semantics (the cotangent
    beyond the image edge is zero).

    ``b_refs`` (top2, mid2, bot2): the slab is the lane CONCAT of two
    separately-stored inputs (the decoder's [up | skip]) — joined here in
    VMEM so the 2C-lane concat buffer is never materialized in HBM.
    ``lanes`` is the TOTAL lane count; ``prev_runs``/``next_runs`` address
    the concatenated layout.  Mutually exclusive with ``ab_ref``/``gfold``
    (never needed together: the concat inputs are already activated).
    """
    n_h = pl.num_programs(1)
    i = pl.program_id(1)

    mid = mid_ref[0]  # (ht, wp, lanes)
    top = top_ref[0]  # (1, wp, lanes)
    bot = bot_ref[0]
    if b_refs is not None:
        assert ab_ref is None and gfold is None
        top2_ref, mid2_ref, bot2_ref = b_refs
        mid = jnp.concatenate([mid, mid2_ref[0]], axis=-1)
        top = jnp.concatenate([top, top2_ref[0]], axis=-1)
        bot = jnp.concatenate([bot, bot2_ref[0]], axis=-1)
    if gfold is not None:
        y_top, y_mid, y_bot = y_refs
        top = _gfold_transform(top, y_top[0], gf_ref, gfold, lanes)
        mid = _gfold_transform(mid, y_mid[0], gf_ref, gfold, lanes)
        bot = _gfold_transform(bot, y_bot[0], gf_ref, gfold, lanes)
    if ab_ref is not None:
        # affine + relu in f32: Mosaic on this toolchain rejects bf16
        # compares ("Target does not support this comparison")
        a_p = ab_ref[0:1].reshape(1, 1, lanes).astype(jnp.float32)
        b_p = ab_ref[1:2].reshape(1, 1, lanes).astype(jnp.float32)

        def act(t):
            tf = t.astype(jnp.float32)
            return jnp.maximum(tf * a_p + b_p, 0.0).astype(t.dtype)

        mid, top, bot = act(mid), act(top), act(bot)
    mid_out = mid
    # Zero the dy halo rows at the image boundary (SAME padding).
    if n_h == 1:
        top = jnp.zeros_like(top)
        bot = jnp.zeros_like(bot)
    else:
        top = jnp.where(i > 0, top, jnp.zeros_like(top))
        bot = jnp.where(i < n_h - 1, bot, jnp.zeros_like(bot))
    xv = jnp.concatenate([top, mid, bot], axis=0)  # (ht+2, wp, lanes)

    # Column halo in VMEM: canonical slot f-1 of the previous block /
    # slot 0 of the next block, zero at the image's w edges.  Two shift
    # orders, exact-equal (the sublane shift and the lane slice commute):
    #   slim (default): slice the consumed lanes FIRST, shift only those —
    #     the full-lane shift does fold x the needed VPU copy work
    #     (tools/exp_bwd_decomp.py `slimshift`: 9.40 -> 8.68 ms on the
    #     enc1-conv2 backward shape).  Mosaic accepts the slice-then-shift
    #     order only for a subset of geometries, bisected empirically on
    #     silicon (tools/exp_slim_bisect.py, 2026-08-21): single-input
    #     slabs of >=256 total lanes with >=64-wide 64-aligned slices
    #     compile (f4/ci64, f2/ci128 fwd+bwd); 128-lane slabs (f2/ci64),
    #     sub-64 slices (ci32: "tpu.concatenate" vpad {1,96}), and the
    #     dual-input VMEM-concat slabs all die in the Mosaic backend —
    #     those fall back per-slice to:
    #   full (and IMGSEG_PALLAS_SLIMSHIFT=0): shift the FULL-lane tensor
    #     on wp first, slice lanes after (the round-2 rule,
    #     tools/archive/exp_mosaic_bisect3.py).
    slim = _slimshift_enabled() and b_refs is None and lanes >= 256

    def slim_ok(a, n):
        return slim and n >= 64 and a % 64 == 0

    def shift_p(t):  # previous-column halo: wp shifted +1, zero at edge
        z = jnp.zeros((t.shape[0], 1, t.shape[2]), t.dtype)
        return jnp.concatenate([z, t[:, :-1]], axis=1)

    def shift_n(t):  # next-column halo: wp shifted -1, zero at edge
        z = jnp.zeros((t.shape[0], 1, t.shape[2]), t.dtype)
        return jnp.concatenate([t[:, 1:], z], axis=1)

    _full = {}

    def halo_p(a, n):  # xv shifted +1 on wp, lanes [a, a+n)
        if slim_ok(a, n):
            return shift_p(xv[:, :, a : a + n])
        if "r" not in _full:
            _full["r"] = shift_p(xv)
        return _full["r"][:, :, a : a + n]

    def halo_n(a, n):  # xv shifted -1 on wp, lanes [a, a+n)
        if slim_ok(a, n):
            return shift_n(xv[:, :, a : a + n])
        if "l" not in _full:
            _full["l"] = shift_n(xv)
        return _full["l"][:, :, a : a + n]

    if subfold:
        # Banded sub-slabs (canonical layout only): sub-block j covers
        # canonical input slots jg-1 .. jg+g — slot -1 is the previous
        # block's last slot (shifted +1), slot f the next block's first
        # (shifted -1); interior slots are one contiguous lane slice.
        g, ci, f = subfold
        nj = f // g
        prev_h = halo_p((f - 1) * ci, ci)
        next_h = halo_n(0, ci)
        subs = []
        for j in range(nj):
            parts = []
            if j == 0:
                parts.append(prev_h)
            lo = max(j * g - 1, 0) * ci
            hi = min(j * g + g + 1, f) * ci
            parts.append(xv[:, :, lo:hi])
            if j == nj - 1:
                parts.append(next_h)
            subs.append(
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=-1)
            )
        return (subs, mid_out) if want_mid else subs
    prev = jnp.concatenate(
        [halo_p(a, n) for (a, n) in prev_runs], axis=-1
    )
    nxt_c = jnp.concatenate(
        [halo_n(a, n) for (a, n) in next_runs], axis=-1
    )
    aug = jnp.concatenate([prev, xv, nxt_c], axis=-1)
    return (aug, mid_out) if want_mid else aug


def _conv_kernel_body(
    *refs,
    h_tile: int,
    wp: int,
    lanes: int,
    fold: int,
    ci: int,
    n_out: int,
    prev_runs: Sequence[tuple[int, int]],
    next_runs: Sequence[tuple[int, int]],
    out_dtype: Any,
    pre: bool = False,
    post: bool = False,
    stats: bool = False,
    gfold: str | None = None,
    lanes_b: int = 0,
    split_out: tuple[int, int] | None = None,
    subfold: int = 0,
):
    """Conv core with optional fusions:

    - ``pre``: the slab is passed through ``relu(aug * a + b)`` before the
      contraction (folds the preceding BatchNorm-apply + ReLU into the
      conv's VMEM read; ``ab`` is a (2, kdim) per-aug-lane affine).
    - ``post``: the f32 accumulator is passed through the ADJOINT of the
      pre-op of the forward conv this kernel is the input-gradient of:
      ``gu = acc * (x*a+b > 0); out = gu * a`` with per-output-lane
      ``(2, n_out)`` affine and the original input tile ``x``; also
      accumulates ``da = sum gu*x`` and ``dbp = sum gu`` grid-wide.
    - ``stats``: accumulates per-lane ``s1 = sum y`` / ``s2 = sum y^2`` of
      the CAST output grid-wide (the following BatchNorm's batch stats,
      saving its full-tensor reduce pass).
    - ``gfold``: the slab is a raw cotangent; its BatchNorm backward
      (affine-relu adjoint and/or stats-cotangent fold) is computed on
      read from matching forward-output slabs (:func:`_gfold_transform`).
    - ``lanes_b``: the slab input is stored as TWO arrays (lane concat
      [A | B], B holding ``lanes_b`` lanes) joined in VMEM — see
      :func:`_build_aug`.
    - ``split_out``: write the output as two lane-sliced arrays
      (na, nb) instead of one (the adjoint of the VMEM concat: the input
      gradient of a decoder block lands directly in the up/skip halves).
    """
    it = iter(refs)
    top_ref, mid_ref, bot_ref = next(it), next(it), next(it)
    b_refs = (next(it), next(it), next(it)) if lanes_b else None
    y_refs = (next(it), next(it), next(it)) if gfold else None
    w_ref, bias_ref = next(it), next(it)
    gf_ref = next(it) if gfold else None
    ab_pre_ref = next(it) if pre else None
    x_ref = next(it) if post else None
    ab_post_ref = next(it) if post else None
    if split_out is not None:
        out_ref = None
        out_a_ref, out_b_ref = next(it), next(it)
    else:
        out_ref = next(it)
    s1_ref = next(it) if stats else None
    s2_ref = next(it) if stats else None
    da_ref = next(it) if post else None
    dbp_ref = next(it) if post else None

    ht = h_tile
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    aug = _build_aug(
        top_ref, mid_ref, bot_ref,
        ht=ht, wp=wp, lanes=lanes, prev_runs=prev_runs, next_runs=next_runs,
        ab_ref=ab_pre_ref, y_refs=y_refs, gf_ref=gf_ref, gfold=gfold,
        b_refs=b_refs,
        subfold=(subfold, ci, fold) if subfold else None,
    )
    kdim = lanes + 2 * ci

    if subfold:
        # Banded sub-dots: f//g accumulations of ((g+2)ci, g*co) — only
        # the non-zero band of the halo matrix is executed ((g+2)/3 x
        # logical FLOPs instead of (f+2)/3; see _pick_subfold).
        g = subfold
        nj = fold // g
        sub_out = n_out // nj
        skdim = (g + 2) * ci
        pieces = []
        for j in range(nj):
            accj = jnp.zeros((ht * wp, sub_out), jnp.float32)
            for dy in range(3):
                a = aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                accj = accj + jnp.dot(
                    a, w_ref[dy, j], preferred_element_type=jnp.float32
                )
            pieces.append(accj)
        acc = jnp.concatenate(pieces, axis=-1)
    elif _FATDOT:
        # One K=3*kdim contraction instead of three accumulated K=kdim dots:
        # fewer MXU weight-column reloads on the small-K level-0 shapes.
        a3 = jnp.concatenate(
            [aug[dy : dy + ht].reshape(ht * wp, kdim) for dy in range(3)],
            axis=1,
        )
        acc = jnp.dot(
            a3, w_ref[...].reshape(3 * kdim, n_out),
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jnp.zeros((ht * wp, n_out), jnp.float32)
        for dy in range(3):
            a = aug[dy : dy + ht].reshape(ht * wp, kdim)
            acc = acc + jnp.dot(
                a, w_ref[dy], preferred_element_type=jnp.float32
            )
    acc = acc + bias_ref[0].astype(jnp.float32)

    if post:
        assert split_out is None
        x = x_ref[0].reshape(ht * wp, n_out).astype(jnp.float32)
        a_q = ab_post_ref[0:1].reshape(1, n_out).astype(jnp.float32)
        b_q = ab_post_ref[1:2].reshape(1, n_out).astype(jnp.float32)
        mask = (x * a_q + b_q) > 0.0
        gu = jnp.where(mask, acc, 0.0)
        out_ref[0] = (gu * a_q).reshape(ht, wp, n_out).astype(out_dtype)

        @pl.when(first)
        def _():
            da_ref[...] = jnp.zeros_like(da_ref)
            dbp_ref[...] = jnp.zeros_like(dbp_ref)

        da_ref[...] = da_ref[...] + jnp.sum(gu * x, axis=0, keepdims=True)
        dbp_ref[...] = dbp_ref[...] + jnp.sum(gu, axis=0, keepdims=True)
    elif split_out is not None:
        na, _ = split_out
        y = acc.reshape(ht, wp, n_out).astype(out_dtype)
        out_a_ref[0] = y[..., :na]
        out_b_ref[0] = y[..., na:]
    else:
        y = acc.reshape(ht, wp, n_out).astype(out_dtype)
        out_ref[0] = y
        if stats:
            @pl.when(first)
            def _():
                s1_ref[...] = jnp.zeros_like(s1_ref)
                s2_ref[...] = jnp.zeros_like(s2_ref)

            yf = y.astype(jnp.float32).reshape(ht * wp, n_out)
            s1_ref[...] = s1_ref[...] + jnp.sum(yf, axis=0, keepdims=True)
            s2_ref[...] = s2_ref[...] + jnp.sum(yf * yf, axis=0, keepdims=True)


def _folded_conv_pallas(
    x4: jax.Array,
    w_mats: jax.Array,
    bias_f: jax.Array,
    *,
    fold: int,
    ci: int,
    prev_runs: tuple,
    next_runs: tuple,
    h_tile: int | None,
    interpret: bool,
    ab_pre: jax.Array | None = None,
    x_post: jax.Array | None = None,
    ab_post: jax.Array | None = None,
    stats: bool = False,
    g_y: jax.Array | None = None,
    gf_consts: jax.Array | None = None,
    gfold: str | None = None,
    x4b: jax.Array | None = None,
    split_out: tuple[int, int] | None = None,
    subfold: int = 0,
):
    """Run the kernel: x4 (B, H, Wp, L) x w_mats (3, L+2ci, N) -> (B, H, Wp, N).

    With ``subfold`` g: ``w_mats`` is the banded (3, f//g, (g+2)ci, g*co)
    stack from :func:`_subfold_matrices` and the contraction runs as f//g
    sub-dots ((g+2)/3 x logical FLOPs).  Canonical layouts only.

    With ``stats``: returns (y, s1 (N,), s2 (N,)) f32 output sums.
    With ``x_post``/``ab_post``: returns (y, da (N,), dbp (N,)) — see
    :func:`_conv_kernel_body`.
    With ``gfold``: ``x4`` is a raw cotangent; ``g_y`` (same shape) and
    ``gf_consts`` ((2|4, L) f32) feed the on-read stats fold.
    With ``x4b``: the input slab is the VMEM lane concat [x4 | x4b].
    With ``split_out`` (na, nb): returns (y_a, y_b) — the output lane-split
    into two arrays (the adjoint of the VMEM concat).
    """
    pre = ab_pre is not None
    post = x_post is not None
    b, h, wp, lanes = x4.shape
    lanes_b = 0 if x4b is None else x4b.shape[-1]
    lanes = lanes + lanes_b
    nj = (fold // subfold) if subfold else 1
    n_out = w_mats.shape[-1] * (nj if subfold else 1)
    extra = (n_out if post else 0) + (lanes if gfold else 0)
    aug_kdim = nj * w_mats.shape[-2] if subfold else w_mats.shape[1]
    ht = h_tile or _pick_h_tile(
        h, wp, lanes, aug_kdim, n_out + extra, x4.dtype.itemsize
    )
    assert h % ht == 0, (h, ht)
    grid = (b, h // ht)

    kernel = functools.partial(
        _conv_kernel_body,
        h_tile=ht,
        wp=wp,
        lanes=lanes,
        fold=fold,
        ci=ci,
        n_out=n_out,
        prev_runs=prev_runs,
        next_runs=next_runs,
        out_dtype=x4.dtype,
        pre=pre,
        post=post,
        stats=stats,
        gfold=gfold,
        lanes_b=lanes_b,
        split_out=split_out,
        subfold=subfold,
    )
    flops = 2 * b * h * wp * (
        ((subfold + 2) if subfold else (fold + 2)) * ci
    ) * n_out * 3
    n_h = h // ht

    def _slab_specs(width):
        return [
            # one row above the tile (clamped; zeroed in-kernel at i == 0)
            pl.BlockSpec(
                (1, 1, wp, width),
                lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0, 0),
            ),
            # the tile itself
            pl.BlockSpec((1, ht, wp, width), lambda b, i: (b, i, 0, 0)),
            # one row below the tile (clamped; zeroed at i == n_h - 1)
            pl.BlockSpec(
                (1, 1, wp, width),
                lambda b, i: (b, jnp.minimum(i * ht + ht, n_h * ht - 1), 0, 0),
            ),
        ]

    slab_specs = _slab_specs(lanes - lanes_b)
    in_specs = list(slab_specs)
    args = [x4, x4, x4]
    if lanes_b:
        in_specs.extend(_slab_specs(lanes_b))
        args.extend([x4b, x4b, x4b])
    if gfold:
        in_specs.extend(_slab_specs(lanes))  # y slabs, same index maps
        args.extend([g_y, g_y, g_y])
    in_specs.extend([
        pl.BlockSpec(w_mats.shape, lambda b, i: (0,) * w_mats.ndim),
        pl.BlockSpec((1, n_out), lambda b, i: (0, 0)),
    ])
    args.extend([w_mats, bias_f])
    if gfold:
        in_specs.append(
            pl.BlockSpec((gf_consts.shape[0], lanes), lambda b, i: (0, 0))
        )
        args.append(gf_consts)
    if pre:
        in_specs.append(pl.BlockSpec((2, lanes), lambda b, i: (0, 0)))
        args.append(ab_pre)
    if post:
        in_specs.append(pl.BlockSpec((1, ht, wp, n_out), lambda b, i: (b, i, 0, 0)))
        in_specs.append(pl.BlockSpec((2, n_out), lambda b, i: (0, 0)))
        args.extend([x_post, ab_post])

    if split_out is not None:
        assert not stats and not post
        na, nb = split_out
        assert na + nb == n_out, (na, nb, n_out)
        out_specs = [
            pl.BlockSpec((1, ht, wp, na), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, ht, wp, nb), lambda b, i: (b, i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, h, wp, na), x4.dtype),
            jax.ShapeDtypeStruct((b, h, wp, nb), x4.dtype),
        ]
        ya, yb = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=x4.size * x4.dtype.itemsize * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
        return ya, yb

    out_specs = [pl.BlockSpec((1, ht, wp, n_out), lambda b, i: (b, i, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, h, wp, n_out), x4.dtype)]
    n_acc = (2 if stats else 0) + (2 if post else 0)
    for _ in range(n_acc):
        out_specs.append(pl.BlockSpec((1, n_out), lambda b, i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, n_out), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if n_acc else out_specs[0],
        out_shape=out_shape if n_acc else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x4.size * x4.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if not n_acc:
        return res
    y, v1, v2 = res
    return y, v1[0], v2[0]


def _wgrad_kernel_body(
    *refs,
    h_tile: int,
    wp: int,
    lanes: int,
    ci: int,
    n_out: int,
    prev_runs: Sequence[tuple[int, int]],
    next_runs: Sequence[tuple[int, int]],
    pre: bool = False,
    gfold: str | None = None,
    lanes_b: int = 0,
    fold: int = 0,
    subfold: int = 0,
):
    """dkp[dy] = sum over tiles of aug_rows(dy)^T @ g_rows; db = sum g.

    The dkp/db output blocks map every grid step to the same block, so
    they live in VMEM for the whole grid and accumulate (the standard
    matmul-K-loop revisiting pattern); zeroed at the first step.

    ``pre``: the slab is activated (``relu(aug*a + b)``) before the
    contraction, matching the fused forward.

    ``gfold``: the ``g`` operand is a raw cotangent; its stats fold is
    computed on read from the matching forward-output block ``y`` and the
    per-lane constants (:func:`_gfold_transform`).

    ``lanes_b``: the slab is stored as two arrays joined in VMEM
    (:func:`_build_aug`).
    """
    it = iter(refs)
    top_ref, mid_ref, bot_ref = next(it), next(it), next(it)
    b_refs = (next(it), next(it), next(it)) if lanes_b else None
    g_ref = next(it)
    y_ref = next(it) if gfold else None
    gf_ref = next(it) if gfold else None
    ab_ref = next(it) if pre else None
    dkp_ref, db_ref = next(it), next(it)
    ht = h_tile
    b = pl.program_id(0)
    i = pl.program_id(1)
    aug = _build_aug(
        top_ref, mid_ref, bot_ref,
        ht=ht, wp=wp, lanes=lanes, prev_runs=prev_runs, next_runs=next_runs,
        ab_ref=ab_ref, b_refs=b_refs,
        subfold=(subfold, ci, fold) if subfold else None,
    )
    kdim = lanes + 2 * ci
    g_raw = g_ref[0]
    if gfold:
        g_raw = _gfold_transform(g_raw, y_ref[0], gf_ref, gfold, n_out)
    g = g_raw.reshape(ht * wp, n_out)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dkp_ref[...] = jnp.zeros_like(dkp_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    if subfold:
        nj = fold // subfold
        sub_out = n_out // nj
        skdim = (subfold + 2) * ci
        for dy in range(3):
            for j in range(nj):
                a = aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                gj = g[:, j * sub_out : (j + 1) * sub_out]
                dkp_ref[dy, j] = dkp_ref[dy, j] + jax.lax.dot_general(
                    a, gj, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    else:
        for dy in range(3):
            a = aug[dy : dy + ht].reshape(ht * wp, kdim)
            contrib = jax.lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (kdim, n_out)
            dkp_ref[dy] = dkp_ref[dy] + contrib
    db_ref[0] = db_ref[0] + jnp.sum(g.astype(jnp.float32), axis=0)


def _folded_wgrad_pallas(
    x4: jax.Array,
    g: jax.Array,
    *,
    ci: int,
    prev_runs: tuple,
    next_runs: tuple,
    h_tile: int | None,
    interpret: bool,
    ab_pre: jax.Array | None = None,
    g_y: jax.Array | None = None,
    gf_consts: jax.Array | None = None,
    gfold: str | None = None,
    x4b: jax.Array | None = None,
    subfold: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """(dkp (3, lanes+2ci, N) f32 in KERNEL row order [prev|actual mid|next],
    db (N,) f32) from one pass over x4 and g.  ``x4b``: the slab is the
    VMEM lane concat [x4 | x4b].  With ``subfold`` g (canonical layouts
    only) the contraction runs banded and dkp comes back already scattered
    to the dense canonical frame (zero blocks stay zero)."""
    pre = ab_pre is not None
    b, h, wp, lanes = x4.shape
    lanes_b = 0 if x4b is None else x4b.shape[-1]
    lanes = lanes + lanes_b
    fold = lanes // ci
    n_out = g.shape[-1]
    kdim = lanes + 2 * ci
    nj = (fold // subfold) if subfold else 1
    aug_kdim = nj * (subfold + 2) * ci if subfold else kdim
    extra = n_out if gfold else 0
    ht = h_tile or _pick_h_tile(
        h, wp, lanes, aug_kdim, n_out + extra, x4.dtype.itemsize
    )
    assert h % ht == 0, (h, ht)
    n_h = h // ht

    kernel = functools.partial(
        _wgrad_kernel_body,
        h_tile=ht,
        wp=wp,
        lanes=lanes,
        ci=ci,
        n_out=n_out,
        prev_runs=prev_runs,
        next_runs=next_runs,
        pre=pre,
        gfold=gfold,
        lanes_b=lanes_b,
        fold=fold,
        subfold=subfold,
    )
    flops = 2 * b * h * wp * (
        ((subfold + 2) if subfold else (fold + 2)) * ci
    ) * n_out * 3

    def _slab_specs(width):
        return [
            pl.BlockSpec(
                (1, 1, wp, width),
                lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0, 0),
            ),
            pl.BlockSpec((1, ht, wp, width), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, wp, width),
                lambda b, i: (b, jnp.minimum(i * ht + ht, n_h * ht - 1), 0, 0),
            ),
        ]

    in_specs = _slab_specs(lanes - lanes_b)
    args = [x4, x4, x4]
    if lanes_b:
        in_specs.extend(_slab_specs(lanes_b))
        args.extend([x4b, x4b, x4b])
    in_specs.append(pl.BlockSpec((1, ht, wp, n_out), lambda b, i: (b, i, 0, 0)))
    args.append(g)
    if gfold:
        in_specs.append(pl.BlockSpec((1, ht, wp, n_out), lambda b, i: (b, i, 0, 0)))
        in_specs.append(
            pl.BlockSpec((gf_consts.shape[0], n_out), lambda b, i: (0, 0))
        )
        args.extend([g_y, gf_consts])
    if pre:
        in_specs.append(pl.BlockSpec((2, lanes), lambda b, i: (0, 0)))
        args.append(ab_pre)
    if subfold:
        skdim = (subfold + 2) * ci
        sub_out = n_out // nj
        dkp_shape = (3, nj, skdim, sub_out)
    else:
        dkp_shape = (3, kdim, n_out)
    dkp, db = pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(dkp_shape, lambda b, i: (0,) * len(dkp_shape)),
            pl.BlockSpec((1, n_out), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dkp_shape, jnp.float32),
            jax.ShapeDtypeStruct((1, n_out), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x4.size + g.size) * x4.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if subfold:
        co = n_out // fold
        dkp = _dkp_from_subfold(dkp, fold, subfold, ci, co)
    return dkp, db[0]


def _bwd_fused_kernel_body(
    *refs,
    h_tile: int,
    wp: int,
    lg: int,
    lx: int,
    fold: int,
    ci_dx: int,
    ci_w: int,
    n_dx: int,
    prev_dx: Sequence[tuple[int, int]],
    next_dx: Sequence[tuple[int, int]],
    prev_w: Sequence[tuple[int, int]],
    next_w: Sequence[tuple[int, int]],
    out_dtype: Any,
    gfold: str | None = None,
    post: bool = False,
    pre_w: bool = False,
    lanes_b: int = 0,
    split_out: tuple[int, int] | None = None,
    sub_dx: int = 0,
    sub_w: int = 0,
    wgrad_tg: bool = False,
):
    """Input-gradient AND weight-gradient of one folded conv in ONE kernel.

    The separate dx/wgrad kernels each re-read the raw cotangent, the
    forward output (for the stats fold) and the conv input from HBM and
    each recompute :func:`_gfold_transform` — ~3 redundant full-tensor
    reads plus a duplicate VPU transform pass per conv backward.  Here:

    - the ``ge`` slab is built once (gfold computed once); its halo form
      feeds the dx dots and its mid tile feeds the wgrad contraction;
    - the ``xw`` slab (the conv's input: x4 or y1) feeds the wgrad dots
      and, raw, the dx pre-op adjoint (``post``);
    - dx is written per tile; dkp/db (and da/dbp of the pre-op affine)
      accumulate grid-wide in VMEM-resident blocks.

    Same math as the two-kernel path (tests/test_pallas_conv.py asserts
    equivalence through the block VJP); only the data movement changes.
    """
    it = iter(refs)
    ge_refs = (next(it), next(it), next(it))
    y_refs = (next(it), next(it), next(it)) if gfold else None
    xw_refs = (next(it), next(it), next(it))
    xb_refs = (next(it), next(it), next(it)) if lanes_b else None
    w_ref = next(it)
    gf_ref = next(it) if gfold else None
    ab_post_ref = next(it) if post else None
    ab_pre_ref = next(it) if pre_w else None
    if split_out is not None:
        out_a_ref, out_b_ref = next(it), next(it)
        out_ref = None
    else:
        out_ref = next(it)
    dkp_ref, dbw_ref = next(it), next(it)
    da_ref = next(it) if post else None
    dbp_ref = next(it) if post else None

    ht = h_tile
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    # ---- ge slab: halo form for the dx dots, transformed mid for wgrad.
    ge_aug, ge_t = _build_aug(
        *ge_refs,
        ht=ht, wp=wp, lanes=lg, prev_runs=prev_dx, next_runs=next_dx,
        y_refs=y_refs, gf_ref=gf_ref, gfold=gfold,
        subfold=(sub_dx, ci_dx, lg // ci_dx) if sub_dx else None,
        want_mid=True,
    )

    # ---- dx contraction (zero bias: both callers pass none).
    kdim_dx = lg + 2 * ci_dx
    if sub_dx:
        nj = (lg // ci_dx) // sub_dx
        sub_out = n_dx // nj
        skdim = (sub_dx + 2) * ci_dx
        pieces = []
        for j in range(nj):
            accj = jnp.zeros((ht * wp, sub_out), jnp.float32)
            for dy in range(3):
                a = ge_aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                accj = accj + jnp.dot(
                    a, w_ref[dy, j], preferred_element_type=jnp.float32
                )
            pieces.append(accj)
        acc = jnp.concatenate(pieces, axis=-1)
    else:
        acc = jnp.zeros((ht * wp, n_dx), jnp.float32)
        for dy in range(3):
            a = ge_aug[dy : dy + ht].reshape(ht * wp, kdim_dx)
            acc = acc + jnp.dot(
                a, w_ref[dy], preferred_element_type=jnp.float32
            )

    if post:
        # pre-op adjoint off the RAW xw mid tile (xw == the forward conv's
        # pre-activation input, e.g. y1): gu = acc * mask, out = gu * a.
        x = xw_refs[1][0].reshape(ht * wp, n_dx).astype(jnp.float32)
        a_q = ab_post_ref[0:1].reshape(1, n_dx).astype(jnp.float32)
        b_q = ab_post_ref[1:2].reshape(1, n_dx).astype(jnp.float32)
        gu = jnp.where((x * a_q + b_q) > 0.0, acc, 0.0)
        out_ref[0] = (gu * a_q).reshape(ht, wp, n_dx).astype(out_dtype)

        @pl.when(first)
        def _():
            da_ref[...] = jnp.zeros_like(da_ref)
            dbp_ref[...] = jnp.zeros_like(dbp_ref)

        da_ref[...] = da_ref[...] + jnp.sum(gu * x, axis=0, keepdims=True)
        dbp_ref[...] = dbp_ref[...] + jnp.sum(gu, axis=0, keepdims=True)
    elif split_out is not None:
        na, _ = split_out
        yv = acc.reshape(ht, wp, n_dx).astype(out_dtype)
        out_a_ref[0] = yv[..., :na]
        out_b_ref[0] = yv[..., na:]
    else:
        out_ref[0] = acc.reshape(ht, wp, n_dx).astype(out_dtype)

    # ---- wgrad contraction on the (re-activated) xw slab x transformed ge.
    xw_aug = _build_aug(
        *xw_refs,
        ht=ht, wp=wp, lanes=lx, prev_runs=prev_w, next_runs=next_w,
        ab_ref=ab_pre_ref, b_refs=xb_refs,
        subfold=(sub_w, ci_w, lx // ci_w) if sub_w else None,
    )
    g2 = ge_t.reshape(ht * wp, lg)

    @pl.when(first)
    def _():
        dkp_ref[...] = jnp.zeros_like(dkp_ref)
        dbw_ref[...] = jnp.zeros_like(dbw_ref)

    # With ``wgrad_tg`` the cotangent is transposed ONCE and every dkp dot
    # runs in the MXU-native (lhs lanes x rhs sublanes) orientation,
    # accumulating dkp TRANSPOSED — the caller un-transposes the small f32
    # block once.  The dot_general form below contracts the SUBLANE dim of
    # BOTH operands (doubly MXU-transposed): 2.37 vs 1.94 ms/kernel on the
    # enc1-conv2 shape (tools/exp_bwd_decomp.py, 2026-08-19).
    g2t = g2.T if wgrad_tg else None
    if sub_w:
        njw = (lx // ci_w) // sub_w
        sub_g = lg // njw
        skdim_w = (sub_w + 2) * ci_w
        for dy in range(3):
            for j in range(njw):
                a = xw_aug[j][dy : dy + ht].reshape(ht * wp, skdim_w)
                if wgrad_tg:
                    gjt = g2t[j * sub_g : (j + 1) * sub_g]
                    dkp_ref[dy, j] = dkp_ref[dy, j] + jnp.dot(
                        gjt, a, preferred_element_type=jnp.float32
                    )
                else:
                    gj = g2[:, j * sub_g : (j + 1) * sub_g]
                    dkp_ref[dy, j] = dkp_ref[dy, j] + jax.lax.dot_general(
                        a, gj, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
    else:
        kdim_w = lx + 2 * ci_w
        for dy in range(3):
            a = xw_aug[dy : dy + ht].reshape(ht * wp, kdim_w)
            if wgrad_tg:
                dkp_ref[dy] = dkp_ref[dy] + jnp.dot(
                    g2t, a, preferred_element_type=jnp.float32
                )
            else:
                dkp_ref[dy] = dkp_ref[dy] + jax.lax.dot_general(
                    a, g2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    dbw_ref[0] = dbw_ref[0] + jnp.sum(g2.astype(jnp.float32), axis=0)


def _pick_h_tile_bwd(
    h: int, wp: int, lg: int, lx: int, n_dx: int,
    kdim_dx: int, kdim_w: int, itemsize: int, fixed_bytes: int,
) -> int:
    """h_tile for the fused-backward kernel: same 12 MiB headroom model as
    :func:`_pick_h_tile` with both slabs plus the resident dkp block.

    ``IMGSEG_PALLAS_BWD_HT`` forces a tile height (A/B hook — the model
    above is deliberately conservative; a larger tile halves the +-1-row
    halo DMA overhead if it fits the real VMEM budget)."""
    forced = int(os.environ.get("IMGSEG_PALLAS_BWD_HT", "0"))
    if forced and h % forced == 0:
        return forced
    budget = 12 * 1024 * 1024 - fixed_bytes
    per_row = wp * itemsize * (
        2 * lg + 2 * lg + 2 * lx   # double-buffered mid blocks: ge, y, xw
        + 2 * n_dx                 # dx out block, double-buffered
        + 3 * lg + kdim_dx         # ge xv + shifts + aug
        + 3 * lx + kdim_w          # xw xv + shifts + aug
        + 4 * n_dx                 # f32 acc + gu
    )
    for t in (32, 16, 8, 4, 2, 1):
        if h % t == 0 and t * per_row <= budget:
            return t
    return 1


def _folded_bwd_fused_pallas(
    ge: jax.Array,
    xw: jax.Array,
    wb: jax.Array,
    *,
    fold: int,
    ci_dx: int,
    ci_w: int,
    n_dx: int,
    prev_dx: tuple,
    next_dx: tuple,
    prev_w: tuple,
    next_w: tuple,
    h_tile: int | None,
    interpret: bool,
    g_y: jax.Array | None = None,
    gf_consts: jax.Array | None = None,
    gfold: str | None = None,
    ab_post: jax.Array | None = None,
    ab_pre: jax.Array | None = None,
    xwb: jax.Array | None = None,
    split_out: tuple[int, int] | None = None,
    sub_dx: int = 0,
    sub_w: int = 0,
):
    """One fused pass for a folded conv's backward: returns
    ``(dx[, dxb], dkp, db[, da_post, dbp_post])``.

    ``ge`` is the raw output cotangent (transformed on read per ``gfold``),
    ``xw`` the conv's input (wgrad slab operand; with ``ab_post`` also the
    raw x of the dx pre-op adjoint), ``wb`` the flipped/transposed dx
    weight matrices (dense halo or ``sub_dx``-banded stack).  dkp comes
    back in the dense kernel-row frame (subfold blocks scattered), exactly
    as :func:`_folded_wgrad_pallas` returns it.
    """
    post = ab_post is not None
    b, h, wp, lg = ge.shape
    lanes_b = 0 if xwb is None else xwb.shape[-1]
    lx = xw.shape[-1] + lanes_b
    fold_w = lx // ci_w
    kdim_dx = lg + 2 * ci_dx
    kdim_w = lx + 2 * ci_w
    wgrad_tg = _wgrad_tg_enabled()
    if sub_w:
        njw = fold_w // sub_w
        skdim_w = (sub_w + 2) * ci_w
        dkp_shape = (
            (3, njw, lg // njw, skdim_w) if wgrad_tg
            else (3, njw, skdim_w, lg // njw)
        )
    else:
        dkp_shape = (3, lg, kdim_w) if wgrad_tg else (3, kdim_w, lg)
    fixed = int(np.prod(dkp_shape)) * 4 + 16 * lg
    ht = h_tile or _pick_h_tile_bwd(
        h, wp, lg, lx, n_dx, kdim_dx, kdim_w, ge.dtype.itemsize, fixed
    )
    assert h % ht == 0, (h, ht)
    n_h = h // ht

    kernel = functools.partial(
        _bwd_fused_kernel_body,
        h_tile=ht, wp=wp, lg=lg, lx=lx, fold=fold,
        ci_dx=ci_dx, ci_w=ci_w, n_dx=n_dx,
        prev_dx=prev_dx, next_dx=next_dx, prev_w=prev_w, next_w=next_w,
        out_dtype=ge.dtype,
        gfold=gfold, post=post, pre_w=ab_pre is not None,
        lanes_b=lanes_b, split_out=split_out,
        sub_dx=sub_dx, sub_w=sub_w, wgrad_tg=wgrad_tg,
    )
    flops = 2 * b * h * wp * 3 * (
        ((sub_dx + 2) if sub_dx else (fold + 2)) * ci_dx * n_dx
        + ((sub_w + 2) if sub_w else (fold_w + 2)) * ci_w * lg
    )

    def _slab_specs(width):
        return [
            pl.BlockSpec(
                (1, 1, wp, width),
                lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0, 0),
            ),
            pl.BlockSpec((1, ht, wp, width), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, wp, width),
                lambda b, i: (b, jnp.minimum(i * ht + ht, n_h * ht - 1), 0, 0),
            ),
        ]

    in_specs = _slab_specs(lg)
    args = [ge, ge, ge]
    if gfold:
        in_specs.extend(_slab_specs(lg))
        args.extend([g_y, g_y, g_y])
    in_specs.extend(_slab_specs(lx - lanes_b))
    args.extend([xw, xw, xw])
    if lanes_b:
        in_specs.extend(_slab_specs(lanes_b))
        args.extend([xwb, xwb, xwb])
    in_specs.append(pl.BlockSpec(wb.shape, lambda b, i: (0,) * wb.ndim))
    args.append(wb)
    if gfold:
        in_specs.append(
            pl.BlockSpec((gf_consts.shape[0], lg), lambda b, i: (0, 0))
        )
        args.append(gf_consts)
    if post:
        in_specs.append(pl.BlockSpec((2, n_dx), lambda b, i: (0, 0)))
        args.append(ab_post)
    if ab_pre is not None:
        in_specs.append(pl.BlockSpec((2, lx), lambda b, i: (0, 0)))
        args.append(ab_pre)

    out_specs = []
    out_shape = []
    if split_out is not None:
        na, nb = split_out
        assert na + nb == n_dx, (na, nb, n_dx)
        out_specs.extend([
            pl.BlockSpec((1, ht, wp, na), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, ht, wp, nb), lambda b, i: (b, i, 0, 0)),
        ])
        out_shape.extend([
            jax.ShapeDtypeStruct((b, h, wp, na), ge.dtype),
            jax.ShapeDtypeStruct((b, h, wp, nb), ge.dtype),
        ])
    else:
        out_specs.append(pl.BlockSpec((1, ht, wp, n_dx), lambda b, i: (b, i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, h, wp, n_dx), ge.dtype))
    out_specs.append(pl.BlockSpec(dkp_shape, lambda b, i: (0,) * len(dkp_shape)))
    out_shape.append(jax.ShapeDtypeStruct(dkp_shape, jnp.float32))
    out_specs.append(pl.BlockSpec((1, lg), lambda b, i: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct((1, lg), jnp.float32))
    if post:
        for _ in range(2):
            out_specs.append(pl.BlockSpec((1, n_dx), lambda b, i: (0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((1, n_dx), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(ge.size + xw.size) * ge.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = iter(res)
    if split_out is not None:
        dx = (next(it), next(it))
    else:
        dx = next(it)
    dkp, dbw = next(it), next(it)
    if wgrad_tg:
        # Un-transpose the TG accumulation back to the dense kernel-row
        # frame — a one-off XLA transpose of a sub-MB f32 block per step.
        dkp = jnp.swapaxes(dkp, -1, -2)
    if sub_w:
        dkp = _dkp_from_subfold(dkp, fold_w, sub_w, ci_w, lg // fold_w)
    out = [dx, dkp, dbw[0]]
    if post:
        out.extend([next(it)[0], next(it)[0]])
    return tuple(out)


def _1x1_bwd_kernel_body(
    x_ref, ge_ref, wbt_ref, dx_ref, dk_ref, db_ref,
    *, ht: int, wp: int, lin: int, lout: int, ci: int, co: int, f: int,
):
    """Merged backward of the folded 1x1 conv (``y = x @ kron(I_f, k)``):
    dx, dk and db in ONE pass over (x, ge).

    XLA's autodiff wgrad (``dwbd = x^T @ ge``) physically transposes the
    (B, H, Wp, L) activations into a lane-major layout first — two ~0.8 ms
    copies per step on the stem/out convs at 512^2 b16 (round-3 XProf
    "data formatting" rows) — and reads x and ge once per product.  Here
    the row-contraction runs directly on the natural layout
    (``dot_general`` contracting the row dim), x and ge are read once,
    and the kron adjoint (sum over fold-slot blocks) happens in the
    accumulator indexing: ``dk += x_slot^T @ ge_slot`` per slot.
    """
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    x = x_ref[0].reshape(ht * wp, lin)
    ge = ge_ref[0].reshape(ht * wp, lout)
    dx = jnp.dot(ge, wbt_ref[...], preferred_element_type=jnp.float32)
    dx_ref[0] = dx.reshape(ht, wp, lin).astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    for t in range(f):
        xt = x[:, t * ci : (t + 1) * ci]
        gt = ge[:, t * co : (t + 1) * co]
        dk_ref[...] = dk_ref[...] + jax.lax.dot_general(
            xt, gt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    db_ref[0] = db_ref[0] + jnp.sum(ge.astype(jnp.float32), axis=0)


def _folded_1x1_bwd_pallas(
    x4: jax.Array,
    ge: jax.Array,
    wbt: jax.Array,
    *,
    ci: int,
    co: int,
    fold: int,
    interpret: bool,
):
    """(dx (B,H,Wp,f*ci), dk (ci,co) f32, db (f*co,) f32) in one pass."""
    b, h, wp, lin = x4.shape
    lout = ge.shape[-1]
    per_row = wp * x4.dtype.itemsize * (2 * lin + 2 * lout + 4 * lin)
    budget = 12 * 1024 * 1024 - (ci * co + lout) * 8
    ht = next(
        (t for t in (32, 16, 8, 4, 2, 1)
         if h % t == 0 and t * per_row <= budget), 1
    )
    dx, dk, db = pl.pallas_call(
        functools.partial(
            _1x1_bwd_kernel_body,
            ht=ht, wp=wp, lin=lin, lout=lout, ci=ci, co=co, f=fold,
        ),
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((1, ht, wp, lin), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, ht, wp, lout), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(wbt.shape, lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ht, wp, lin), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((ci, co), lambda b, i: (0, 0)),
            pl.BlockSpec((1, lout), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x4.shape, x4.dtype),
            jax.ShapeDtypeStruct((ci, co), jnp.float32),
            jax.ShapeDtypeStruct((1, lout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wp * (lout * lin + lin * lout),
            bytes_accessed=(x4.size + ge.size) * x4.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x4, ge, wbt)
    return dx, dk, db[0]


@functools.lru_cache(maxsize=None)
def make_folded_1x1(
    in_features: int,
    features: int,
    fold: int,
    dtype_name: str,
    interpret: bool = False,
):
    """Folded 1x1 conv (models/folded.Folded1x1, canonical layout) with a
    merged single-pass Pallas backward.  Forward is the IDENTICAL XLA
    matmul expression (``x @ kron(I_f, k) + tile(bias)``); only the
    backward changes (see :func:`_1x1_bwd_kernel_body`).

    Returned: ``f(x4, kernel (1,1,ci,co), bias (co,)) -> y``.
    Reference parity: nn.Conv(features, (1,1)) on the unfolded tensor.
    """
    f, ci, co = fold, in_features, features
    dtype = jnp.dtype(dtype_name)

    def _fwd_math(x4, kernel, bias):
        k = kernel[0, 0].astype(dtype)
        wbd = jnp.kron(jnp.eye(f, dtype=dtype), k)
        return x4.astype(dtype) @ wbd + jnp.tile(bias, f).astype(dtype)

    @jax.custom_vjp
    def conv1x1(x4, kernel, bias):
        return _fwd_math(x4, kernel, bias)

    def conv1x1_fwd(x4, kernel, bias):
        return _fwd_math(x4, kernel, bias), (x4.astype(dtype), kernel)

    def conv1x1_bwd(res, ge):
        x4, kernel = res
        kt = jnp.transpose(kernel[0, 0], (1, 0)).astype(ge.dtype)
        wbt = jnp.kron(jnp.eye(f, dtype=ge.dtype), kt)  # == wbd^T
        dx, dk, db_l = _folded_1x1_bwd_pallas(
            x4, ge, wbt, ci=ci, co=co, fold=f, interpret=interpret
        )
        dk_full = dk.reshape(1, 1, ci, co).astype(kernel.dtype)
        db = db_l.reshape(f, co).sum(0)
        return dx, dk_full, db

    conv1x1.defvjp(conv1x1_fwd, conv1x1_bwd)
    return conv1x1


def _bnred_kernel_body(
    g_ref, y_ref, ab_ref, da_ref, db_ref, *, h_tile: int, wp: int, lanes: int
):
    """Accumulate the BatchNorm-affine+ReLU backward reductions grid-wide:
    ``P = where(y*a + b > 0, g, 0)``; ``da += sum P*y``; ``db += sum P``.
    Same VMEM-resident revisiting pattern as the wgrad db accumulator."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    gf = g_ref[0].astype(jnp.float32)
    yf = y_ref[0].astype(jnp.float32)
    a = ab_ref[0:1].reshape(1, 1, lanes)
    bb = ab_ref[1:2].reshape(1, 1, lanes)
    P = jnp.where(yf * a + bb > 0.0, gf, 0.0)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    da_ref[0] = da_ref[0] + jnp.sum(P * yf, axis=(0, 1))
    db_ref[0] = db_ref[0] + jnp.sum(P, axis=(0, 1))


def _bn_relu_bwd_reduce_pallas(
    g: jax.Array,
    y: jax.Array,
    ab: jax.Array,
    *,
    h_tile: int | None,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    """(da (L,), db (L,)) f32 — the per-lane reductions of the backward of
    ``z = relu(y*a + b)`` — in ONE read of (g, y).

    XLA materializes this as a full-tensor select pass plus a separate
    reduce (~10 ms/step at 512^2 batch 16, round-3 XProf: the
    divide_multiply + reduce fusions around the level-0 block backward);
    here it is a single bandwidth-bound Pallas reduction.
    """
    b, h, wp, lanes = g.shape
    ht = h_tile or _pick_h_tile(h, wp, lanes, lanes, lanes, g.dtype.itemsize)
    assert h % ht == 0, (h, ht)
    da, db = pl.pallas_call(
        functools.partial(_bnred_kernel_body, h_tile=ht, wp=wp, lanes=lanes),
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((1, ht, wp, lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, ht, wp, lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((2, lanes), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, lanes), lambda b, i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, lanes), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * g.size,
            bytes_accessed=2 * g.size * g.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g, y, ab)
    return da[0], db[0]


def _pool_fwd_kernel_body(
    z_ref, *refs, ht_o: int, wp: int, c: int, f: int, ab: bool = False
):
    """Folded 2x2 max-pool forward on a (2*ht_o, wp, f*c) tile: channel-
    slot-pair max then row-pair max (models/folded.folded_max_pool_2x2).

    ``ab``: the input is the RAW second-conv output of a fused block
    (models/folded.FoldedConvBlock raw_out); its BatchNorm-affine + ReLU
    ``u = relu(z*a + b)`` is computed here on the VMEM read, so the
    activated full-resolution tensor never exists in HBM (round-3 XProf:
    ~2.5 ms/step of affine+ReLU+cast fusions at 512^2 b16 whose only
    consumer is this pool — a custom call XLA cannot fuse into)."""
    half = f // 2
    it = iter(refs)
    ab_ref = next(it) if ab else None
    p_ref = next(it)
    z = z_ref[0].astype(jnp.float32)
    if ab:
        av = ab_ref[0:1].reshape(1, 1, f * c)
        bv = ab_ref[1:2].reshape(1, 1, f * c)
        z = jnp.maximum(z * av + bv, 0.0)
    cols = [
        jnp.maximum(
            z[..., (2 * t) * c : (2 * t + 1) * c],
            z[..., (2 * t + 1) * c : (2 * t + 2) * c],
        )
        for t in range(half)
    ]
    m = cols[0] if half == 1 else jnp.concatenate(cols, axis=-1)
    m = m.reshape(ht_o, 2, wp, half * c)
    p_ref[0] = jnp.maximum(m[:, 0], m[:, 1]).astype(p_ref.dtype)


def _pool_bwd_kernel_body(
    z_ref, dp_ref, *refs, ht_o: int, wp: int, c: int, f: int, ab: bool = False
):
    """Route ``dp`` to the argmax positions in ONE pass over (z, dp) —
    first-match ties (row 2R before 2R+1; slot 2t before 2t+1), replacing
    XLA's select/pad/interleave backward chain (~9 ms/step at 512^2 b16).

    ``ab``: the forward pooled ``u = relu(z*a + b)`` computed on read
    (see :func:`_pool_fwd_kernel_body`); the routed cotangent is then
    pushed through the activation adjoint in the same pass —
    ``dz = P*a`` with ``P = routed * (z*a + b > 0)`` — and the per-lane
    affine reductions ``da += sum(P*z)``, ``db += sum(P)`` accumulate
    grid-wide (VMEM-revisiting outputs, like the wgrad accumulators)."""
    half = f // 2
    hc = half * c
    it = iter(refs)
    ab_ref = next(it) if ab else None
    dz_ref = next(it)
    da_ref = next(it) if ab else None
    db_ref = next(it) if ab else None
    zraw = z_ref[0].astype(jnp.float32)  # (2*ht_o, wp, f*c); f32 compares
    dp = dp_ref[0].astype(jnp.float32)  # (ht_o, wp, hc)
    if ab:
        av = ab_ref[0:1].reshape(1, 1, f * c)
        bv = ab_ref[1:2].reshape(1, 1, f * c)
        pre = zraw * av + bv
        z = jnp.maximum(pre, 0.0)
    else:
        z = zraw
    a = [z[..., (2 * t) * c : (2 * t + 1) * c] for t in range(half)]
    b = [z[..., (2 * t + 1) * c : (2 * t + 2) * c] for t in range(half)]
    ca = [x >= y for x, y in zip(a, b)]
    m_t = [jnp.maximum(x, y) for x, y in zip(a, b)]
    m = m_t[0] if half == 1 else jnp.concatenate(m_t, axis=-1)
    mr = m.reshape(ht_o, 2, wp, hc)
    w0 = mr[:, 0] >= mr[:, 1]
    zero = jnp.zeros_like(dp)
    dm0 = jnp.where(w0, dp, zero)
    dm1 = jnp.where(w0, zero, dp)
    dm = jnp.concatenate(
        [dm0.reshape(ht_o, 1, wp, hc), dm1.reshape(ht_o, 1, wp, hc)], axis=1
    ).reshape(2 * ht_o, wp, hc)
    parts = []
    for t in range(half):
        dmt = dm[..., t * c : (t + 1) * c]
        zt = jnp.zeros_like(dmt)
        parts.append(jnp.where(ca[t], dmt, zt))
        parts.append(jnp.where(ca[t], zt, dmt))
    routed = jnp.concatenate(parts, axis=-1)
    if not ab:
        dz_ref[0] = routed.astype(dz_ref.dtype)
        return
    P = jnp.where(pre > 0.0, routed, 0.0)
    dz_ref[0] = (P * av).astype(dz_ref.dtype)

    bi = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    da_ref[0] = da_ref[0] + jnp.sum(P * zraw, axis=(0, 1))
    db_ref[0] = db_ref[0] + jnp.sum(P, axis=(0, 1))


@functools.lru_cache(maxsize=None)
def make_folded_pool(
    c: int, f: int = 4, h_tile: int | None = None, interpret: bool = False,
    with_ab: bool = False,
):
    """Differentiable folded 2x2 max-pool as Pallas fwd/bwd kernels.

    ``pool(z4) -> p4`` with z4 (B, H, Wp, f*c) -> p4 (B, H/2, Wp, (f/2)*c);
    exact same values as models/folded.folded_max_pool_2x2 (the backward
    uses first-match tie routing like reduce_window's select-and-scatter).
    Reference: torch F.max_pool2d in ConvBlockDownSample
    (processing_blocks.py:55-77) on the folded layout.

    ``with_ab``: ``pool(z4, ab) -> p4`` where z4 is the RAW second-conv
    output of a fused block and ab (2, f*c) f32 its BatchNorm-affine;
    ``relu(z*a + b)`` is computed on the kernels' VMEM reads (fwd and the
    backward's recompute) and the backward additionally returns the
    per-lane affine cotangent (2, f*c) — so the activated full-res tensor
    never exists in HBM in either direction.
    """
    half = f // 2

    def _fwd_pallas(z4, ab=None):
        bsz, h, wp, lanes = z4.shape
        ho = h // 2
        ht_o = h_tile or next(
            t for t in (16, 8, 4, 2, 1)
            if ho % t == 0
            and 2 * t * wp * lanes * 12 <= 12 * 1024 * 1024
        )
        in_specs = [
            pl.BlockSpec((1, 2 * ht_o, wp, lanes), lambda b, i: (b, i, 0, 0))
        ]
        args = [z4]
        if with_ab:
            in_specs.append(pl.BlockSpec((2, lanes), lambda b, i: (0, 0)))
            args.append(ab)
        return pl.pallas_call(
            functools.partial(
                _pool_fwd_kernel_body, ht_o=ht_o, wp=wp, c=c, f=f,
                ab=with_ab,
            ),
            grid=(bsz, ho // ht_o),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, ht_o, wp, half * c), lambda b, i: (b, i, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (bsz, ho, wp, half * c), z4.dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * z4.size,
                bytes_accessed=z4.size * z4.dtype.itemsize * 3 // 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)

    def _bwd_pallas(z4, ab, dp):
        bsz, h, wp, lanes = z4.shape
        ho = h // 2
        ht_o = h_tile or next(
            t for t in (16, 8, 4, 2, 1)
            if ho % t == 0
            and 2 * t * wp * lanes * 16 <= 12 * 1024 * 1024
        )
        in_specs = [
            pl.BlockSpec((1, 2 * ht_o, wp, lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, ht_o, wp, half * c), lambda b, i: (b, i, 0, 0)),
        ]
        args = [z4, dp]
        out_specs = [
            pl.BlockSpec((1, 2 * ht_o, wp, lanes), lambda b, i: (b, i, 0, 0)),
        ]
        out_shape = [jax.ShapeDtypeStruct(z4.shape, z4.dtype)]
        if with_ab:
            in_specs.append(pl.BlockSpec((2, lanes), lambda b, i: (0, 0)))
            args.append(ab)
            out_specs.extend([
                pl.BlockSpec((1, lanes), lambda b, i: (0, 0)),
                pl.BlockSpec((1, lanes), lambda b, i: (0, 0)),
            ])
            out_shape.extend([
                jax.ShapeDtypeStruct((1, lanes), jnp.float32),
                jax.ShapeDtypeStruct((1, lanes), jnp.float32),
            ])
        res = pl.pallas_call(
            functools.partial(
                _pool_bwd_kernel_body, ht_o=ht_o, wp=wp, c=c, f=f,
                ab=with_ab,
            ),
            grid=(bsz, ho // ht_o),
            in_specs=in_specs,
            out_specs=out_specs if with_ab else out_specs[0],
            out_shape=out_shape if with_ab else out_shape[0],
            cost_estimate=pl.CostEstimate(
                flops=4 * z4.size,
                bytes_accessed=z4.size * z4.dtype.itemsize * 5 // 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
        if not with_ab:
            return res, None
        dz, da, db = res
        return dz, jnp.concatenate([da, db], axis=0)

    if with_ab:
        @jax.custom_vjp
        def pool_ab(z4, ab):
            return _fwd_pallas(z4, ab)

        def pool_ab_fwd(z4, ab):
            return _fwd_pallas(z4, ab), (z4, ab)

        def pool_ab_bwd(res, dp):
            z4, ab = res
            dz, dab = _bwd_pallas(z4, ab, dp)
            return dz, dab

        pool_ab.defvjp(pool_ab_fwd, pool_ab_bwd)
        return pool_ab

    @jax.custom_vjp
    def pool(z4):
        return _fwd_pallas(z4)

    def pool_fwd(z4):
        return _fwd_pallas(z4), z4

    def pool_bwd(z4, dp):
        dz, _ = _bwd_pallas(z4, None, dp)
        return (dz,)

    pool.defvjp(pool_fwd, pool_bwd)
    return pool


def _ct_fwd_kernel_body(
    x_ref, kp_ref, bias_ref, out_ref, *, ht: int, wpm: int, mcin: int, fco: int
):
    """ConvTranspose(2x2, s=2) tile: one matmul, rows interleaved IN VMEM
    (the XLA lowering materializes the (.., 2, ..) transpose through HBM)."""
    xv = x_ref[0].reshape(ht * wpm, mcin)
    e = jax.lax.dot_general(
        xv, kp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (ht*wpm, 2*fco): dy-major columns
    e0 = e[:, :fco].reshape(ht, 1, wpm, fco)
    e1 = e[:, fco:].reshape(ht, 1, wpm, fco)
    out = jnp.concatenate([e0, e1], axis=1).reshape(2 * ht, wpm, fco)
    out_ref[0] = (out + bias_ref[0].reshape(1, 1, fco)).astype(out_ref.dtype)


def _ct_bwd_kernel_body(
    g_ref, x_ref, kpt_ref, dx_ref, dkp_ref, db_ref,
    *, ht: int, wpm: int, mcin: int, fco: int,
):
    """dx + grid-accumulated (dkp, db) in one pass over (g, x)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    g2 = g_ref[0]  # (2*ht, wpm, fco)
    gr = g2.reshape(ht, 2, wpm, fco)
    de = jnp.concatenate([gr[:, 0], gr[:, 1]], axis=-1).reshape(
        ht * wpm, 2 * fco
    )
    dxv = jax.lax.dot_general(
        de, kpt_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[0] = dxv.reshape(ht, wpm, mcin).astype(dx_ref.dtype)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dkp_ref[...] = jnp.zeros_like(dkp_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    xv = x_ref[0].reshape(ht * wpm, mcin)
    dkp_ref[...] = dkp_ref[...] + jax.lax.dot_general(
        xv, de, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[0] = db_ref[0] + jnp.sum(
        g2.astype(jnp.float32).reshape(2 * ht * wpm, fco), axis=0
    )


@functools.lru_cache(maxsize=None)
def make_folded_convtranspose2x2(
    in_features: int,
    features: int,
    fold: int = 4,
    h_tile: int | None = None,
    interpret: bool = False,
):
    """Differentiable ConvTranspose(k=2, s=2) from an m-folded input to an
    f-folded output as Pallas fwd/bwd kernels.

    ``ct(xf, kernel, bias) -> y4`` with
      xf: (B, Hin, Win/m, m*Cin), m = fold//2  (free reshape of the
          unfolded (B, Hin, Win, Cin) input)
      kernel: (2, 2, Cin, Co) — the UNfolded nn.ConvTranspose parameter
      bias: (Co,)
      y4: (B, 2*Hin, Win/m, fold*Co)
    Same math as models/folded.FoldedConvTranspose2x2's einsum path
    (reference up-convs, processing_blocks.py:80-107), but the row
    interleave happens in VMEM instead of as an XLA transpose+copy chain
    (~6 ms/step fwd+bwd at the 512^2 decoder level, round-3 XProf).
    """
    f, ci, co = fold, in_features, features
    m = f // 2
    mcin = m * ci
    fco = f * co

    def _build_kp(kernel, dt):
        # flax ConvTranspose(k=2, s=2, VALID) applies the kernel FLIPPED
        # (models/folded.py:478-488): out[2i+dy, f*J+v] uses K[1-dy, 1-dx]
        # with v = 2*mm + dx.
        k = kernel.astype(dt)[::-1, ::-1]
        kp = jnp.zeros((m, ci, 2, f, co), dt)
        for mm in range(m):
            for dx in range(2):
                kp = kp.at[mm, :, :, 2 * mm + dx, :].set(
                    jnp.transpose(k[:, dx], (1, 0, 2))
                )
        return kp.reshape(mcin, 2 * fco)

    def _dk_from_dkp(dkp, dtype):
        # adjoint of _build_kp: gather the block-sparse slots back, unflip.
        dkp5 = dkp.reshape(m, ci, 2, f, co)
        cols = []
        for dx in range(2):
            # dk_k[:, dx, c, o] = sum_mm dkp5[mm, c, :, 2mm+dx, :]
            acc = sum(dkp5[mm, :, :, 2 * mm + dx, :] for mm in range(m))
            cols.append(jnp.transpose(acc, (1, 0, 2)))  # (2, ci, co)
        dk_k = jnp.stack(cols, axis=1)  # (2, 2, ci, co)
        return dk_k[::-1, ::-1].astype(dtype)

    def _pick_ht(h, wpm):
        lim = 12 * 1024 * 1024
        for t in (32, 16, 8, 4, 2, 1):
            if h % t == 0 and t * wpm * (mcin + 2 * fco) * 12 <= lim:
                return t
        return 1

    def _fwd_pallas(xf, kp, bias_f):
        bsz, h, wpm, _ = xf.shape
        ht = h_tile or _pick_ht(h, wpm)
        return pl.pallas_call(
            functools.partial(
                _ct_fwd_kernel_body, ht=ht, wpm=wpm, mcin=mcin, fco=fco
            ),
            grid=(bsz, h // ht),
            in_specs=[
                pl.BlockSpec((1, ht, wpm, mcin), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((mcin, 2 * fco), lambda b, i: (0, 0)),
                pl.BlockSpec((1, fco), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 2 * ht, wpm, fco), lambda b, i: (b, i, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, 2 * h, wpm, fco), xf.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * bsz * h * wpm * mcin * 2 * fco,
                bytes_accessed=3 * bsz * h * wpm * mcin * xf.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(xf, kp, bias_f)

    @jax.custom_vjp
    def ct(xf, kernel, bias):
        dt = xf.dtype
        return _fwd_pallas(
            xf, _build_kp(kernel, dt),
            jnp.tile(bias, f).reshape(1, fco).astype(jnp.float32),
        )

    def ct_fwd(xf, kernel, bias):
        return ct(xf, kernel, bias), (xf, kernel)

    def ct_bwd(res, g):
        xf, kernel = res
        dt = xf.dtype
        bsz, h, wpm, _ = xf.shape
        ht = h_tile or _pick_ht(h, wpm)
        kpt = _build_kp(kernel, dt).T  # (2*fco, mcin)
        dx, dkp, db = pl.pallas_call(
            functools.partial(
                _ct_bwd_kernel_body, ht=ht, wpm=wpm, mcin=mcin, fco=fco
            ),
            grid=(bsz, h // ht),
            in_specs=[
                pl.BlockSpec(
                    (1, 2 * ht, wpm, fco), lambda b, i: (b, i, 0, 0)
                ),
                pl.BlockSpec((1, ht, wpm, mcin), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((2 * fco, mcin), lambda b, i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, ht, wpm, mcin), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((mcin, 2 * fco), lambda b, i: (0, 0)),
                pl.BlockSpec((1, fco), lambda b, i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(xf.shape, xf.dtype),
                jax.ShapeDtypeStruct((mcin, 2 * fco), jnp.float32),
                jax.ShapeDtypeStruct((1, fco), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * bsz * h * wpm * mcin * 2 * fco,
                bytes_accessed=4 * bsz * h * wpm * mcin * xf.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(g, xf, kpt)
        dk = _dk_from_dkp(dkp, kernel.dtype)
        dbias = db[0].reshape(f, co).sum(0).astype(kernel.dtype)
        return dx, dk, dbias

    ct.defvjp(ct_fwd, ct_bwd)
    return ct


@functools.lru_cache(maxsize=None)
def make_folded_conv3x3(
    in_features: int,
    features: int,
    fold: int = 4,
    in_perm: tuple | None = None,
    h_tile: int | None = None,
    interpret: bool = False,
):
    """Factory for a differentiable folded 3x3 SAME conv.

    Returns ``f(x4, kernel, bias) -> y4`` with
      x4: (B, H, W/fold, fold*in_features)  (lanes optionally permuted by
          ``in_perm``: in_perm[actual_lane] = canonical slot-major index)
      kernel: (3, 3, in_features, features)  — the UNfolded parameter
      bias: (features,)
      y4: (B, H, W/fold, fold*features)     — canonical slot-major lanes
    """
    f, ci, co = fold, in_features, features
    lanes = f * ci
    perm = (
        np.arange(lanes, dtype=np.int64)
        if in_perm is None
        else np.asarray(in_perm, np.int64)
    )
    assert perm.shape == (lanes,)
    prev_runs = tuple(_slot_runs(perm, ci, f - 1))
    next_runs = tuple(_slot_runs(perm, ci, 0))
    # weight row order must match the kernel's aug lanes:
    # [prev (canonical t=0), mid (actual layout), next (canonical t=f+1)]
    row_map = np.concatenate(
        [np.arange(ci), ci + perm, (f + 1) * ci + np.arange(ci)]
    )
    # adjoint reorder for the wgrad kernel's dkp rows (kernel -> canonical):
    # dkp_canon[row_map[r]] = dkp_kernel[r]
    inv_row_map = np.argsort(row_map)

    canonical = in_perm is None
    g_fwd = _pick_subfold(f, co, canonical)
    g_dx = _pick_subfold(f, ci, canonical)

    def fwd_impl(x4, kernel, bias):
        bias_f = jnp.tile(bias, f).reshape(1, f * co).astype(jnp.float32)
        if g_fwd < f:
            wm = _subfold_matrices(kernel, f, g_fwd, x4.dtype)
        else:
            wm = _halo_matrices(kernel, f, x4.dtype)[:, row_map, :]
        return _folded_conv_pallas(
            x4, wm, bias_f,
            fold=f, ci=ci, prev_runs=prev_runs, next_runs=next_runs,
            h_tile=h_tile, interpret=interpret,
            subfold=g_fwd if g_fwd < f else 0,
        )

    @jax.custom_vjp
    def conv(x4, kernel, bias):
        return fwd_impl(x4, kernel, bias)

    def conv_fwd(x4, kernel, bias):
        return fwd_impl(x4, kernel, bias), (x4, kernel)

    def conv_bwd(res, g):
        x4, kernel = res
        # ---- dx: conv of g with the flipped, in/out-transposed kernel.
        kb = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))  # (3,3,Co,Ci)
        if g_dx < f:
            wb = _subfold_matrices(kb, f, g_dx, g.dtype)
        else:
            wb = _halo_matrices(kb, f, g.dtype)  # (3, (f+2)*Co, f*Ci)
            # output lanes must come back in the ACTUAL layout: dx_act[j] =
            # dx_canon[perm[j]] — a zero-cost column permutation of the
            # weights (identity when canonical, the subfold case).
            wb = wb[:, :, perm]
        zeros_ci = jnp.zeros((f * ci,), jnp.float32).reshape(1, f * ci)
        dx = _folded_conv_pallas(
            g, wb, zeros_ci,
            fold=f, ci=co,
            prev_runs=((((f - 1) * co), co),),
            next_runs=((0, co),),
            h_tile=h_tile, interpret=interpret,
            subfold=g_dx if g_dx < f else 0,
        )
        # ---- dw/db: one fused Pallas pass over x and g (the XLA einsum
        # formulation materialized full-tensor shifted copies of x per dy
        # — measured ~15 ms/step of pure HBM traffic at B16 512^2).
        dkp_k, db_f = _folded_wgrad_pallas(
            x4, g,
            ci=ci, prev_runs=prev_runs, next_runs=next_runs,
            h_tile=h_tile, interpret=interpret,
            subfold=g_fwd if g_fwd < f else 0,
        )
        # kernel rows [prev | ACTUAL mid | next] -> canonical (f+2)*ci rows
        dkp = dkp_k[:, inv_row_map, :]
        dw = _wgrad_from_halo(dkp, f, ci, co).astype(kernel.dtype)
        db = db_f.reshape(f, co).sum(axis=0)
        return dx, dw, db

    conv.defvjp(conv_fwd, conv_bwd)
    return conv


@functools.lru_cache(maxsize=None)
def make_folded_conv_bn3x3(
    in_features: int,
    features: int,
    fold: int = 4,
    in_perm: tuple | None = None,
    pre: bool = False,
    stats: bool = False,
    h_tile: int | None = None,
    interpret: bool = False,
    in_split: int | None = None,
):
    """Fused folded conv: optional BatchNorm-apply + ReLU folded into the
    slab read ("pre"), optional batch-statistic epilogue ("stats").

    ``in_split``: the input is the VMEM lane concat of two arrays (see
    :func:`make_folded_block`); the returned function takes
    ``(x4a, x4b, kernel, bias)`` and dx comes back pre-split.  Only
    supported without ``pre`` (the decoder concat inputs are already
    activated).

    Returned function (argument/return structure depends on the flags):

      ``f(x4, kernel, bias[, a, b])`` -> ``y`` or ``(y, s1, s2)``

      - ``a``, ``b`` (with ``pre``): per-INPUT-channel f32 affine; the
        kernel computes ``conv(relu(x * a + b))`` — i.e. the preceding
        BatchNorm's resolved scale/shift + ReLU, never materialized.
      - ``s1``, ``s2`` (with ``stats``): per-OUTPUT-channel f32 sums of the
        conv output and its square (the counts are static), i.e. the next
        BatchNorm's batch statistics without a full-tensor reduce pass.

    Fully differentiable: dx applies the pre-op adjoint in-kernel (mask
    recomputed from x; da/db accumulated grid-wide), dw/db contract the
    re-activated slab, and stats cotangents fold into the output cotangent
    as one fused elementwise.

    Reference parity: conv == reference ConvBlock conv, BN semantics ==
    torch.nn.BatchNorm2d batch stats (processing_blocks.py:15-35); the
    fusion only moves where the same math happens.
    """
    f, ci, co = fold, in_features, features
    lanes = f * ci
    perm = (
        np.arange(lanes, dtype=np.int64)
        if in_perm is None
        else np.asarray(in_perm, np.int64)
    )
    assert perm.shape == (lanes,)
    prev_runs = tuple(_slot_runs(perm, ci, f - 1))
    next_runs = tuple(_slot_runs(perm, ci, 0))
    row_map = np.concatenate(
        [np.arange(ci), ci + perm, (f + 1) * ci + np.arange(ci)]
    )
    inv_row_map = np.argsort(row_map)
    # channel of each ACTUAL lane of x4, and of each aug lane.
    # NB: keep these as NUMPY in the closure — the factory is lru_cached,
    # and a jnp constant created during the first caller's trace is a
    # TRACER that leaks into every later trace reusing the cached closure
    # (UnexpectedTracerError in the Evaluator's per-sweep jits).
    chan_act = perm % ci
    # fold per-actual-lane accumulations back to per-channel: (lanes, ci)
    lane2chan = np.zeros((lanes, ci), np.float32)
    lane2chan[np.arange(lanes), chan_act] = 1.0

    assert not (pre and in_split is not None)

    canonical = in_perm is None and in_split is None
    g_fwd = _pick_subfold(f, co, canonical)
    g_dx = _pick_subfold(f, ci, canonical)

    def _ab_pre(a, b, dtype):
        # per ACTUAL lane of x4 (the kernels activate the raw slab reads)
        return jnp.stack([a[chan_act], b[chan_act]]).astype(dtype)

    def fwd_impl(x4, x4b, kernel, bias, a, b):
        if g_fwd < f:
            wm = _subfold_matrices(kernel, f, g_fwd, x4.dtype)
        else:
            wm = _halo_matrices(kernel, f, x4.dtype)[:, row_map, :]
        bias_f = jnp.tile(bias, f).reshape(1, f * co).astype(jnp.float32)
        ab = _ab_pre(a, b, x4.dtype) if pre else None
        res = _folded_conv_pallas(
            x4, wm, bias_f,
            fold=f, ci=ci, prev_runs=prev_runs, next_runs=next_runs,
            h_tile=h_tile, interpret=interpret,
            ab_pre=ab, stats=stats, x4b=x4b,
            subfold=g_fwd if g_fwd < f else 0,
        )
        if not stats:
            return res
        y, s1l, s2l = res
        return y, s1l.reshape(f, co).sum(0), s2l.reshape(f, co).sum(0)

    def conv_bwd(res, ct):
        x4, x4b, kernel, a, b, y = res
        if stats:
            gy, gs1, gs2 = ct
            gyf = gy.astype(jnp.float32)
            ge = (
                gyf + jnp.tile(gs1, f) + 2.0 * y.astype(jnp.float32) * jnp.tile(gs2, f)
            ).astype(gy.dtype)
        else:
            ge = ct
        # ---- dx (+ da/db of the pre-op affine)
        kb = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))
        if g_dx < f:
            wb = _subfold_matrices(kb, f, g_dx, ge.dtype)
        else:
            wb = _halo_matrices(kb, f, ge.dtype)[:, :, perm]
        zeros_b = jnp.zeros((1, f * ci), jnp.float32)
        if pre:
            ab_post = jnp.stack([a[chan_act], b[chan_act]]).astype(x4.dtype)
            dx, da_l, dbp_l = _folded_conv_pallas(
                ge, wb, zeros_b,
                fold=f, ci=co,
                prev_runs=((((f - 1) * co), co),),
                next_runs=((0, co),),
                h_tile=h_tile, interpret=interpret,
                x_post=x4, ab_post=ab_post,
                subfold=g_dx if g_dx < f else 0,
            )
            da = da_l @ lane2chan
            dbp = dbp_l @ lane2chan
        else:
            dx = _folded_conv_pallas(
                ge, wb, zeros_b,
                fold=f, ci=co,
                prev_runs=((((f - 1) * co), co),),
                next_runs=((0, co),),
                h_tile=h_tile, interpret=interpret,
                split_out=(
                    None if in_split is None
                    else (in_split, lanes - in_split)
                ),
                subfold=g_dx if g_dx < f else 0,
            )
        # ---- dw/db on the (re-activated) slab
        ab = _ab_pre(a, b, x4.dtype) if pre else None
        dkp_k, db_f = _folded_wgrad_pallas(
            x4, ge,
            ci=ci, prev_runs=prev_runs, next_runs=next_runs,
            h_tile=h_tile, interpret=interpret, ab_pre=ab, x4b=x4b,
            subfold=g_fwd if g_fwd < f else 0,
        )
        dkp = dkp_k[:, inv_row_map, :]
        dw = _wgrad_from_halo(dkp, f, ci, co).astype(kernel.dtype)
        db = db_f.reshape(f, co).sum(axis=0)
        if pre:
            return dx, dw, db, da, dbp
        if in_split is not None:
            dxa, dxb = dx
            return dxa, dxb, dw, db
        return dx, dw, db

    if pre:
        @jax.custom_vjp
        def conv(x4, kernel, bias, a, b):
            return fwd_impl(x4, None, kernel, bias, a, b)

        def conv_fwd(x4, kernel, bias, a, b):
            out = fwd_impl(x4, None, kernel, bias, a, b)
            y = out[0] if stats else out
            return out, (x4, None, kernel, a, b, y if stats else None)

        conv.defvjp(conv_fwd, conv_bwd)
        return conv

    if in_split is not None:
        @jax.custom_vjp
        def conv_dual(x4a, x4b, kernel, bias):
            return fwd_impl(x4a, x4b, kernel, bias, None, None)

        def conv_dual_fwd(x4a, x4b, kernel, bias):
            out = fwd_impl(x4a, x4b, kernel, bias, None, None)
            y = out[0] if stats else out
            return out, (x4a, x4b, kernel, None, None, y if stats else None)

        conv_dual.defvjp(conv_dual_fwd, conv_bwd)
        return conv_dual

    @jax.custom_vjp
    def conv_nopre(x4, kernel, bias):
        return fwd_impl(x4, None, kernel, bias, None, None)

    def conv_nopre_fwd(x4, kernel, bias):
        out = fwd_impl(x4, None, kernel, bias, None, None)
        y = out[0] if stats else out
        return out, (x4, None, kernel, None, None, y if stats else None)

    conv_nopre.defvjp(conv_nopre_fwd, conv_bwd)
    return conv_nopre


@functools.lru_cache(maxsize=None)
def make_folded_block(
    in_features: int,
    features: int,
    fold: int = 4,
    in_perm: tuple | None = None,
    eps: float = 1e-5,
    h_tile: int | None = None,
    interpret: bool = False,
    in_split: int | None = None,
    raw_out: bool = False,
    input_grad: bool = True,
):
    """The whole training-mode [Conv-BN-ReLU]x2 folded block as ONE
    custom-vjp node.

    ``input_grad=False``: the caller guarantees the block-input cotangent
    is never consumed (the block reads a non-differentiated model INPUT —
    e.g. the prompt encoder's first block on the raw heatmap).  The
    backward then runs conv1 as a wgrad-only kernel (no ge-slab dx dots,
    no dx HBM write — XLA cannot dead-code-eliminate inside the opaque
    custom call, so the merged dx+wgrad kernel would compute it anyway)
    and returns symbolic zeros for dx.  Parameter gradients are unchanged
    (tests/test_pallas_conv.py pins them against the input_grad=True
    path).

    Forward (identical math to the composed path): conv1 with a batch-stat
    epilogue -> bn1 affine resolved from (S1, Q1) -> conv2 with bn1-apply +
    ReLU folded into the slab read and its own stat epilogue -> bn2 affine
    -> ``z = relu(y2 * a2 + b2)``.

    Backward is hand-composed so the BatchNorm backward elementwise that
    XLA otherwise materializes between the conv kernels (the cotangent
    stats-fold ``ge = g + dS + 2*y*dQ`` and the affine-relu adjoint
    ``g*mask*a``) is computed INSIDE the Pallas kernels' operand reads
    (``gfold``) — at 512^2 batch 16 those XLA passes cost ~12 ms/step
    (round-3 XProf).  The per-channel scalar chains (S, Q, scale, bias) ->
    (a, b, mean, var) are differentiated with ``jax.vjp`` on the tiny
    scalar function, so they match the autodiff path exactly.

    Returns ``block(x4, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2) ->
    (z, mean1, var1, mean2, var2)`` — the means/vars feed the module's
    running-average update (no gradient flows through them).

    ``in_split`` (lane count of the first part): the block input is the
    lane concat of TWO separately-stored arrays (the decoder's
    [up | skip]) and the returned function takes ``(x4a, x4b, k1, ...)``;
    the concat happens in VMEM on every kernel read and the input
    gradient comes back pre-split ``(dxa, dxb, ...)`` — the 2C-lane concat
    buffer (and its backward lane-split) never exist in HBM (~2.8 + 1.6
    ms/step at B16 512^2, round-3 XProf ``pad_maximum`` / ``split`` ops).

    Reference parity: the composition equals reference ConvBlock
    (processing_blocks.py:21-52) on the folded layout; equivalence incl.
    all gradients vs the dense path is asserted in tests/test_pallas_conv.py.
    """
    f, ci, co = fold, in_features, features
    lanes1, lanes2 = f * ci, f * co
    perm = (
        np.arange(lanes1, dtype=np.int64)
        if in_perm is None
        else np.asarray(in_perm, np.int64)
    )
    assert perm.shape == (lanes1,)
    prev1 = tuple(_slot_runs(perm, ci, f - 1))
    next1 = tuple(_slot_runs(perm, ci, 0))
    row_map1 = np.concatenate(
        [np.arange(ci), ci + perm, (f + 1) * ci + np.arange(ci)]
    )
    inv_row_map1 = np.argsort(row_map1)
    # conv2 input and both cotangent sides are canonical co lanes.
    prev2 = (((f - 1) * co, co),)
    next2 = ((0, co),)
    chan2 = np.arange(lanes2) % co

    canonical1 = in_perm is None and in_split is None
    g1 = _pick_subfold(f, co, canonical1)      # conv1 fwd / wgrad
    g1dx = _pick_subfold(f, ci, canonical1)    # conv1 dx (f*ci out lanes)
    g2 = _pick_subfold(f, co, True)            # conv2 fwd / dx / wgrad
    merged_bwd = _merged_bwd_enabled()         # fused dx+wgrad kernels

    def bn_scalars(S, Q, scale, bias, n):
        mean = S / n
        var = jnp.maximum(0.0, Q / n - mean * mean)
        a = jax.lax.rsqrt(var + eps) * scale
        b = bias - mean * a
        return a, b, mean, var

    def fwd_impl(x4, x4b, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2):
        bsz, h, wp, _ = x4.shape
        n = bsz * h * wp * f
        dt = x4.dtype
        if g1 < f:
            wm1 = _subfold_matrices(k1, f, g1, dt)
        else:
            wm1 = _halo_matrices(k1, f, dt)[:, row_map1, :]
        b1f = jnp.tile(c1b, f).reshape(1, lanes2).astype(jnp.float32)
        y1, S1l, Q1l = _folded_conv_pallas(
            x4, wm1, b1f, fold=f, ci=ci, prev_runs=prev1, next_runs=next1,
            h_tile=h_tile, interpret=interpret, stats=True, x4b=x4b,
            subfold=g1 if g1 < f else 0,
        )
        S1 = S1l.reshape(f, co).sum(0)
        Q1 = Q1l.reshape(f, co).sum(0)
        a1, b1, mean1, var1 = bn_scalars(S1, Q1, scale1, bias1, n)
        ab1 = jnp.stack([a1[chan2], b1[chan2]]).astype(dt)
        wm2 = (
            _subfold_matrices(k2, f, g2, dt)
            if g2 < f else _halo_matrices(k2, f, dt)
        )
        b2f = jnp.tile(c2b, f).reshape(1, lanes2).astype(jnp.float32)
        y2, S2l, Q2l = _folded_conv_pallas(
            y1, wm2, b2f, fold=f, ci=co, prev_runs=prev2, next_runs=next2,
            h_tile=h_tile, interpret=interpret, ab_pre=ab1, stats=True,
            subfold=g2 if g2 < f else 0,
        )
        S2 = S2l.reshape(f, co).sum(0)
        Q2 = Q2l.reshape(f, co).sum(0)
        a2, b2, mean2, var2 = bn_scalars(S2, Q2, scale2, bias2, n)
        # dt-rounded scalars, f32 affine: the SAME computation the backward
        # mask kernels use (_bnred_kernel_body / _gfold_transform), so the
        # forward activation and the backward ReLU gating agree bit-for-bit
        # at borderline positions in bf16 too (layer 1 already works this
        # way via ab1 + the in-kernel f32 act()).
        if raw_out:
            # bn2-apply + ReLU are computed by the CONSUMER's kernel read
            # (e.g. the pool's with_ab mode) from the returned batch stats;
            # the activated tensor never exists in HBM.
            z = y2
        else:
            a2f = jnp.tile(a2, f).astype(dt).astype(jnp.float32)
            b2f = jnp.tile(b2, f).astype(dt).astype(jnp.float32)
            z = jnp.maximum(
                y2.astype(jnp.float32) * a2f + b2f, 0.0
            ).astype(dt)
        out = (z, mean1, var1, mean2, var2)
        res = (
            x4, x4b, y1, y2, k1, k2, S1, Q1, S2, Q2,
            scale1, bias1, scale2, bias2, a1, b1, a2, b2,
        )
        return out, res

    def block_bwd(res, ct):
        (
            x4, x4b, y1, y2, k1, k2, S1, Q1, S2, Q2,
            scale1, bias1, scale2, bias2, a1, b1, a2, b2,
        ) = res
        dz, dmean1ct, dvar1ct, dmean2ct, dvar2ct = ct
        bsz, h, wp, _ = x4.shape
        n = bsz * h * wp * f
        dt = x4.dtype

        if raw_out:
            # The affine-relu adjoint happened in the CONSUMER's backward
            # (dz is already the cotangent on RAW y2, and da2/db2 flow to
            # scale2/bias2 through the module-level affine formulas as
            # mean2/var2 cotangents).  Only the batch-stat fold remains.
            da2 = db2 = jnp.zeros_like(S2)
        else:
            # bn2 affine-relu backward reductions: one Pallas reduction
            # pass over (dz, y2) instead of XLA's full-tensor select +
            # reduce.  dt-rounded scalars to match the forward's
            # activation mask exactly.
            a2l = jnp.tile(a2, f).astype(dt).astype(jnp.float32)
            b2l = jnp.tile(b2, f).astype(dt).astype(jnp.float32)
            ab2 = jnp.stack([a2l, b2l])
            da2_l, db2_l = _bn_relu_bwd_reduce_pallas(
                dz, y2, ab2, h_tile=h_tile, interpret=interpret
            )
            da2 = da2_l.reshape(f, co).sum(0)
            db2 = db2_l.reshape(f, co).sum(0)

        _, pull2 = jax.vjp(
            lambda S, Q, sc, bi: bn_scalars(S, Q, sc, bi, n),
            S2, Q2, scale2, bias2,
        )
        dS2, dQ2, dscale2, dbias2 = pull2((da2, db2, dmean2ct, dvar2ct))
        if raw_out:
            gf2 = jnp.stack(
                [jnp.tile(dS2, f), jnp.tile(dQ2, f)]
            ).astype(jnp.float32)
        else:
            gf2 = jnp.stack(
                [a2l, b2l, jnp.tile(dS2, f), jnp.tile(dQ2, f)]
            ).astype(jnp.float32)

        # conv2 dx: ge2 computed on slab read; pre-op adjoint emits gy1
        # plus the bn1 affine reductions grid-wide.
        kb2 = jnp.transpose(k2[::-1, ::-1], (0, 1, 3, 2))
        wb2 = (
            _subfold_matrices(kb2, f, g2, dz.dtype)
            if g2 < f else _halo_matrices(kb2, f, dz.dtype)
        )
        zeros2 = jnp.zeros((1, lanes2), jnp.float32)
        ab1 = jnp.stack([a1[chan2], b1[chan2]]).astype(dt)
        if merged_bwd:
            gy1, dkp2, dc2b_f, da1_l, db1_l = _folded_bwd_fused_pallas(
                dz, y1, wb2,
                fold=f, ci_dx=co, ci_w=co, n_dx=lanes2,
                prev_dx=prev2, next_dx=next2, prev_w=prev2, next_w=next2,
                h_tile=h_tile, interpret=interpret,
                g_y=y2, gf_consts=gf2,
                gfold="stats" if raw_out else "affine",
                ab_post=ab1, ab_pre=ab1,
                sub_dx=g2 if g2 < f else 0, sub_w=g2 if g2 < f else 0,
            )
        else:
            gy1, da1_l, db1_l = _folded_conv_pallas(
                dz, wb2, zeros2, fold=f, ci=co,
                prev_runs=prev2, next_runs=next2,
                h_tile=h_tile, interpret=interpret,
                x_post=y1, ab_post=ab1,
                g_y=y2, gf_consts=gf2,
                gfold="stats" if raw_out else "affine",
                subfold=g2 if g2 < f else 0,
            )
            dkp2, dc2b_f = _folded_wgrad_pallas(
                y1, dz, ci=co, prev_runs=prev2, next_runs=next2,
                h_tile=h_tile, interpret=interpret,
                ab_pre=ab1, g_y=y2, gf_consts=gf2,
                gfold="stats" if raw_out else "affine",
                subfold=g2 if g2 < f else 0,
            )
        dk2 = _wgrad_from_halo(dkp2, f, co, co).astype(k2.dtype)
        dc2b = dc2b_f.reshape(f, co).sum(0)

        # bn1 scalar chain.
        da1 = da1_l.reshape(f, co).sum(0)
        db1 = db1_l.reshape(f, co).sum(0)
        _, pull1 = jax.vjp(
            lambda S, Q, sc, bi: bn_scalars(S, Q, sc, bi, n),
            S1, Q1, scale1, bias1,
        )
        dS1, dQ1, dscale1, dbias1 = pull1((da1, db1, dmean1ct, dvar1ct))
        gf1 = jnp.stack([jnp.tile(dS1, f), jnp.tile(dQ1, f)]).astype(
            jnp.float32
        )

        # conv1 dx/wgrad: ge1 = gy1 + dS1 + 2*y1*dQ1 computed on read.
        if not input_grad:
            # wgrad-only conv1 backward: the input cotangent is unused by
            # contract, so skip the dx dots and the dx HBM write entirely.
            dkp1, dc1b_f = _folded_wgrad_pallas(
                x4, gy1, ci=ci, prev_runs=prev1, next_runs=next1,
                h_tile=h_tile, interpret=interpret,
                g_y=y1, gf_consts=gf1, gfold="stats", x4b=x4b,
                subfold=g1 if g1 < f else 0,
            )
            dk1 = _wgrad_from_halo(
                dkp1[:, inv_row_map1, :], f, ci, co
            ).astype(k1.dtype)
            dc1b = dc1b_f.reshape(f, co).sum(0)
            tail = (dk1, dc1b, dk2, dc2b, dscale1, dbias1, dscale2, dbias2)
            if in_split is None:
                return (jnp.zeros_like(x4),) + tail
            return (jnp.zeros_like(x4), jnp.zeros_like(x4b)) + tail
        kb1 = jnp.transpose(k1[::-1, ::-1], (0, 1, 3, 2))
        if g1dx < f:
            wb1 = _subfold_matrices(kb1, f, g1dx, dz.dtype)
        else:
            wb1 = _halo_matrices(kb1, f, dz.dtype)[:, :, perm]
        zeros1 = jnp.zeros((1, lanes1), jnp.float32)
        if merged_bwd:
            dx4, dkp1, dc1b_f = _folded_bwd_fused_pallas(
                gy1, x4, wb1,
                fold=f, ci_dx=co, ci_w=ci, n_dx=lanes1,
                prev_dx=prev2, next_dx=next2, prev_w=prev1, next_w=next1,
                h_tile=h_tile, interpret=interpret,
                g_y=y1, gf_consts=gf1, gfold="stats", xwb=x4b,
                split_out=(
                    None if in_split is None
                    else (in_split, lanes1 - in_split)
                ),
                sub_dx=g1dx if g1dx < f else 0, sub_w=g1 if g1 < f else 0,
            )
        else:
            dx4 = _folded_conv_pallas(
                gy1, wb1, zeros1, fold=f, ci=co,
                prev_runs=prev2, next_runs=next2,
                h_tile=h_tile, interpret=interpret,
                g_y=y1, gf_consts=gf1, gfold="stats",
                split_out=(
                    None if in_split is None
                    else (in_split, lanes1 - in_split)
                ),
                subfold=g1dx if g1dx < f else 0,
            )
            dkp1, dc1b_f = _folded_wgrad_pallas(
                x4, gy1, ci=ci, prev_runs=prev1, next_runs=next1,
                h_tile=h_tile, interpret=interpret,
                g_y=y1, gf_consts=gf1, gfold="stats", x4b=x4b,
                subfold=g1 if g1 < f else 0,
            )
        dk1 = _wgrad_from_halo(
            dkp1[:, inv_row_map1, :], f, ci, co
        ).astype(k1.dtype)
        dc1b = dc1b_f.reshape(f, co).sum(0)
        tail = (dk1, dc1b, dk2, dc2b, dscale1, dbias1, dscale2, dbias2)
        if in_split is None:
            return (dx4,) + tail
        return dx4 + tail  # dx4 == (dxa, dxb)

    if in_split is None:
        @jax.custom_vjp
        def block(x4, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2):
            out, _ = fwd_impl(
                x4, None, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2
            )
            return out

        def block_fwd(x4, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2):
            return fwd_impl(
                x4, None, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2
            )

        block.defvjp(block_fwd, block_bwd)
        return block

    @jax.custom_vjp
    def block2(x4a, x4b, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2):
        out, _ = fwd_impl(
            x4a, x4b, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2
        )
        return out

    def block2_fwd(x4a, x4b, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2):
        return fwd_impl(
            x4a, x4b, k1, c1b, k2, c2b, scale1, bias1, scale2, bias2
        )

    block2.defvjp(block2_fwd, block_bwd)
    return block2

"""Probe: decompose the merged dx+wgrad backward kernel's time.

The 2026-08-19 XProf puts the merged backward kernels at ~63% of their
executed-FLOP bound while the fused forward kernels reach ~81%
(PERFORMANCE.md "Headline residue at 154.5").  This probe times an
enc1-conv2-shaped backward (b16, 512^2, 64->64, fold 4, sub 2, gfold
"affine", pre_w affine-relu, post adjoint) with pieces disabled —
TIMING ONLY, the variant math is wrong — to attribute the gap:

  full          the production kernel configuration (self-contained clone)
  gfold_noop    y slabs still streamed, gfold transform = identity
  bf16fold      gfold adds/muls in bf16 (mask math stays f32)
  nogfold       no y streams, no transform
  nopre         xw slab used raw (no affine-relu on the wgrad operand)
  nopost        no pre-op adjoint / da / dbp reductions
  nodx          dx dots skipped (out written from a zero-free dummy)
  nowgrad       xw slab build + wgrad dots + db skipped (xw still DMAd)
  noshifts      halo lanes taken UNSHIFTED from xv (drops the two
                full-slab shift copies per slab; dots stay live)
  wgrad_tg      CANDIDATE (math-correct, transposed dkp out): transpose
                g2 ONCE per grid cell, run the wgrad dots in the
                MXU-native (lanes x sublanes) orientation — replaces
                Mosaic's per-dot transpose of the 6 big xw slabs with a
                single (ht*wp, lg) transpose of the shared cotangent
  tgplus        TIMING ONLY: original dots PLUS the g2 transpose kept
                live — (tgplus - full) isolates the transpose cost
  wgrad_nodots  TIMING ONLY: xw slab build + act + db kept, dkp dots
                skipped — isolates the dot cost inside the wgrad path
  slimshift     CANDIDATE (math-correct): lane-slice BEFORE the halo
                sublane shift — the shifted slabs are only consumed for
                ci of their lg lanes, so shifting full-lane slabs does
                f x the needed VPU copy work

  slimshift128  CANDIDATE (math-correct): tile-ALIGNED slim shift — slice
                a 128-lane block, shift it, take the ci halo lanes of the
                shifted value (slimshift's unaligned slice crashes Mosaic
                per _build_aug's note; 128 offsets are aligned).  Halves
                the shift copy work at lanes=256.
  xwfirst       OVERLAP variant (math-correct): both slabs built up front,
                dx and wgrad dots interleaved per sub-block with no VPU
                work between them, post adjoint last — can Mosaic overlap
                the slab-build VPU work with the MXU dots?
  reorder_wfirst OVERLAP variant (math-correct): as xwfirst but all wgrad
                dots before all dx dots.

Variants may be combined with '+': --variants wgrad_tg+slimshift.

Usage: python tools/exp_bwd_decomp.py [--iters 30] [--variants a,b,...]

Candidate variants (wgrad_tg, tgplus, wgrad_nodots) are in the default
list; pass --variants to time a subset.
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--fold", type=int, default=4)
    ap.add_argument("--sub", type=int, default=2)
    ap.add_argument("--ht", type=int, default=8)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl

    b, hw, c, f, g = args.batch, args.size, args.ch, args.fold, args.sub
    h, wp = hw, hw // f
    lg = lx = f * c
    ci = c
    n_dx = lg
    nj = f // g
    skdim = (g + 2) * ci
    ht = args.ht
    n_h = h // ht

    def build_slabs(refs, lanes, skip, transform=None):
        """top/mid/bot refs -> (sub-slabs, transformed mid).

        Mirrors ops/pallas_conv._build_aug for the canonical subfold path,
        with probe switches: ``transform`` applied per row-slab,
        ``noshifts`` uses UNSHIFTED xv slices for the halo lanes.
        """
        i = pl.program_id(1)
        mid = refs[1][0]
        top = refs[0][0]
        bot = refs[2][0]
        if transform is not None:
            # Stream order: y_refs yield (top, mid, bot) — consume in that
            # order or the gfold transform pairs mid with top's 1-row block.
            top, mid, bot = transform(top), transform(mid), transform(bot)
        mid_out = mid
        top = jnp.where(i > 0, top, jnp.zeros_like(top))
        bot = jnp.where(i < n_h - 1, bot, jnp.zeros_like(bot))
        xv = jnp.concatenate([top, mid, bot], axis=0)
        ci_l = lanes // f
        if "noshifts" in skip:
            xv_r = xv[:, :, (f - 1) * ci_l :]
            xv_l = xv[:, :, :ci_l]
        elif "slimshift" in skip:
            zrow = jnp.zeros((ht + 2, 1, ci_l), xv.dtype)
            xv_r = jnp.concatenate(
                [zrow, xv[:, :-1, (f - 1) * ci_l :]], axis=1
            )
            xv_l = jnp.concatenate([xv[:, 1:, :ci_l], zrow], axis=1)
        elif "slimshift128" in skip:
            # Tile-ALIGNED slim shifts: slice a 128-lane block first (the
            # alignment Mosaic's sublane shift tolerates — _build_aug's
            # note says unaligned lane slices crash), shift only that, then
            # take the needed ci lanes of the shifted value.  Halves the
            # shift copy work at lanes=256.
            zrow = jnp.zeros((ht + 2, 1, 128), xv.dtype)
            hi = jnp.concatenate(
                [zrow, xv[:, :-1, lanes - 128 :]], axis=1
            )
            xv_r = hi[:, :, 128 - ci_l :]
            lo = jnp.concatenate([xv[:, 1:, :128], zrow], axis=1)
            xv_l = lo[:, :, :ci_l]
        else:
            zrow = jnp.zeros((ht + 2, 1, lanes), xv.dtype)
            xv_r = jnp.concatenate([zrow, xv[:, :-1]], axis=1)[
                :, :, (f - 1) * ci_l :
            ]
            xv_l = jnp.concatenate([xv[:, 1:], zrow], axis=1)[:, :, :ci_l]
        subs = []
        for j in range(nj):
            parts = []
            if j == 0:
                parts.append(xv_r)
            lo = max(j * g - 1, 0) * ci
            hi = min(j * g + g + 1, f) * ci
            parts.append(xv[:, :, lo:hi])
            if j == nj - 1:
                parts.append(xv_l)
            subs.append(jnp.concatenate(parts, axis=-1))
        return subs, mid_out

    def kernel_body(*refs, skip=frozenset()):
        it = iter(refs)
        ge_refs = (next(it), next(it), next(it))
        y_refs = None
        if "nogfold" not in skip:
            y_refs = (next(it), next(it), next(it))
        xw_refs = (next(it), next(it), next(it))
        w_ref = next(it)
        gf_ref = next(it) if "nogfold" not in skip else None
        ab_pre_ref = next(it) if "nopre" not in skip else None
        ab_post_ref = next(it) if "nopost" not in skip else None
        out_ref = next(it)
        dkp_ref, dbw_ref = next(it), next(it)
        da_ref = next(it) if "nopost" not in skip else None
        dbp_ref = next(it) if "nopost" not in skip else None

        first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

        yrows = iter(y_refs) if y_refs is not None else None

        def gfold(t):
            if "nogfold" in skip or "gfold_noop" in skip:
                if yrows is not None:
                    next(yrows)  # keep the stream declared-but-unused
                return t
            y = next(yrows)[0]
            a_p = gf_ref[0:1].reshape(1, 1, lg)
            b_p = gf_ref[1:2].reshape(1, 1, lg)
            c1 = gf_ref[2:3].reshape(1, 1, lg)
            c2 = gf_ref[3:4].reshape(1, 1, lg)
            yf = y.astype(jnp.float32)
            if "bf16fold" in skip:
                mask = (yf * a_p + b_p) > 0.0
                gfl = jnp.where(
                    mask, t * a_p.astype(t.dtype), jnp.zeros_like(t)
                )
                return gfl + c1.astype(t.dtype) + (
                    2.0 * c2
                ).astype(t.dtype) * y
            gfl = t.astype(jnp.float32)
            gfl = jnp.where(yf * a_p + b_p > 0.0, gfl * a_p, 0.0)
            return (gfl + c1 + 2.0 * yf * c2).astype(t.dtype)

        ge_aug, ge_t = build_slabs(ge_refs, lg, skip, transform=gfold)

        if {"xwfirst", "reorder_wfirst"} & skip:
            # OVERLAP-AXIS variants (math-correct): both slabs are built up
            # front, then the MXU dots are issued with no VPU work between
            # them ("xwfirst": dx and wgrad interleaved per sub-block;
            # "reorder_wfirst": all wgrad then all dx), and the post
            # adjoint+reductions run last.  Tests whether Mosaic's
            # scheduler overlaps the serialized slab-build/transform VPU
            # work with the dots when the program order allows it.
            a_w = ab_pre_ref[0:1].reshape(1, 1, lx).astype(jnp.float32)
            b_w = ab_pre_ref[1:2].reshape(1, 1, lx).astype(jnp.float32)

            def act(t):
                tf = t.astype(jnp.float32)
                return jnp.maximum(tf * a_w + b_w, 0.0).astype(t.dtype)

            xw_aug, _ = build_slabs(xw_refs, lx, skip, transform=act)
            g2 = ge_t.reshape(ht * wp, lg)
            sub_g = lg // nj

            @pl.when(first)
            def _():
                dkp_ref[...] = jnp.zeros_like(dkp_ref)
                dbw_ref[...] = jnp.zeros_like(dbw_ref)
                da_ref[...] = jnp.zeros_like(da_ref)
                dbp_ref[...] = jnp.zeros_like(dbp_ref)

            def dx_dots(j):
                accj = jnp.zeros((ht * wp, g * c), jnp.float32)
                for dy in range(3):
                    a = ge_aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                    accj = accj + jnp.dot(
                        a, w_ref[dy, j], preferred_element_type=jnp.float32
                    )
                return accj

            def w_dots(j):
                gj = g2[:, j * sub_g : (j + 1) * sub_g]
                for dy in range(3):
                    a = xw_aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                    dkp_ref[dy, j] = dkp_ref[dy, j] + jax.lax.dot_general(
                        a, gj, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

            pieces = []
            if "xwfirst" in skip:
                for j in range(nj):
                    pieces.append(dx_dots(j))
                    w_dots(j)
            else:
                for j in range(nj):
                    w_dots(j)
                for j in range(nj):
                    pieces.append(dx_dots(j))
            acc = jnp.concatenate(pieces, axis=-1)

            x = xw_refs[1][0].reshape(ht * wp, n_dx).astype(jnp.float32)
            a_q = ab_post_ref[0:1].reshape(1, n_dx).astype(jnp.float32)
            b_q = ab_post_ref[1:2].reshape(1, n_dx).astype(jnp.float32)
            gu = jnp.where((x * a_q + b_q) > 0.0, acc, 0.0)
            out_ref[0] = (gu * a_q).reshape(ht, wp, n_dx).astype(jnp.bfloat16)
            da_ref[...] = da_ref[...] + jnp.sum(gu * x, axis=0, keepdims=True)
            dbp_ref[...] = dbp_ref[...] + jnp.sum(gu, axis=0, keepdims=True)
            dbw_ref[0] = dbw_ref[0] + jnp.sum(g2.astype(jnp.float32), axis=0)
            return

        if "nodx" in skip:
            acc = ge_t.reshape(ht * wp, n_dx).astype(jnp.float32)
        else:
            pieces = []
            for j in range(nj):
                accj = jnp.zeros((ht * wp, g * c), jnp.float32)
                for dy in range(3):
                    a = ge_aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                    accj = accj + jnp.dot(
                        a, w_ref[dy, j], preferred_element_type=jnp.float32
                    )
                pieces.append(accj)
            acc = jnp.concatenate(pieces, axis=-1)

        if "nopost" not in skip:
            x = xw_refs[1][0].reshape(ht * wp, n_dx).astype(jnp.float32)
            a_q = ab_post_ref[0:1].reshape(1, n_dx).astype(jnp.float32)
            b_q = ab_post_ref[1:2].reshape(1, n_dx).astype(jnp.float32)
            gu = jnp.where((x * a_q + b_q) > 0.0, acc, 0.0)
            out_ref[0] = (gu * a_q).reshape(ht, wp, n_dx).astype(jnp.bfloat16)

            @pl.when(first)
            def _():
                da_ref[...] = jnp.zeros_like(da_ref)
                dbp_ref[...] = jnp.zeros_like(dbp_ref)

            da_ref[...] = da_ref[...] + jnp.sum(gu * x, axis=0, keepdims=True)
            dbp_ref[...] = dbp_ref[...] + jnp.sum(gu, axis=0, keepdims=True)
        else:
            out_ref[0] = acc.reshape(ht, wp, n_dx).astype(jnp.bfloat16)

        @pl.when(first)
        def _():
            dkp_ref[...] = jnp.zeros_like(dkp_ref)
            dbw_ref[...] = jnp.zeros_like(dbw_ref)

        if "nowgrad" not in skip:
            if "nopre" in skip:
                act = None
            else:
                a_w = ab_pre_ref[0:1].reshape(1, 1, lx).astype(jnp.float32)
                b_w = ab_pre_ref[1:2].reshape(1, 1, lx).astype(jnp.float32)

                def act(t):
                    tf = t.astype(jnp.float32)
                    return jnp.maximum(tf * a_w + b_w, 0.0).astype(t.dtype)

            xw_aug, _ = build_slabs(xw_refs, lx, skip, transform=act)
            g2 = ge_t.reshape(ht * wp, lg)
            if "wgrad_tg" in skip:
                g2t = g2.T  # one (ht*wp, lg) transpose, shared by all dots
                sub_g = lg // nj
                for dy in range(3):
                    for j in range(nj):
                        a = xw_aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                        gjt = g2t[j * sub_g : (j + 1) * sub_g, :]
                        # native orientation: gjt lanes x a sublanes
                        dkp_ref[dy, j] = dkp_ref[dy, j] + jnp.dot(
                            gjt, a, preferred_element_type=jnp.float32
                        )
            elif "wgrad_nodots" in skip:
                pass
            elif "tgplus" in skip:
                g2t = g2.T  # transpose kept live via the db reduction
                dbw_ref[0] = dbw_ref[0] + jnp.sum(
                    g2t.astype(jnp.float32), axis=1
                )
                for dy in range(3):
                    for j in range(nj):
                        a = xw_aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                        gj = g2[:, j * (lg // nj) : (j + 1) * (lg // nj)]
                        dkp_ref[dy, j] = dkp_ref[dy, j] + jax.lax.dot_general(
                            a, gj, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
            else:
                for dy in range(3):
                    for j in range(nj):
                        a = xw_aug[j][dy : dy + ht].reshape(ht * wp, skdim)
                        gj = g2[:, j * (lg // nj) : (j + 1) * (lg // nj)]
                        dkp_ref[dy, j] = dkp_ref[dy, j] + jax.lax.dot_general(
                            a, gj, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
            dbw_ref[0] = dbw_ref[0] + jnp.sum(g2.astype(jnp.float32), axis=0)

    def build(skip=frozenset()):
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
        if "nogfold" not in skip:
            in_specs.extend(_slab_specs(lg))
        in_specs.extend(_slab_specs(lx))
        in_specs.append(
            pl.BlockSpec((3, nj, skdim, g * c), lambda b, i: (0, 0, 0, 0))
        )
        if "nogfold" not in skip:
            in_specs.append(pl.BlockSpec((4, lg), lambda b, i: (0, 0)))
        if "nopre" not in skip:
            in_specs.append(pl.BlockSpec((2, lx), lambda b, i: (0, 0)))
        if "nopost" not in skip:
            in_specs.append(pl.BlockSpec((2, n_dx), lambda b, i: (0, 0)))
        dkp_s = (
            (3, nj, g * c, skdim) if "wgrad_tg" in skip
            else (3, nj, skdim, g * c)
        )
        out_specs = [
            pl.BlockSpec((1, ht, wp, n_dx), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(dkp_s, lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, lg), lambda b, i: (0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, h, wp, n_dx), jnp.bfloat16),
            jax.ShapeDtypeStruct(dkp_s, jnp.float32),
            jax.ShapeDtypeStruct((1, lg), jnp.float32),
        ]
        if "nopost" not in skip:
            for _ in range(2):
                out_specs.append(pl.BlockSpec((1, n_dx), lambda b, i: (0, 0)))
                out_shape.append(jax.ShapeDtypeStruct((1, n_dx), jnp.float32))

        def run(ge, y, xw, wb, gf, abw, ab):
            a = [ge, ge, ge]
            if "nogfold" not in skip:
                a += [y, y, y]
            a += [xw, xw, xw, wb]
            if "nogfold" not in skip:
                a.append(gf)
            if "nopre" not in skip:
                a.append(abw)
            if "nopost" not in skip:
                a.append(ab)
            return pl.pallas_call(
                functools.partial(kernel_body, skip=skip),
                grid=(b, n_h),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
            )(*a)

        return run

    rng = np.random.default_rng(0)
    ge = jnp.asarray(rng.normal(size=(b, h, wp, lg)).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.normal(size=(b, h, wp, lg)).astype(np.float32)).astype(jnp.bfloat16)
    xw = jnp.asarray(rng.normal(size=(b, h, wp, lx)).astype(np.float32)).astype(jnp.bfloat16)
    wb = jnp.asarray(
        (rng.normal(size=(3, nj, skdim, g * c)) / np.sqrt(3 * skdim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    gf = jnp.asarray(rng.normal(size=(4, lg)).astype(np.float32) * 0.01)
    abw = jnp.asarray(
        np.stack([np.ones(lx), np.zeros(lx)]).astype(np.float32)
    )
    ab = jnp.asarray(
        np.stack([np.ones(n_dx), np.zeros(n_dx)]).astype(np.float32)
    )

    gflop = 2 * b * h * wp * 3 * ((g + 2) * ci * n_dx + (g + 2) * ci * lg) / 1e9
    names = (
        args.variants.split(",")
        if args.variants
        else ["full", "gfold_noop", "bf16fold", "nogfold", "nopre", "nopost",
              "nodx", "nowgrad", "noshifts", "wgrad_tg", "tgplus",
              "wgrad_nodots", "slimshift", "wgrad_tg+slimshift",
              "slimshift128", "xwfirst", "reorder_wfirst",
              "xwfirst+slimshift128"]
    )
    for name in names:
        skip = frozenset() if name == "full" else frozenset(name.split("+"))
        run = build(skip)

        @jax.jit
        def chain(ge, y, xw, wb, gf, abw, ab):
            def body(_, gec):
                out = run(gec, y, xw, wb, gf, abw, ab)
                return out[0]
            return lax.fori_loop(0, args.iters, body, ge)

        try:
            out = chain(ge, y, xw, wb, gf, abw, ab)
            jax.device_get(out[0, 0, 0, :2])
            t0 = time.perf_counter()
            out = chain(ge, y, xw, wb, gf, abw, ab)
            jax.device_get(out[0, 0, 0, :2])
            dt = (time.perf_counter() - t0) / args.iters
        except Exception as e:  # noqa: BLE001 - probe robustness
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
            continue
        print(
            f"{name:12s} {dt*1e3:8.3f} ms/iter  "
            f"({gflop/dt/1e3:.0f} TFLOPS on the full variant's "
            f"{gflop:.0f} GFLOP)"
        )


if __name__ == "__main__":
    main()

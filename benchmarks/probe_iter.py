#!/usr/bin/env python3
"""On-chip benchmark: whole-iteration fusion (``iteration_pair``) vs the
unfused pallas iteration (XLA edge MLP + ``aggregate_pair``) vs the pure
XLA chain.

One SegmentClassifier message-passing iteration is
(`/root/reference/gnn/model.py:69-81,113-125`):

    pre = (pa[send] + pb[recv]) * em ; z = tanh(pre + b1)
    e_  = sigmoid(z @ w2 + b2) * em
    mi/mo = weighted segment sums of h rows by e_

``iteration_pair`` runs that whole chain as ONE kernel launch per
direction-pair (and ONE for the full VJP), so the [E, H] intermediates
never touch HBM.  Source of the measured table in
``ops/pallas/spmm.py`` ("iteration fusion" rows).

Usage: python benchmarks/probe_iter.py [--dtype float32 --iters 200]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_ops import timed
from benchmarks.probe_spmm import layered_graph
from gnn_fpga_tpu.ops.pallas import spmm as sp


def _stash_bwd(pa, pb, h, ems, sig_sorted, w2, b1, plan, gmi, gmo):
    """ABLATION instrument (VERDICT r4 weak #8): the fused backward with
    the edge-score recompute replaced by STASHED sigmoid values.

    The production VJP (`spmm._iter_pair_bwd_kernel`) recomputes
    pre/z/logit/sig per tile from V-sized residuals.  Stashing the [E]
    scores (4 B/edge) can only remove the ``z @ w2`` contraction and the
    sigmoid — ``dpre = dz * (1 - z^2)`` still needs ``z``, which needs
    ``pre``, which needs the pa/pb gathers (the actual recompute cost).
    This kernel measures exactly that reduced form so the
    recompute-vs-stash choice is a recorded number, not an argument.
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, t, d = plan.n_edge, plan.tile_e, h.shape[1]
    hdim = pa.shape[1]

    def kernel(oth_off_ref, seg_off_ref, oth_ref, seg_ref, em_ref,
               sig_ref, pa_ref, pb_ref, h_ref, w2row_ref, b1_ref,
               gmi_ref, gmo_ref, dh_ref, dpa_ref, dpb_ref, dw2_ref,
               db1_ref, db2_ref, *, w_oth, w_seg, tile_e, subtiles,
               precision):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            dpa_ref[:] = jnp.zeros_like(dpa_ref)
            dpb_ref[:] = jnp.zeros_like(dpb_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)

        dtk = h_ref.dtype
        for k in range(subtiles):
            ti = g * subtiles + k
            sl = slice(k * tile_e, (k + 1) * tile_e)
            vo = pl.multiple_of(oth_off_ref[ti], 16)
            vs = pl.multiple_of(seg_off_ref[ti], 16)
            oh_o = sp._oh(oth_ref[sl], vo, w_oth, dtk)
            oh_s = sp._oh(seg_ref[sl], vs, w_seg, dtk)
            em = em_ref[sl]
            sig = sig_ref[sl]                       # STASHED (no z @ w2)
            e_ = sig * em
            pa_rows = sp._dotf(oh_o, pa_ref[pl.ds(vo, w_oth), :], precision)
            pb_rows = sp._dotf(oh_s, pb_ref[pl.ds(vs, w_seg), :], precision)
            pre = (pa_rows + pb_rows) * em
            z = jnp.tanh(pre + b1_ref[0:1, :])      # still required (dpre)
            h_o = sp._dotf(oh_o, h_ref[pl.ds(vo, w_oth), :], precision)
            h_s = sp._dotf(oh_s, h_ref[pl.ds(vs, w_seg), :], precision)
            gmi_s = sp._dotf(oh_s, gmi_ref[pl.ds(vs, w_seg), :], precision)
            gmo_o = sp._dotf(oh_o, gmo_ref[pl.ds(vo, w_oth), :], precision)
            dh_ref[pl.ds(vo, w_oth), :] += sp._dott(
                oh_o, (e_ * gmi_s).astype(dtk), precision)
            dh_ref[pl.ds(vs, w_seg), :] += sp._dott(
                oh_s, (e_ * gmo_o).astype(dtk), precision)
            de = jnp.sum(gmi_s * h_o + gmo_o * h_s, axis=1, keepdims=True)
            dlogit = de * em * sig * (1.0 - sig)
            dz = dlogit * w2row_ref[0:1, :]
            dpre = dz * (1.0 - z * z) * em
            dpa_ref[pl.ds(vo, w_oth), :] += sp._dott(
                oh_o, dpre.astype(dtk), precision)
            dpb_ref[pl.ds(vs, w_seg), :] += sp._dott(
                oh_s, dpre.astype(dtk), precision)
            dw2_ref[0:1, :] += jnp.sum(z * dlogit, axis=0, keepdims=True)
            db1_ref[0:1, :] += jnp.sum(dz * (1.0 - z * z), axis=0,
                                       keepdims=True)
            db2_ref[0:1, 0:1] += jnp.sum(dlogit, keepdims=True)[0:1, 0:1]

    subtiles, grid_spec = sp._pair_grid(
        plan, sp.DEFAULT_SUBTILES, 2, ["edge"] * 4 + ["tab"] * 7,
        ["tab"] * 3 + ["tab"] * 3)
    outs = pl.pallas_call(
        functools.partial(kernel, w_oth=plan.w_oth, w_seg=plan.w_seg,
                          tile_e=t, subtiles=subtiles,
                          precision=sp._precision_for(h.dtype)),
        grid_spec=grid_spec,
        compiler_params=sp._VMEM_LIMIT,
        out_shape=[
            jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((plan.table_rows, hdim), jnp.float32),
            jax.ShapeDtypeStruct((plan.table_rows, hdim), jnp.float32),
            jax.ShapeDtypeStruct((8, hdim), jnp.float32),
            jax.ShapeDtypeStruct((8, hdim), jnp.float32),
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
        ],
    )(plan.oth_win_off, plan.seg_win_off,
      plan.sorted_oth[:, None], plan.sorted_seg[:, None], ems[:, None],
      sig_sorted[:, None], sp._pad_table(pa, plan),
      sp._pad_table(pb, plan), sp._pad_table(h, plan),
      w2[None, :], b1[None, :],
      sp._pad_table(gmi.astype(h.dtype), plan),
      sp._pad_table(gmo.astype(h.dtype), plan))
    dh_tab, dpa_tab, dpb_tab, dw2_row, db1_row, db2_row = outs
    return (dh_tab[: plan.n_node], dpa_tab[: plan.n_node],
            dpb_tab[: plan.n_node], dw2_row[0], db1_row[0],
            db2_row[0, 0])


def ablate_stash(args, v, e, d, plans, pa, pb, h, ems, w2, b1, b2):
    """Time production recompute-bwd vs the stashed-scores variant."""
    rng = np.random.default_rng(1)
    gmi = jnp.asarray(rng.standard_normal((v, d)).astype(h.dtype))
    gmo = jnp.asarray(rng.standard_normal((v, d)).astype(h.dtype))
    plan = plans.recv
    # sig in sorted order, as a stashing forward would emit it
    pre = (jnp.take(pa, jnp.asarray(plan.sorted_oth), 0, mode='fill',
                    fill_value=0)
           + jnp.take(pb, jnp.asarray(plan.sorted_seg), 0, mode='fill',
                      fill_value=0)) * ems[:, None]
    z = jnp.tanh(pre + b1)
    sig_sorted = jax.nn.sigmoid(z @ w2 + b2[0])

    def _combine(outs):
        # one array carrying every big output (d and hdim may differ)
        hd_ = outs[1].shape[1]
        return outs[0].at[:, :hd_].add(outs[1] + outs[2])

    def recompute(gmi, gmo):
        return _combine(sp._iter_pair_bwd_call(pa, pb, h, ems, w2, b1,
                                               b2, gmi, gmo, plan))

    def stashed(gmi, gmo):
        return _combine(_stash_bwd(pa, pb, h, ems, sig_sorted, w2, b1,
                                   plan, gmi, gmo))

    # instrument sanity: both backward forms agree before timing.  The
    # stashed sig comes from the XLA chain while the production kernel
    # recomputes it through bf16 MXU gathers — at bf16 the per-edge
    # scores differ by O(bf16 eps) and propagate linearly into dh, so
    # the check is loose under bf16 (structure, not bitwise parity).
    loose = h.dtype == jnp.bfloat16
    tol = dict(rtol=0.1, atol=0.5) if loose else dict(rtol=2e-3,
                                                      atol=2e-3)
    ref = sp._iter_pair_bwd_call(pa, pb, h, ems, w2, b1, b2, gmi, gmo, plan)
    alt = _stash_bwd(pa, pb, h, ems, sig_sorted, w2, b1, plan, gmi, gmo)
    for a, b in zip(ref, alt):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim >= 2:              # node tables: elementwise
            np.testing.assert_allclose(a, b, **tol)
        else:                        # E-summed param reductions: under
            # bf16 the two sig paths differ by O(eps) per edge and the
            # sums cancel, so compare direction not elements
            cos = float((a * b).sum()
                        / max(np.linalg.norm(a) * np.linalg.norm(b),
                              1e-9))
            assert cos > 0.999, cos

    from benchmarks.probe_ops import timed
    tr = timed(recompute, (gmi, gmo), n_iters=args.iters)
    ts = timed(stashed, (gmi, gmo), n_iters=args.iters)
    print(f"V={v:6d} D={d:4d} bwd recompute       {tr*1e6:8.1f} us   "
          f"bwd stashed-scores {ts*1e6:8.1f} us "
          f"({(tr-ts)/tr*100:+.1f}% saved)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--ablate-stash", action="store_true")
    ap.add_argument("--only", default=None,
                    help="substring filter on variant names")
    ap.add_argument("--shape", choices=["probe", "bench"], default="probe",
                    help="bench = the fullevent bench dims "
                    "(V=15848 E=180736 D=66 H=64)")
    ap.add_argument("--sub", type=int, default=None,
                    help="override DEFAULT_SUBTILES")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    if args.sub is not None:
        sp.DEFAULT_SUBTILES = args.sub

    shapes = ((16384, 131072, 128, 128), (4096, 32768, 64, 64))
    if args.shape == "bench":
        shapes = ((15848, 180736, 66, 64),)

    for v, e, d, hd in shapes:
        rng = np.random.default_rng(0)
        s, r = layered_graph(v, e)
        sj, rj = jnp.asarray(s), jnp.asarray(r)
        h = jnp.asarray(rng.standard_normal((v, d)).astype(dt))
        pa = jnp.asarray(rng.standard_normal((v, hd)).astype(dt))
        pb = jnp.asarray(rng.standard_normal((v, hd)).astype(dt))
        w2 = jnp.asarray(rng.standard_normal(hd).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal(hd).astype(np.float32))
        b2 = jnp.asarray(rng.standard_normal(1).astype(np.float32))
        em = jnp.ones(e, jnp.float32)
        bnd = np.arange(0, v + 1, v // 8)
        plans = sp.build_agg_plans(s, r, v, tile_e=args.tile,
                                   boundaries=bnd)
        plansp = sp.build_agg_plans(s, r, v, tile_e=args.tile,
                                    boundaries=bnd, precompute="int8")
        ems = sp.sort_edge_weights(em, plans.recv)

        def mk_fused(pl_):
            def fused(pa, pb, h):
                mi, mo = sp.iteration_pair(pa, pb, h, ems, w2, b1, b2, pl_)
                return mi + mo
            return fused

        # Cast the per-edge operands of the XLA-side variants to the
        # requested dtype so all variants stream the same-width [E, H]
        # intermediates (the kernel accumulates in f32 regardless, as do
        # XLA matmuls via preferred_element_type) — otherwise bf16 runs
        # silently promote the xla/unfused chains to f32 and the
        # comparison is not apples-to-apples (ADVICE r4).
        em_d, b1_d = em.astype(dt), b1.astype(dt)
        w2_d, b2_d = w2.astype(dt), b2.astype(dt)

        def xla(pa, pb, h):
            mi, mo = sp.iteration_pair_reference(pa, pb, h, em_d, w2_d,
                                                 b1_d, b2_d, sj, rj, v)
            return mi + mo

        def unfused(pa, pb, h):
            pre = (jnp.take(pa, sj, 0) + jnp.take(pb, rj, 0)) * em_d[:, None]
            z = jnp.tanh(pre + b1_d)
            e_ = jax.nn.sigmoid(z @ w2_d + b2_d[0]) * em_d
            mi, mo = sp.aggregate_pair(h, e_, plans)
            return mi + mo

        def fb(fn):
            # sum-of-squares grad so XLA can't dead-code the forward
            def f(pa, pb, h):
                g = jax.grad(lambda *a: jnp.sum(
                    fn(*a).astype(jnp.float32) ** 2), argnums=(0, 1, 2))(
                        pa, pb, h)
                return (g[0] + g[1] + g[2][:, :hd]).astype(jnp.float32)
            return f

        if args.ablate_stash:
            ablate_stash(args, v, e, d, plans, pa, pb, h, ems, w2, b1, b2)
            continue
        for name, f in (("xla chain", xla), ("unfused pallas", unfused),
                        ("fused iteration", mk_fused(plans)),
                        ("fused pre:int8", mk_fused(plansp))):
            if args.only and args.only not in name:
                continue
            t = timed(f, (pa, pb, h), n_iters=args.iters)
            tb = timed(fb(f), (pa, pb, h), n_iters=args.iters)
            print(f"V={v:6d} D={d:4d} {name:16s} fwd {t*1e6:8.1f} us   "
                  f"fwd+bwd {tb*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()

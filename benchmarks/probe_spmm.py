#!/usr/bin/env python3
"""On-chip benchmark: fused Pallas aggregate_pair vs XLA gather+segment_sum.

Graph: layered tracking-style structure (L layers x V/L nodes ordered by
(layer, phi); edges connect adjacent layers within a phi window) — the
locality the windowed-gather kernel is designed around, and what the ACTS
pipelines produce when hits are sorted by (layer, phi)
(`/root/reference/gnn/prepareGraphs.py` layer-pair construction).

Usage: python benchmarks/probe_spmm.py [--v 16384 --e 131072 --d 128]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_ops import timed
from gnn_fpga_tpu.ops.pallas import spmm as sp


def layered_graph(v, e, n_layers=8, phi_window=128, seed=0):
    rng = np.random.default_rng(seed)
    per_layer = v // n_layers
    # senders uniformly in layers [0, L-1), receivers one layer up within
    # a phi window
    layer = rng.integers(0, n_layers - 1, size=e)
    phi = rng.integers(0, per_layer, size=e)
    senders = (layer * per_layer + phi).astype(np.int32)
    dphi = rng.integers(-phi_window // 2, phi_window // 2, size=e)
    rphi = np.clip(phi + dphi, 0, per_layer - 1)
    receivers = ((layer + 1) * per_layer + rphi).astype(np.int32)
    return senders, receivers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=16384)
    ap.add_argument("--e", type=int, default=131072)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    v, e, d = args.v, args.e, args.d
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(1)
    h = rng.standard_normal((v, d)).astype(dt)
    w = rng.standard_normal((e,)).astype(np.float32)
    s, r = layered_graph(v, e)
    plans = sp.build_agg_plans(s, r, v, tile_e=args.tile)
    print(f"# V={v} E={e} D={d} dtype={dt.name} tile={args.tile} "
          f"W_oth(recv)={plans.recv.w_oth} W_oth(send)={plans.send.w_oth}")

    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def report(name, sec, bytes_moved):
        print(f"{name:46s} {sec*1e6:9.1f} us  {bytes_moved/sec/1e9:7.1f} "
              f"GB/s  {e/sec/1e6:8.1f} Medge/s")

    useful = (v * d + 2 * v * d + 3 * e) * dt.itemsize  # h + mi + mo + idx/w

    # XLA pair (what the model's sparse path does today)
    def xla_pair(h, w):
        mi = jax.ops.segment_sum(jnp.take(h, sj, axis=0) * w[:, None], rj,
                                 num_segments=v)
        mo = jax.ops.segment_sum(jnp.take(h, rj, axis=0) * w[:, None], sj,
                                 num_segments=v)
        return mi + mo

    # sum-of-squares grad: the cotangent depends on the forward output,
    # so XLA cannot dead-code the fwd (a plain sum's grad can).
    def fwdbwd(pair):
        def f(h, w):
            gh, gw = jax.grad(
                lambda h, w: jnp.sum(pair(h, w).astype(jnp.float32) ** 2),
                argnums=(0, 1))(h, w)
            return gh.astype(jnp.float32) + gw.sum()
        return f

    t = timed(lambda h, w: xla_pair(h, w), (h, w), n_iters=args.iters)
    report("XLA pair fwd", t, useful)
    t = timed(fwdbwd(xla_pair), (h, w), n_iters=args.iters)
    report("XLA pair fwd+bwd", t, 3 * useful)

    # Pallas fused pair, tile/subtile sweep; "bnd" = boundary-padded
    # plans (per-layer tile padding -> ~8x narrower gather windows);
    # "pre:x" = prebuilt one-hot operands (blocked-ELL, int8/bf16
    # streamed from HBM instead of VPU iota-compare builds)
    bnd = np.arange(0, v + 1, v // 8)
    for tile, sub, use_bnd, pre in (
            (256, 8, False, None), (256, 8, True, None),
            (256, 16, True, None), (128, 8, True, None),
            (256, 8, True, "int8"), (256, 16, True, "int8"),
            (256, 8, True, "bf16"), (256, 16, True, "bf16"),
            (512, 16, True, "bf16")):
        pl_ = sp.build_agg_plans(s, r, v, tile_e=tile,
                                 boundaries=bnd if use_bnd else None,
                                 precompute=pre)

        def pallas_pair(h, w, pl_=pl_, sub=sub):
            from gnn_fpga_tpu.ops.pallas import spmm as _sp
            _sp.DEFAULT_SUBTILES, keep = sub, _sp.DEFAULT_SUBTILES
            try:
                mi, mo = sp.aggregate_pair(h, w, pl_)
            finally:
                _sp.DEFAULT_SUBTILES = keep
            return mi + mo

        tag = ("bnd" if use_bnd else "   ") + (f" pre:{pre}" if pre else "")
        t = timed(pallas_pair, (h, w), n_iters=args.iters)
        report(f"pallas pair fwd  t={tile} sub={sub} {tag} "
               f"W={pl_.recv.w_oth}", t, useful)
        if sub == 8 or pre:
            t = timed(fwdbwd(pallas_pair), (h, w), n_iters=args.iters)
            report(f"pallas pair fwd+bwd t={tile} sub={sub} {tag}", t,
                   3 * useful)

    # gather_pair (fused edge-logit first layer) vs XLA take+take
    pl_b = sp.build_agg_plans(s, r, v, tile_e=256, boundaries=bnd)
    pa = jnp.asarray(rng.standard_normal((v, d)).astype(dt))
    pb = jnp.asarray(rng.standard_normal((v, d)).astype(dt))

    def xla_gather_pair(pa, pb):
        return (jnp.take(pa, sj, axis=0) + jnp.take(pb, rj, axis=0))

    gp_bytes = (2 * v * d + e * d) * dt.itemsize
    t = timed(xla_gather_pair, (pa, pb), n_iters=args.iters)
    report("XLA gather_pair fwd", t, gp_bytes)
    t = timed(fwdbwd(xla_gather_pair), (pa, pb), n_iters=args.iters)
    report("XLA gather_pair fwd+bwd", t, 3 * gp_bytes)
    gp = lambda a, b: sp.gather_pair(a, b, sj, rj, pl_b)
    t = timed(gp, (pa, pb), n_iters=args.iters)
    report("pallas gather_pair fwd (XLA take) bnd", t, gp_bytes)
    t = timed(fwdbwd(gp), (pa, pb), n_iters=args.iters)
    report("pallas gather_pair fwd+bwd bnd", t, 3 * gp_bytes)

    # backward components (tile=256): dh transpose SpMM + fused dual SDDMM
    g = jnp.asarray(rng.standard_normal((v, d)).astype(dt))
    hj = jnp.asarray(h)
    pl256 = sp.build_agg_plans(s, r, v, tile_e=256)
    t = timed(lambda a, b: sp.sddmm_dual(a, b, a, b, pl256.recv), (g, hj),
              n_iters=args.iters)
    report("sddmm_dual (full dw, one kernel)", t, useful)
    t = timed(lambda a, b: sp.sddmm(a, b, pl256.recv), (g, hj),
              n_iters=args.iters)
    report("sddmm single direction", t, useful)
    t = timed(lambda a, ww: sp._spmm_raw(a, ww, pl256.send), (g, w),
              n_iters=args.iters)
    report("spmm single direction", t, useful)

    # correctness spot check on chip
    mi, mo = sp.aggregate_pair(jnp.asarray(h), jnp.asarray(w), plans)
    emi, emo = sp.aggregate_pair_reference(jnp.asarray(h), jnp.asarray(w),
                                           sj, rj, v)
    err = float(jnp.max(jnp.abs(mi.astype(jnp.float32) - emi))
                + jnp.max(jnp.abs(mo.astype(jnp.float32) - emo)))
    print(f"max abs err vs oracle ({dt.name}): {err:.2e}")


if __name__ == "__main__":
    main()

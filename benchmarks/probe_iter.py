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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    for v, e, d in ((16384, 131072, 128), (4096, 32768, 64)):
        hd = d
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

        for name, f in (("xla chain", xla), ("unfused pallas", unfused),
                        ("fused iteration", mk_fused(plans)),
                        ("fused pre:int8", mk_fused(plansp))):
            t = timed(f, (pa, pb, h), n_iters=args.iters)
            tb = timed(fb(f), (pa, pb, h), n_iters=args.iters)
            print(f"V={v:6d} D={d:4d} {name:16s} fwd {t*1e6:8.1f} us   "
                  f"fwd+bwd {tb*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()

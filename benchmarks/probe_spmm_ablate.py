#!/usr/bin/env python3
"""Ablation: where does the fused SpMM kernel's time go?

Times kernel variants with pieces removed (same grid/blocks/IO) to
attribute cost: dynamic window slice, one-hot builds, each matmul, the
unaligned += accumulation.  Informs the kernel redesign loop.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.probe_ops import timed
from benchmarks.probe_spmm import layered_graph
from gnn_fpga_tpu.ops.pallas import spmm as sp

V, E, D, T, SUB = 16384, 131072, 128, 256, 8
DT = jnp.bfloat16


def build(kern, n_scalar=2, out_rows=None):
    group = T * SUB
    n_ranks_pad = ((V + 1 + 7) // 8) * 8 + T if out_rows is None else out_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(E // group,),
        in_specs=[
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ranks_pad, D), jnp.float32))


def main():
    rng = np.random.default_rng(0)
    h = rng.standard_normal((V, D)).astype(DT)
    w = rng.standard_normal((E,)).astype(np.float32)
    s, r = layered_graph(V, E)
    plan = sp.build_edge_plan(r, s, V, tile_e=T)
    W = plan.w_oth
    h_pad = np.pad(h, ((0, plan.table_rows - V), (0, 0)))
    w_sorted = w[plan.order]
    # seg-window machinery (the compact-rank scatter was removed from
    # EdgePlan: scatters now ride the seg-window one-hot)
    args_full = (plan.seg_win_off, plan.oth_win_off,
                 plan.sorted_seg[:, None],
                 plan.sorted_oth[:, None], w_sorted[:, None].astype(np.float32),
                 h_pad)

    def report(name, sec):
        print(f"{name:52s} {sec*1e6:9.1f} us  {E/sec/1e6:8.1f} Medge/s")

    def variant(name, body, **kw):
        k = build(body, **kw)

        def run(h_pad):
            return k(args_full[0], args_full[1],
                     jnp.asarray(args_full[2]), jnp.asarray(args_full[3]),
                     jnp.asarray(args_full[4]), h_pad)

        try:
            t = timed(run, (h_pad,), n_iters=500)
            report(name, t)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:150]}")

    P = jax.lax.Precision.DEFAULT

    # --- full kernel (current design)
    def k_full(ro, wo, ranks, oth, wgt, h_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for k in range(SUB):
            t = g * SUB + k
            sl = slice(k * T, (k + 1) * T)
            r0 = ro[t]
            v0 = pl.multiple_of(wo[t], 16)
            win = h_ref[pl.ds(v0, W), :]
            gcols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            oh_g = ((oth[sl] - v0) == gcols).astype(DT)
            gathered = jnp.dot(oh_g, win, preferred_element_type=jnp.float32,
                               precision=P)
            msgs = (gathered * wgt[sl]).astype(DT)
            scols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            oh_s = ((ranks[sl] - r0) == scols).astype(DT)
            partial = jax.lax.dot_general(
                oh_s, msgs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P)
            out_ref[pl.ds(r0, T), :] += partial

    variant("full (current)", k_full)

    # --- no gather: use static window slice
    def k_nogather(ro, wo, ranks, oth, wgt, h_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for k in range(SUB):
            t = g * SUB + k
            sl = slice(k * T, (k + 1) * T)
            r0 = ro[t]
            msgs = (h_ref[:T, :].astype(jnp.float32) * wgt[sl]).astype(DT)
            scols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            oh_s = ((ranks[sl] - r0) == scols).astype(DT)
            partial = jax.lax.dot_general(
                oh_s, msgs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P)
            out_ref[pl.ds(r0, T), :] += partial

    variant("scatter only (no gather matmul)", k_nogather)

    # --- no scatter: gather matmul, store to aligned slot
    def k_noscatter(ro, wo, ranks, oth, wgt, h_ref, out_ref):
        g = pl.program_id(0)
        acc = None
        for k in range(SUB):
            t = g * SUB + k
            sl = slice(k * T, (k + 1) * T)
            v0 = pl.multiple_of(wo[t], 16)
            win = h_ref[pl.ds(v0, W), :]
            gcols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            oh_g = ((oth[sl] - v0) == gcols).astype(DT)
            gathered = jnp.dot(oh_g, win, preferred_element_type=jnp.float32,
                               precision=P)
            msgs = gathered * wgt[sl]
            acc = msgs if acc is None else acc + msgs
        out_ref[:T, :] = acc

    variant("gather only (no scatter matmul/accum)", k_noscatter)

    # --- full but aligned accumulation (r0 aligned down to 8, width T+128)
    def k_aligned(ro, wo, ranks, oth, wgt, h_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for k in range(SUB):
            t = g * SUB + k
            sl = slice(k * T, (k + 1) * T)
            r0 = pl.multiple_of((ro[t] // 8) * 8, 8)
            v0 = pl.multiple_of(wo[t], 16)
            win = h_ref[pl.ds(v0, W), :]
            gcols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            oh_g = ((oth[sl] - v0) == gcols).astype(DT)
            gathered = jnp.dot(oh_g, win, preferred_element_type=jnp.float32,
                               precision=P)
            msgs = (gathered * wgt[sl]).astype(DT)
            scols = jax.lax.broadcasted_iota(jnp.int32, (T, T + 128), 1)
            oh_s = ((ranks[sl] - r0) == scols).astype(DT)
            partial = jax.lax.dot_general(
                oh_s, msgs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P)
            out_ref[pl.ds(r0, T + 128), :] += partial

    variant("full, 8-aligned accum (width T+128)", k_aligned,
            out_rows=((V + 1 + 7) // 8) * 8 + T + 128)

    # --- compute only: both matmuls, no dynamic slices at all
    def k_compute(ro, wo, ranks, oth, wgt, h_ref, out_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((T, D), jnp.float32)
        for k in range(SUB):
            sl = slice(k * T, (k + 1) * T)
            win = h_ref[:W, :]
            gcols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            oh_g = ((oth[sl]) == gcols).astype(DT)
            gathered = jnp.dot(oh_g, win, preferred_element_type=jnp.float32,
                               precision=P)
            msgs = (gathered * wgt[sl]).astype(DT)
            scols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            oh_s = ((ranks[sl]) == scols).astype(DT)
            partial = jax.lax.dot_general(
                oh_s, msgs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P)
            acc = acc + partial
        out_ref[:T, :] = acc

    variant("compute only (static slices, no accum)", k_compute)

    # --- one-hot builds only (no matmuls)
    def k_onehot(ro, wo, ranks, oth, wgt, h_ref, out_ref):
        g = pl.program_id(0)
        acc = jnp.zeros((T, D), jnp.float32)
        for k in range(SUB):
            sl = slice(k * T, (k + 1) * T)
            gcols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            oh_g = ((oth[sl]) == gcols).astype(DT)
            scols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            oh_s = ((ranks[sl]) == scols).astype(DT)
            acc = acc + oh_g[:, :D].astype(jnp.float32) \
                + oh_s[:, :D].astype(jnp.float32)
        out_ref[:T, :] = acc

    variant("one-hot builds only (no matmuls)", k_onehot)


if __name__ == "__main__":
    main()

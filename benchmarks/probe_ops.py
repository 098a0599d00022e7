#!/usr/bin/env python3
"""On-chip microbenchmarks for the GNN aggregation ops.

Honest timing: every measured call is data-dependent on the previous one
(a scalar carried through a one-element perturbation), so XLA cannot hoist
or CSE repeated applications, and the loop runs inside ONE jit dispatch;
the host reads back a scalar at the end (block_until_ready is unreliable
through the remote-TPU tunnel — see bench.py).

Usage: python benchmarks/probe_ops.py [--v 16384 --e 131072 --d 128]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(op, args, n_iters=200, n_reps=3):
    """Per-call seconds of ``op(*args)`` with forced sequential dependence.

    Two hazards this harness defends against (both bit round 1):

    - **DCE through a scalar probe.**  The loop carry must depend on the
      FULL output — reading only ``out[0]`` lets XLA slice through the op
      (e.g. compute one row of a matmul).  We carry ``jnp.sum(out)``.
    - **Fixed dispatch overhead.**  The remote-TPU tunnel costs ~25ms per
      executed program, so per-call time has a ``25ms / n_iters`` floor;
      ``n_iters`` must be large enough that the op under test dominates.
      (Round 1 used 20 iterations — every probe measured the tunnel.)

    ``op`` must return an array; the running sum perturbs one element of
    the first float arg of the next call (in-place in the loop carry).
    """

    def chained(args):
        def body(i, carry):
            c, args = carry
            first, rest = args[0], args[1:]
            first = first.at[(0,) * first.ndim].add(c * 1e-30)
            out = op(first, *rest)
            return jnp.sum(out).astype(jnp.float32), (first, *rest)

        c, _ = jax.lax.fori_loop(0, n_iters, body, (jnp.float32(0), args))
        return c

    fn = jax.jit(chained)
    args = tuple(jnp.asarray(a) for a in args)
    float(fn(args))  # compile + warm
    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        float(fn(args))
        best = min(best, time.perf_counter() - t0)
    return best / n_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=16384)
    ap.add_argument("--e", type=int, default=131072)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    v, e, d = args.v, args.e, args.d
    dt = jnp.dtype(args.dtype)
    bytes_per = dt.itemsize

    rng = np.random.default_rng(0)
    h = rng.standard_normal((v, d)).astype(dt)
    msgs = rng.standard_normal((e, d)).astype(dt)
    idx = np.sort(rng.integers(0, v, size=e)).astype(np.int32)
    ridx = rng.permutation(idx).astype(np.int32)
    w = rng.standard_normal((e,)).astype(dt)

    print(f"# V={v} E={e} D={d} dtype={dt.name} "
          f"(h {v*d*bytes_per/1e6:.1f}MB, msgs {e*d*bytes_per/1e6:.1f}MB)")

    def report(name, sec, bytes_moved):
        print(f"{name:42s} {sec*1e6:9.1f} us   {bytes_moved/sec/1e9:7.1f} GB/s")

    # 1. gather h[idx] (random)
    t = timed(lambda h, i: jnp.take(h, i, axis=0), (h, ridx))
    report("gather random idx", t, (v + e) * d * bytes_per)

    # 2. gather h[idx] (sorted)
    t = timed(lambda h, i: jnp.take(h, i, axis=0), (h, idx))
    report("gather sorted idx", t, (v + e) * d * bytes_per)

    # 3. segment_sum random ids
    t = timed(lambda m, i: jax.ops.segment_sum(m, i, num_segments=v),
              (msgs, ridx))
    report("segment_sum random", t, (e + v) * d * bytes_per)

    # 4. segment_sum sorted ids (with hints)
    t = timed(lambda m, i: jax.ops.segment_sum(
        m, i, num_segments=v, indices_are_sorted=True), (msgs, idx))
    report("segment_sum sorted", t, (e + v) * d * bytes_per)

    # 5. weighted gather+segsum fused by XLA (the full aggregation)
    t = timed(lambda h, i, ri, w: jax.ops.segment_sum(
        jnp.take(h, i, axis=0) * w[:, None], ri, num_segments=v),
        (h, ridx, idx, w))
    report("XLA gather*w+segsum", t, (v + 2 * e + v) * d * bytes_per)

    # 6. existing pallas sorted segment-sum
    from gnn_fpga_tpu.ops.pallas.segment_sum import (
        build_sorted_segments, sorted_segment_sum)
    seg = build_sorted_segments(idx, v)
    seg = jax.tree.map(jnp.asarray, seg)
    t = timed(lambda m: sorted_segment_sum(m, seg, v), (msgs,))
    report("pallas sorted_segment_sum (r1)", t, (e + v) * d * bytes_per)

    # 7. pallas grid-step floor: trivial passthrough kernel, varying tiles
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def passthrough(tile):
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        n_tiles = e // tile
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((tile, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((e, d), dt),
        )

    for tile in (256, 512, 1024):
        t = timed(lambda m, k=passthrough(tile): k(m), (msgs,))
        report(f"pallas passthrough tile={tile} "
               f"({e//tile} steps)", t, 2 * e * d * bytes_per)

    # 8. in-kernel VMEM dynamic gather feasibility (jnp.take inside pallas)
    def gather_kernel_builder(tile):
        def kern(idx_ref, h_ref, o_ref):
            ids = idx_ref[:, 0]
            o_ref[:] = jnp.take(h_ref[:], ids, axis=0)

        n_tiles = e // tile
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, 1), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full h resident
            ],
            out_specs=pl.BlockSpec((tile, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((e, d), dt),
        )

    try:
        k = gather_kernel_builder(512)
        out = k(ridx[:, None], h)
        ok = np.allclose(np.asarray(out), np.asarray(h)[ridx], atol=1e-5)
        t = timed(lambda hh, k=k: k(jnp.asarray(ridx[:, None]), hh), (h,))
        report(f"pallas VMEM-resident take (correct={ok})", t,
               (v + e) * d * bytes_per)
    except Exception as ex:  # noqa: BLE001
        print(f"pallas VMEM take: FAILED: {type(ex).__name__}: "
              f"{str(ex)[:200]}")


if __name__ == "__main__":
    main()

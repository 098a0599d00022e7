#!/usr/bin/env python3
"""On-chip sweep of the fused-kernel knobs at the fullevent bench config.

The roofline model (`utils/flops.py::fused_step_cost`) puts the fused
path's attainable bound at ~3.0 ms/step on v5e (MXU-bound at ~596
executed GFLOP/step for useful 75) — the r4 recorded step was 14.25 ms,
i.e. ~21% kernel efficiency.  This probe times the FULL train step
(fwd + bwd + Adam, scan over distinct batches — exactly bench.py's
harness) across the tunable kernel parameters to close that gap:

- ``tile_e``   (256 / 512): edges per MXU tile — larger tiles mean
  fewer, bigger [T, W] matmuls and half the per-tile window slices;
- ``subtiles`` (4 / 8 / 16): edge tiles per grid step — amortises the
  ~1 us/step grid+DMA overhead (176 grid steps/launch at 256x4);
- ``precompute`` (None / int8): stream prebuilt one-hots from HBM
  instead of rebuilding on the VPU.

Usage: python benchmarks/probe_fullevent.py [--steps 8 --reps 3]
Results are recorded in `ops/pallas/spmm.py`'s header table and back the
bench.py fullevent defaults.
"""

from __future__ import annotations

import argparse
import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_stacks(n_steps, tile_e, precompute, n_sectors=36, n_layers=20,
                 n_tracks=22, k=12, seed0=0):
    from gnn_fpga_tpu.core import graph as graph_lib
    from gnn_fpga_tpu.data import toy2d

    v = n_sectors * n_layers * n_tracks
    e_real = n_sectors * (n_layers - 1) * n_tracks * k
    n_edge = -(-e_real // tile_e) * tile_e
    n_node = v + 8

    def make(seed):
        gs = toy2d.make_knn_segment_graphs(
            toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks,
                              seed=seed), n_sectors, k=k)
        g = graph_lib.pack_graphs(graph_lib.unbatch_graphs(gs),
                                  n_node=n_node, n_edge=n_edge)
        return graph_lib.attach_plans(g, tile_e=tile_e,
                                      precompute=precompute)

    batches = [make(seed0 + s) for s in range(n_steps)]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)
    return stacked, v, e_real


def time_step(stacked, n_steps, reps):
    import io, contextlib

    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.train.trainer import Trainer, TrainConfig

    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=64, n_iters=6,
        compute_dtype=jnp.bfloat16, aggregation="pallas")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    with contextlib.redirect_stdout(io.StringIO()):
        tr = Trainer(
            lambda p, gr, m: mpnn.segment_classifier_logits(p, gr, mcfg, m),
            params, TrainConfig(learning_rate=3e-3, pos_weight=8.0))
    tr.run_steps(stacked)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        tr.run_steps(stacked)  # loss readback syncs
        best = min(best, time.perf_counter() - t0)
    return best / n_steps


def main():
    from gnn_fpga_tpu.ops.pallas import spmm as sp

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiles", type=int, nargs="*", default=[256, 512])
    ap.add_argument("--subtiles", type=int, nargs="*", default=[4, 8, 16])
    ap.add_argument("--pre", nargs="*", default=["none", "int8"])
    args = ap.parse_args()

    print(f"# devices: {jax.devices()}")
    edges = None
    for tile_e, pre in itertools.product(args.tiles, args.pre):
        precompute = None if pre == "none" else pre
        stacked, v, e_real = build_stacks(args.steps, tile_e, precompute)
        if edges is None:
            edges = float(np.asarray(stacked.edge_mask).sum()) / args.steps
        for subtiles in args.subtiles:
            sp.DEFAULT_SUBTILES = subtiles
            try:
                dt = time_step(stacked, args.steps, args.reps)
            except Exception as ex:  # OOM/VMEM: record and continue
                print(f"tile={tile_e:4d} sub={subtiles:3d} pre={pre:5s}"
                      f"  FAILED: {type(ex).__name__}: {str(ex)[:120]}",
                      flush=True)
                continue
            print(f"tile={tile_e:4d} sub={subtiles:3d} pre={pre:5s}  "
                  f"{dt*1e3:7.3f} ms/step  {edges/dt/1e6:7.2f} Medge/s",
                  flush=True)
    sp.DEFAULT_SUBTILES = 4


if __name__ == "__main__":
    main()

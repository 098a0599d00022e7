#!/usr/bin/env python3
"""On-chip benchmark: blocked (layered) incidence vs dense vs sparse.

Times the FULL jitted SegmentClassifier train step (fwd + bwd + Adam,
scan-of-steps over distinct batches, exactly the bench.py harness) with
the aggregation layout swept:

- ``dense``   — full one-hot ``[V, E]`` incidence bmms
  (`ops/dense_incidence.py`; the MXU translation of the reference's
  ``bmm(Ri*e, ...)`` hot loop, `/root/reference/gnn/model.py:113-119`);
- ``blocked group=g`` — per-layer-pair block-diagonal incidence
  (`ops/blocked.py`): ~n_layers x fewer FLOPs on layered graphs;
- ``sparse``  — COO gather + ``jax.ops.segment_sum``.

Two scales:
- sector (the bench.py mu200 headline config): 16 graphs of V=440 /
  E=5016 kNN windowed edges, h=64, 6 iterations;
- fullevent: 2 graphs of V=3200 / E=36480 (n_tracks=160), same model —
  the regime where the full dense one-hot (V*E = 117M) stops fitting.

Usage:  python benchmarks/probe_blocked.py [--metric sector|fullevent|both]

Measured numbers are recorded in `ops/blocked.py`'s module docstring and
back the blocked-path routing defaults in `models/mpnn.py`.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_stacked(cfg, n_steps, batch, seed0, group=None, block_e=None):
    """[n_steps] stacked batches of kNN toy graphs, blocks attached when
    ``group`` is given (per-batch attach, then stack — BlockedPlan leaves
    stack like any other pytree leaf; shapes are static by construction)."""
    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.ops import blocked as blk

    offs = toy2d.layer_offsets(cfg)
    batches = []
    for s in range(n_steps):
        g = toy2d.make_knn_segment_graphs(
            toy2d.Toy2DConfig(n_layers=cfg.n_layers, n_tracks=cfg.n_tracks,
                              seed=seed0 + s), batch, k=12)
        if group is not None:
            g = blk.attach_blocks_layered(g, offs, group=group,
                                          block_e=block_e)
        batches.append(g)
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *batches)


def time_mode(label, aggregation, cfg, hidden, n_iters, n_steps, batch,
              group=None, n_reps=3):
    import io, contextlib

    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.train.trainer import Trainer, TrainConfig

    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=hidden, n_iters=n_iters,
        compute_dtype=jnp.bfloat16, aggregation=aggregation)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    with contextlib.redirect_stdout(io.StringIO()):
        tr = Trainer(
            lambda p, gr, m: mpnn.segment_classifier_logits(p, gr, mcfg, m),
            params, TrainConfig(learning_rate=3e-3, pos_weight=8.0))

    be = None
    if group is not None:
        be = -(-group * cfg.n_tracks * 12 // 8) * 8
    stacked = make_stacked(cfg, n_steps, batch, seed0=0, group=group,
                           block_e=be)
    edges_per_scan = float(np.asarray(stacked.edge_mask).sum())
    tr.run_steps(stacked)  # compile + warm

    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        losses = tr.run_steps(stacked)  # loss readback syncs
        best = min(best, time.perf_counter() - t0)
    ms_step = best / n_steps * 1e3
    eps = edges_per_scan / best
    print(f"{label:28s} {ms_step:8.2f} ms/step  {eps/1e6:8.1f} Medge/s  "
          f"(loss {float(losses[-1]):.3f})")
    return ms_step, eps


def run_scale(name, n_layers, n_tracks, hidden, n_iters, n_steps, batch,
              groups, with_dense, with_sparse=True):
    from gnn_fpga_tpu.data import toy2d

    cfg = toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks)
    v = n_layers * n_tracks
    e = (n_layers - 1) * n_tracks * 12
    print(f"\n# {name}: V={v} E={e} h={hidden} iters={n_iters} "
          f"batch={batch} (V*E={v*e/1e6:.1f}M)")
    results = {}
    if with_dense:
        results["dense"] = time_mode("dense", "dense", cfg, hidden,
                                     n_iters, n_steps, batch)
    for g in groups:
        results[f"blocked g={g}"] = time_mode(
            f"blocked group={g}", "blocked", cfg, hidden, n_iters,
            n_steps, batch, group=g)
    if with_sparse:
        results["sparse"] = time_mode("sparse", "sparse", cfg, hidden,
                                      n_iters, n_steps, batch)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric",
                    choices=["sector", "fullevent", "fullevent36", "both"],
                    default="both")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--groups", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--no-sparse", action="store_true")
    args = ap.parse_args()

    print(f"# devices: {jax.devices()}")
    if args.metric in ("sector", "both"):
        run_scale("sector (bench.py mu200 config)", 20, 22, 64, 6,
                  args.steps, 16, args.groups, with_dense=True,
                  with_sparse=not args.no_sparse)
    if args.metric in ("fullevent", "both"):
        run_scale("fullevent", 20, 160, 64, 6, max(args.steps // 4, 8), 2,
                  args.groups, with_dense=False,
                  with_sparse=not args.no_sparse)
    if args.metric == "fullevent36":
        # The bench.py fullevent WORKLOAD (36 mu200 sectors per step) in
        # blocked layout: a [36, 440] batch instead of one packed
        # V=15.8k graph — the natural blocked form of the same work (a
        # packed-graph blocked plan would need a [nB*bn, 15848]
        # broadcast one-hot, which stops fitting; batching keeps V at
        # sector size).  Head-to-head vs the pallas packed path backs
        # the fullevent bench's routing (VERDICT r4 missing #4).
        run_scale("fullevent 36-sector batch", 20, 22, 64, 6,
                  max(args.steps // 4, 8), 36, args.groups,
                  with_dense=True, with_sparse=not args.no_sparse)


if __name__ == "__main__":
    main()

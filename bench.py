#!/usr/bin/env python3
"""Training-throughput benchmark (single chip).

Measures edges/s/chip of the jitted SegmentClassifier training step in the
reference's ACTS mu10 headline config — hidden 32, 4 message-passing
iterations, batch 32 (`MPNN_Seg_ACTS.ipynb:cell16,23`) — on synthetic
mu10-scale graphs (100 nodes / 900 candidate edges per event, heavier than
the reference's sectored mu10 graphs, so the comparison is conservative).

Layout: vmapped batch + dense-incidence bmm aggregation (the MXU path,
see ops/dense_incidence.py) in bf16 mixed precision (f32 master weights,
f32 loss/logits).  All optimizer steps of an epoch run in ONE device
dispatch (lax.scan, Trainer.run_steps).  Timing is synchronised by the
host readback of the per-step losses inside run_steps — NOT
block_until_ready, which does not reliably block through the remote-TPU
tunnel (measured: it can return ~1000x early).

Baseline: the reference trains ~55 graphs/s in this config on its GPU
(0.29 s/epoch over 512 graphs, `MPNN_Seg_ACTS.ipynb:cell23`; BASELINE.md).
``vs_baseline`` = our graphs/s / 55.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.train.trainer import Trainer, TrainConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", choices=["mu10", "mu200"], default="mu10",
                    help="mu10: reference headline config (has a baseline "
                         "number). mu200: the BASELINE.json north-star scale "
                         "— 2 full 200-pileup-scale events per step, split "
                         "into 8 phi-sectors each (the framework's sector-"
                         "dense layout; the reference copes at this scale "
                         "only with batch=2 + subsampling, "
                         "MPNN_Seg_ACTS_mu200.ipynb:cell15).")
    args = ap.parse_args()

    if args.metric == "mu10":
        # 32 graphs of 100 nodes / 900 edges; h=32, 4 iters
        n_layers, n_tracks, batch = 10, 10, 32
        hidden, n_iters = 32, 4
        metric = "train_edges_per_s_per_chip_mu10_h32_i4_b32"
        baseline_graphs_per_s = 55.0  # MPNN_Seg_ACTS.ipynb:cell23
    else:
        # 2 events x 8 sectors of 440 nodes / ~3960 edges; h=64, 6 iters
        n_layers, n_tracks, batch = 10, 44, 16
        hidden, n_iters = 64, 6
        metric = "train_edges_per_s_per_chip_mu200_h64_i6_ev2"
        # reference mu200: batch 2 events, ~37 s/epoch over 89 train graphs
        # on CPU (MPNN_Seg_ACTS_mu200.ipynb) => ~2.4 graphs(events)/s; in
        # sector units (8 sectors/event) ~19/s.
        baseline_graphs_per_s = 19.0

    cfg = toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks, seed=0)
    g = toy2d.make_segment_graphs(cfg, batch)
    batch_graph = jax.tree.map(lambda a: jnp.asarray(a) if a is not None else None, g)
    edges_per_graph = int(np.asarray(g.edge_mask).sum() / batch)

    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=hidden, n_iters=n_iters,
        compute_dtype=jnp.bfloat16, aggregation="dense")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        tr = Trainer(
            lambda p, gr, m: mpnn.segment_classifier_logits(p, gr, mcfg, m),
            params, TrainConfig())

    # One epoch of steps per dispatch; losses readback syncs each call.
    n_steps = 512 if args.metric == "mu10" else 128
    stacked = jax.tree.map(
        lambda a: (jnp.broadcast_to(a[None], (n_steps,) + a.shape)
                   if a is not None else None),
        batch_graph)

    # Compile + warm-up (run_steps ends with a host readback of losses)
    tr.run_steps(stacked)

    n_reps = 4
    t0 = time.perf_counter()
    for _ in range(n_reps):
        losses = tr.run_steps(stacked)
    dt = time.perf_counter() - t0

    graphs_per_s = n_reps * n_steps * batch / dt
    edges_per_s = graphs_per_s * edges_per_graph
    print(json.dumps({
        "metric": metric,
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(graphs_per_s / baseline_graphs_per_s, 2),
    }))


if __name__ == "__main__":
    main()

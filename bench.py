#!/usr/bin/env python3
"""Training-throughput benchmark (single chip).

Default metric (the BASELINE.md:24-28 north-star): edges/s/chip of the
jitted SegmentClassifier training step at ACTS-mu200 scale — hidden 64,
6 message-passing iterations, 2 full 200-pileup-scale events per step
split into 8 phi-sectors each (the reference copes at this scale only
with batch=2 + subsampling, `MPNN_Seg_ACTS_mu200.ipynb:cell15`) — plus
the AUC the same run converges to (throughput without learning is
meaningless; BASELINE.md demands parity).

``--metric mu10`` keeps the reference's headline config — hidden 32, 4
iterations, batch 32 (`MPNN_Seg_ACTS.ipynb:cell16,23`) — which has a
*measured* reference baseline (55 graphs/s on its GPU).  The mu200
baseline is an estimate (CPU epoch timing extrapolated to sector units),
so the JSON marks it "estimated".

Honesty rules (VERDICT r1):
- every optimizer step consumes a DISTINCT batch (no same-batch
  re-broadcast XLA could hoist work out of);
- timing is synchronised by host readback of the per-step losses — NOT
  block_until_ready, which does not reliably block through the
  remote-TPU tunnel (measured: it can return ~1000x early);
- the AUC is evaluated on held-out graphs after the timed steps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_batches(n_steps, batch, cfg_fn, seed0=0):
    """n_steps distinct stacked batches (stacked on the scan axis)."""
    from gnn_fpga_tpu.data import toy2d

    batches = [toy2d.make_segment_graphs(cfg_fn(seed0 + s), batch)
               for s in range(n_steps)]
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *batches)


def main():
    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.train import metrics as metrics_lib
    from gnn_fpga_tpu.train.trainer import Trainer, TrainConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", choices=["mu10", "mu200"], default="mu200")
    ap.add_argument("--no-auc", action="store_true",
                    help="skip the AUC evaluation (throughput only)")
    args = ap.parse_args()

    if args.metric == "mu10":
        # 32 graphs of 100 nodes / 900 edges; h=32, 4 iters
        n_layers, n_tracks, batch = 10, 10, 32
        hidden, n_iters = 32, 4
        n_steps = 512
        metric = "train_edges_per_s_per_chip_mu10_h32_i4_b32"
        baseline_graphs_per_s = 55.0  # MPNN_Seg_ACTS.ipynb:cell23, measured
        baseline_kind = "measured"
        auc_gate = 0.93
    else:
        # 2 events x 8 sectors of 440 nodes / ~3960 edges; h=64, 6 iters
        n_layers, n_tracks, batch = 10, 44, 16
        hidden, n_iters = 64, 6
        n_steps = 128
        metric = "train_edges_per_s_per_chip_mu200_h64_i6_ev2"
        # reference mu200: batch 2 events, ~37 s/epoch over 89 train graphs
        # on CPU (MPNN_Seg_ACTS_mu200.ipynb) => ~2.4 events/s; in sector
        # units (8 sectors/event) ~19/s.  ESTIMATED, not measured.
        baseline_graphs_per_s = 19.0
        baseline_kind = "estimated"
        auc_gate = 0.93

    cfg_fn = lambda seed: toy2d.Toy2DConfig(n_layers=n_layers,
                                            n_tracks=n_tracks, seed=seed)
    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=hidden, n_iters=n_iters,
        compute_dtype=jnp.bfloat16, aggregation="dense")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        tr = Trainer(
            lambda p, gr, m: mpnn.segment_classifier_logits(p, gr, mcfg, m),
            params, TrainConfig())

    # n_steps DISTINCT batches, one optimizer step each, in ONE device
    # dispatch (lax.scan); losses readback syncs each call.
    stacked = make_batches(n_steps, batch, cfg_fn)
    edges_per_batch = float(np.asarray(stacked.edge_mask[0]).sum())

    tr.run_steps(stacked)  # compile + warm-up (also trains n_steps steps)

    n_reps = 4
    t0 = time.perf_counter()
    for rep in range(n_reps):
        losses = tr.run_steps(stacked)
    dt = time.perf_counter() - t0

    graphs_per_s = n_reps * n_steps * batch / dt
    edges_per_s = n_reps * n_steps * edges_per_batch / dt
    record = {
        "metric": metric,
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(graphs_per_s / baseline_graphs_per_s, 2),
        "baseline": baseline_kind,
        "final_loss": round(float(losses[-1]), 4),
    }

    if not args.no_auc:
        # AUC on held-out graphs after the (1 + n_reps) * n_steps
        # training steps above — throughput with learning verified.
        gv = toy2d.make_segment_graphs(cfg_fn(990001), batch)
        probs = np.asarray(tr._predict(
            tr.params, jax.tree.map(jnp.asarray, gv))).ravel()
        auc = metrics_lib.roc_auc(probs, np.asarray(gv.y).ravel(),
                                  np.asarray(gv.edge_mask).ravel())
        record["auc"] = round(float(auc), 4)
        record["auc_gate"] = auc_gate
        if auc < auc_gate:
            raise SystemExit(
                f"AUC {auc:.4f} below gate {auc_gate} — throughput without "
                f"learning is not a benchmark: {json.dumps(record)}")

    print(json.dumps(record))


if __name__ == "__main__":
    main()

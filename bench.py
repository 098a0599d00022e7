#!/usr/bin/env python3
"""Training-throughput benchmark (single chip).

Default metric (the BASELINE.md:24-28 north-star): edges/s/chip of the
jitted SegmentClassifier training step at ACTS-mu200 scale — hidden 64,
6 message-passing iterations (`MPNN_Seg_ACTS_mu200.ipynb:cell15`), 16
phi-sector-scale graphs of 440 nodes / ~5k windowed candidate edges per
step — plus the AUC the same run converges to (throughput without
learning is meaningless; BASELINE.md demands parity).

The graphs use k-NN windowed candidate edges
(`toy2d.make_knn_segment_graphs`) — the static-shape counterpart of the
reference's doublet preselection windows (`prepareGraphs.py:101-134`).
The all-pairs variant at this density is dominated by geometrically
plausible fakes; the reference's own mu200 training collapses there
(recall 0.042, `MPNN_Seg_ACTS_mu200.ipynb:cell26`) and so does any
model of this family — windowed candidates are what real pipelines
train on, and what the AUC gate is meaningful for.

``--metric mu10`` keeps the reference's headline config — hidden 32, 4
iterations, batch 32, all-pairs edges (`MPNN_Seg_ACTS.ipynb:cell16,23`)
— which has a *measured* reference baseline (55 graphs/s on its GPU).
The mu200 baseline is an estimate (CPU epoch timing extrapolated to
sector units), so the JSON marks it "estimated".

Honesty rules (VERDICT r1):
- every optimizer step inside the timed scan consumes a DISTINCT batch
  (no same-batch re-broadcast XLA could hoist work out of);
- timing is synchronised by host readback of the per-step losses — NOT
  block_until_ready, which does not reliably block through the
  remote-TPU tunnel (measured: it can return ~1000x early);
- the AUC is evaluated on held-out graphs after the timed steps and
  GATES the benchmark: no JSON line is printed unless the run learned.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def stack_device(batches):
    """Stack a list of batched Graphs on a new leading (scan) axis."""
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
        # 32 graphs of 100 nodes / 900 all-pairs edges; h=32, 4 iters
        batch, hidden, n_iters = 32, 32, 4
        n_steps, n_pretrain = 512, 2
        metric = "train_edges_per_s_per_chip_mu10_h32_i4_b32"
        baseline_graphs_per_s = 55.0  # MPNN_Seg_ACTS.ipynb:cell23, measured
        baseline_kind = "measured"
        auc_gate = 0.93
        tcfg = TrainConfig(learning_rate=1e-3, pos_weight=4.0)

        def make(seed, n):
            return toy2d.make_segment_graphs(
                toy2d.Toy2DConfig(n_layers=10, n_tracks=10, seed=seed), n)
    else:
        # 16 sector-scale graphs of 440 nodes / 5016 windowed edges;
        # h=64, 6 iters (the reference mu200 model config)
        batch, hidden, n_iters = 16, 64, 6
        n_steps, n_pretrain = 128, 11
        metric = "train_edges_per_s_per_chip_mu200_h64_i6"
        # reference mu200: batch 2 events, ~37 s/epoch over 89 train graphs
        # on CPU (MPNN_Seg_ACTS_mu200.ipynb) => ~2.4 events/s; in sector
        # units (8 sectors/event) ~19/s.  ESTIMATED, not measured.
        baseline_graphs_per_s = 19.0
        baseline_kind = "estimated"
        auc_gate = 0.93
        # 1:11 true:fake imbalance — unweighted BCE collapses to the base
        # rate exactly as the reference's mu200 run does
        tcfg = TrainConfig(learning_rate=3e-3, pos_weight=8.0)

        def make(seed, n):
            return toy2d.make_knn_segment_graphs(
                toy2d.Toy2DConfig(n_layers=20, n_tracks=22, seed=seed), n,
                k=12)

    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=hidden, n_iters=n_iters,
        compute_dtype=jnp.bfloat16, aggregation="dense")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        tr = Trainer(
            lambda p, gr, m: mpnn.segment_classifier_logits(p, gr, mcfg, m),
            params, tcfg)

    def make_stack(seed0):
        return stack_device([make(seed0 + s, batch) for s in range(n_steps)])

    # Pre-train to past the AUC gate's knee (measured: this config crosses
    # 0.93 at ~500 steps, 0.95+ by 1500), every step a distinct batch;
    # first call also compiles the scan.
    for r in range(n_pretrain):
        losses = tr.run_steps(make_stack(r * n_steps))

    # Timed region: n_steps DISTINCT batches per rep, one optimizer step
    # each, in ONE device dispatch (lax.scan); loss readback syncs each
    # call.  The stacked pytree is reused across reps (separate
    # dispatches; within-scan batches stay distinct).
    stacked = make_stack(n_pretrain * n_steps)
    edges_per_scan = float(np.asarray(stacked.edge_mask).sum())
    tr.run_steps(stacked)  # warm path for this buffer layout

    n_reps = 4
    t0 = time.perf_counter()
    for rep in range(n_reps):
        losses = tr.run_steps(stacked)
    dt = time.perf_counter() - t0

    graphs_per_s = n_reps * n_steps * batch / dt
    edges_per_s = n_reps * edges_per_scan / dt
    record = {
        "metric": metric,
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(graphs_per_s / baseline_graphs_per_s, 2),
        "baseline": baseline_kind,
        "final_loss": round(float(losses[-1]), 4),
    }

    if not args.no_auc:
        # AUC on held-out graphs after the (n_pretrain + 1 + n_reps) *
        # n_steps training steps above — throughput with learning verified.
        gv = make(990001, batch)
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

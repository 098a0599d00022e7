#!/usr/bin/env python3
"""Training-throughput benchmark (single chip).

Emits one JSON line per metric; the LAST line is the headline
(BASELINE.md:24-28 north-star): edges/s/chip of the jitted
SegmentClassifier training step at ACTS-mu200 scale — hidden 64, 6
message-passing iterations (`MPNN_Seg_ACTS_mu200.ipynb:cell15`), 16
phi-sector-scale graphs of 440 nodes / ~5k windowed candidate edges per
step — plus the AUC the same run converges to (throughput without
learning is meaningless; BASELINE.md demands parity).  The mu200 step
runs the **blocked layered-incidence** aggregation (`ops/blocked.py`,
group=4) — measured fastest at this scale (2.6 vs 3.7 ms/step dense vs
40 ms sparse; `benchmarks/probe_blocked.py`).

Metrics (``--metric``, default ``all`` = mu10, fullevent, then mu200):

- ``mu10``   — the reference's measured headline config: hidden 32, 4
  iterations, batch 32, all-pairs edges (`MPNN_Seg_ACTS.ipynb:cell16,23`,
  55 graphs/s measured on its GPU).
- ``fullevent`` — ONE packed graph of V=16,000 / E=182,400 kNN windowed
  edges per step (the `MPNN_Seg_ACTS_fullEvents.ipynb` axis at mu200
  pileup): the regime the fused Pallas SpMM/SDDMM kernels
  (`ops/pallas/spmm.py`) were built for; the record carries the XLA
  sparse-path time for comparison.
- ``mu200``  — the headline above.  Its baseline is an ESTIMATE (CPU
  epoch timing extrapolated to sector units, the reference publishes no
  mu200 throughput); the JSON marks it "estimated".  mu10's baseline is
  measured.

Every record also carries useful-FLOP accounting (`utils/flops.py`):
``ms_per_step``, ``useful_tflops`` (sparse-equivalent model FLOP rate)
and ``mfu`` (fraction of chip peak bf16) — the honesty number that
separates kernel efficiency from dispatch amortisation.

Honesty rules (VERDICT r1):
- every optimizer step inside the timed scan consumes a DISTINCT batch
  (no same-batch re-broadcast XLA could hoist work out of);
- timing is synchronised by host readback of the per-step losses — NOT
  block_until_ready, which does not reliably block through the
  remote-TPU tunnel (measured: it can return ~1000x early);
- the AUC is evaluated on >=64 held-out graphs after the timed steps and
  GATES each metric: no JSON line is printed unless the run learned.
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


def make_trainer(mcfg, tcfg, seed=0):
    import io, contextlib

    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.train.trainer import Trainer

    params = mpnn.init_segment_classifier(jax.random.PRNGKey(seed), mcfg)
    with contextlib.redirect_stdout(io.StringIO()):
        return Trainer(
            lambda p, gr, m: mpnn.segment_classifier_logits(p, gr, mcfg, m),
            params, tcfg)


def timed_run(tr, make_stack, n_pretrain, n_steps, n_reps=4):
    """Pretrain past the AUC knee, then time n_reps x n_steps distinct-
    batch optimizer steps (one lax.scan dispatch per rep; loss readback
    syncs each call).  Returns (seconds, edges_per_scan, last_losses)."""
    for r in range(n_pretrain):
        losses = tr.run_steps(make_stack(r))
    stacked = make_stack(n_pretrain)
    edges_per_scan = float(np.asarray(stacked.edge_mask).sum())
    tr.run_steps(stacked)  # warm path for this buffer layout
    t0 = time.perf_counter()
    for rep in range(n_reps):
        losses = tr.run_steps(stacked)
    return time.perf_counter() - t0, n_reps * edges_per_scan, losses


def gated_auc(tr, graphs_eval, gate, record):
    """Held-out AUC after training; raises unless the run learned."""
    from gnn_fpga_tpu.train import metrics as metrics_lib

    probs, ys, ms = [], [], []
    for gv in graphs_eval:
        p = np.asarray(tr._predict(tr.params,
                                   jax.tree.map(jnp.asarray, gv))).ravel()
        probs.append(p)
        ys.append(np.asarray(gv.y).ravel())
        ms.append(np.asarray(gv.edge_mask).ravel())
    auc = metrics_lib.roc_auc(np.concatenate(probs), np.concatenate(ys),
                              np.concatenate(ms))
    record["auc"] = round(float(auc), 4)
    record["auc_gate"] = gate
    if auc < gate:
        raise SystemExit(
            f"AUC {auc:.4f} below gate {gate} — throughput without "
            f"learning is not a benchmark: {json.dumps(record)}")


def flop_fields(record, mcfg, n_node_real, n_edge_real, steps_per_s):
    from gnn_fpga_tpu.utils import flops as fl

    fwd = fl.segment_classifier_flops(
        n_node_real, n_edge_real, mcfg.hidden_dim, mcfg.n_iters,
        mcfg.input_dim)
    rate = fl.train_step_flops(fwd) * steps_per_s
    record["ms_per_step"] = round(1e3 / steps_per_s, 3)
    record["useful_tflops"] = round(rate / 1e12, 4)
    m = fl.mfu(rate)
    record["mfu"] = None if m is None else round(m, 5)


def run_mu10(no_auc: bool):
    """Reference headline config — MEASURED baseline (55 graphs/s GPU)."""
    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.train.trainer import TrainConfig

    batch, hidden, n_iters, n_steps = 32, 32, 4, 512
    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=hidden, n_iters=n_iters,
        compute_dtype=jnp.bfloat16, aggregation="dense")
    tr = make_trainer(mcfg, TrainConfig(learning_rate=1e-3, pos_weight=4.0))

    def make(seed, n):
        return toy2d.make_segment_graphs(
            toy2d.Toy2DConfig(n_layers=10, n_tracks=10, seed=seed), n)

    def make_stack(r):
        return stack_device([make(r * n_steps + s, batch)
                             for s in range(n_steps)])

    dt, edges, losses = timed_run(tr, make_stack, n_pretrain=2,
                                  n_steps=n_steps)
    graphs_per_s = 4 * n_steps * batch / dt
    record = {
        "metric": "train_edges_per_s_per_chip_mu10_h32_i4_b32",
        "value": round(edges / dt, 1),
        "unit": "edges/s",
        "vs_baseline": round(graphs_per_s / 55.0, 2),
        "baseline": "measured",
        "final_loss": round(float(losses[-1]), 4),
    }
    flop_fields(record, mcfg, batch * 100, batch * 900,
                4 * n_steps / dt)
    if not no_auc:
        gated_auc(tr, [make(990001 + i, batch) for i in range(2)],
                  0.93, record)
    print(json.dumps(record), flush=True)


def run_mu200(no_auc: bool):
    """Headline: sector-scale mu200 config on the blocked layered path."""
    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.ops import blocked as blk
    from gnn_fpga_tpu.train.trainer import TrainConfig

    batch, hidden, n_iters, n_steps, group = 16, 64, 6, 128, 4
    cfg0 = toy2d.Toy2DConfig(n_layers=20, n_tracks=22)
    offs = toy2d.layer_offsets(cfg0)
    block_e = -(-group * cfg0.n_tracks * 12 // 8) * 8
    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=hidden, n_iters=n_iters,
        compute_dtype=jnp.bfloat16, aggregation="blocked")
    # 1:11 true:fake imbalance — unweighted BCE collapses to the base
    # rate exactly as the reference's mu200 run does
    tr = make_trainer(mcfg, TrainConfig(learning_rate=3e-3, pos_weight=8.0))

    def make(seed, n, blocks=True):
        g = toy2d.make_knn_segment_graphs(
            toy2d.Toy2DConfig(n_layers=20, n_tracks=22, seed=seed), n, k=12)
        if blocks:
            g = blk.attach_blocks_layered(g, offs, group=group,
                                          block_e=block_e)
        return g

    def make_stack(r):
        return stack_device([make(r * n_steps + s, batch)
                             for s in range(n_steps)])

    # Pre-train to past the AUC gate's knee (measured: this config crosses
    # 0.93 at ~500 steps, 0.95+ by 1500), every step a distinct batch.
    dt, edges, losses = timed_run(tr, make_stack, n_pretrain=11,
                                  n_steps=n_steps)
    graphs_per_s = 4 * n_steps * batch / dt
    # reference mu200: batch 2 events, ~37 s/epoch over 89 train graphs
    # on CPU (MPNN_Seg_ACTS_mu200.ipynb) => ~2.4 events/s; in sector
    # units (8 sectors/event) ~19/s.  ESTIMATED, not measured.
    record = {
        "metric": "train_edges_per_s_per_chip_mu200_h64_i6",
        "value": round(edges / dt, 1),
        "unit": "edges/s",
        "vs_baseline": round(graphs_per_s / 19.0, 2),
        "baseline": "estimated",
        "aggregation": f"blocked_g{group}",
        "final_loss": round(float(losses[-1]), 4),
    }
    flop_fields(record, mcfg, batch * 440, batch * 5016, 4 * n_steps / dt)
    if not no_auc:
        # the eval graphs skip block attachment: prediction routes through
        # the same params on the dense path (identical logits, parity-
        # tested in tests/test_blocked.py)
        eval_cfg = mpnn.SegmentClassifierConfig(
            input_dim=2, hidden_dim=hidden, n_iters=n_iters,
            compute_dtype=jnp.bfloat16, aggregation="dense")
        import io, contextlib
        from gnn_fpga_tpu.train.trainer import Trainer
        with contextlib.redirect_stdout(io.StringIO()):
            ev = Trainer(
                lambda p, gr, m: mpnn.segment_classifier_logits(
                    p, gr, eval_cfg, m),
                tr.params, TrainConfig())
        gated_auc(ev, [make(990001 + i, batch, blocks=False)
                       for i in range(4)], 0.93, record)
    print(json.dumps(record), flush=True)


def run_fullevent(no_auc: bool):
    """36 mu200-config phi sectors per step (V~15.8k / E~180k total) —
    the full-event regime, measured on BOTH flagship layouts:

    - **blocked b36** (headline since r5): the 36 sectors as a batched
      ``[36, 440]`` Graph on the blocked layered-incidence path —
      measured FASTEST for this workload (7.9 vs 14.3 ms/step pallas,
      `benchmarks/probe_blocked.py --metric fullevent36`, 2026-08-21).
      Sectored events decompose, and per-sector MXU blocks beat the
      windowed kernels' ~W one-hot amplification.
    - **pallas packed**: the same 36 sectors packed into ONE flat COO
      graph with fused-kernel plans (best measured knobs: tile 512,
      subtiles 8 — `benchmarks/probe_fullevent.py` sweep) — the path
      that also serves CONNECTED large graphs, where batching into
      sectors is not available and blocked's ``[nB*bn, V]`` broadcast
      one-hot stops fitting.  Its roofline fields (attainable MFU given
      the window amplification) quantify the remaining kernel headroom.
    - **sparse**: the XLA gather/segment-sum path, the vs_baseline.

    Sector recentering keeps the task learnable at this density: raw
    mu200-scale hit spacing (~1e-3 of the coordinate range) is below
    bf16 feature resolution, exactly why the reference re-centers phi
    per sector (`prepareGraphs.py:87-106,150`).
    """
    from gnn_fpga_tpu.core import graph as graph_lib
    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.ops import blocked as blk
    from gnn_fpga_tpu.ops.pallas import spmm as sp
    from gnn_fpga_tpu.train.trainer import TrainConfig

    n_sectors, n_layers, n_tracks, k, group = 36, 20, 22, 12, 4
    v = n_sectors * n_layers * n_tracks              # 15840
    e_real = n_sectors * (n_layers - 1) * n_tracks * k   # 180576
    tile_e = 512                     # best measured (probe_fullevent)
    n_edge = -(-e_real // tile_e) * tile_e
    n_node = v + 8
    n_steps = 32                     # scan length amortises the ~25 ms
    #                                  remote-dispatch latency to <1 ms/step
    cfg0 = toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks)
    offs = toy2d.layer_offsets(cfg0)
    block_e = -(-group * n_tracks * k // 8) * 8

    def make(seed, layout):
        gs = toy2d.make_knn_segment_graphs(
            toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks,
                              seed=seed), n_sectors, k=k)
        if layout == "blocked":
            return blk.attach_blocks_layered(gs, offs, group=group,
                                             block_e=block_e)
        if layout == "batched":
            return gs                # [36, ...] batch (dense-path eval)
        g = graph_lib.pack_graphs(graph_lib.unbatch_graphs(gs),
                                  n_node=n_node, n_edge=n_edge)
        if layout == "pallas":
            # packed sectors are layer-major within each 440-node
            # block: sorted edge tiles span a narrow node range
            g = graph_lib.attach_plans(g, tile_e=tile_e)
        return g

    def run(agg, n_pretrain, layout=None, unique_stacks=None):
        mcfg = mpnn.SegmentClassifierConfig(
            input_dim=2, hidden_dim=64, n_iters=6,
            compute_dtype=jnp.bfloat16, aggregation=agg)
        tr = make_trainer(mcfg, TrainConfig(learning_rate=3e-3,
                                            pos_weight=8.0))

        def make_stack(r):
            # pretraining cycles `unique_stacks` stacks (epochs over a
            # fixed set — cuts host-side graph building); the TIMED scan
            # (r = n_pretrain) still consumes all-distinct batches.
            if unique_stacks is not None and r < n_pretrain:
                r = r % unique_stacks
            return stack_device([make(r * n_steps + s, layout or agg)
                                 for s in range(n_steps)])

        dt, edges, losses = timed_run(tr, make_stack, n_pretrain, n_steps)
        return tr, mcfg, dt, edges, losses

    sp.DEFAULT_SUBTILES = 8          # best measured (probe_fullevent)
    # comparison paths, minimal pretrain: timing only
    _, _, dt_sparse, edges_sparse, _ = run("sparse", n_pretrain=0,
                                           layout="packed")
    _, _, dt_pal, edges_pal, _ = run("pallas", n_pretrain=0)
    sp.DEFAULT_SUBTILES = 4
    # headline: blocked b36, trained past the 0.93 AUC knee with margin
    # (measured: 528 batch-36 steps -> AUC 0.936; ~800 -> 0.95+)
    tr, mcfg, dt, edges, losses = run("blocked", n_pretrain=22,
                                      unique_stacks=5)
    pal_rate = edges_pal / dt_pal
    record = {
        "metric": "train_edges_per_s_per_chip_fullevent_v16k_h64_i6",
        "value": round(edges / dt, 1),
        "unit": "edges/s",
        "vs_baseline": round((edges / dt) / (edges_sparse / dt_sparse), 2),
        "baseline": "xla_sparse_same_chip",
        "aggregation": f"blocked_g{group}_b36",
        "sparse_ms_per_step": round(dt_sparse / (4 * n_steps) * 1e3, 3),
        "pallas_ms_per_step": round(dt_pal / (4 * n_steps) * 1e3, 3),
        "pallas_edges_per_s": round(pal_rate, 1),
        "final_loss": round(float(losses[-1]), 4),
    }
    flop_fields(record, mcfg, v, e_real, 4 * n_steps / dt)
    # Attainable-bound (roofline) for the packed fused path (VERDICT r4
    # #2): the MFU that design would reach at MXU peak / full HBM
    # bandwidth given its ~W one-hot FLOP amplification — the closure
    # criterion for "tune to speed-of-light" (SURVEY §7 step 5).
    from gnn_fpga_tpu.utils import flops as fl
    plan = make(0, "pallas").plans.recv
    useful_step = fl.train_step_flops(
        fl.segment_classifier_flops(v, e_real, 64, 6, 2))
    executed, hbm = fl.fused_step_cost(
        plan.n_edge, n_node, plan.w_oth, plan.w_seg, hidden_dim=64,
        d=66, n_iters=6, prebuilt=plan.prebuilt)
    att, bound, t_mxu, t_hbm = fl.attainable(useful_step, executed, hbm)
    if att is not None:
        pm = fl.mfu(useful_step * (4 * n_steps / dt_pal))
        record["pallas_mfu"] = None if pm is None else round(pm, 5)
        record["pallas_attainable_mfu"] = round(att, 5)
        record["pallas_bound"] = bound
        record["pallas_bound_ms"] = round(max(t_mxu, t_hbm) * 1e3, 3)
        if pm is not None:
            record["pallas_kernel_efficiency"] = round(pm / att, 3)
    if not no_auc:
        # blocked-trained params evaluate on the dense path (identical
        # logits, parity-tested); TWO held-out 36-sector batches
        # (~360k edges) de-luck the pass/fail gate (VERDICT r4 weak #7)
        eval_cfg = mpnn.SegmentClassifierConfig(
            input_dim=2, hidden_dim=64, n_iters=6,
            compute_dtype=jnp.bfloat16, aggregation="dense")
        import io, contextlib
        from gnn_fpga_tpu.train.trainer import Trainer
        with contextlib.redirect_stdout(io.StringIO()):
            ev = Trainer(
                lambda p, gr, m: mpnn.segment_classifier_logits(
                    p, gr, eval_cfg, m),
                tr.params, TrainConfig())
        gated_auc(ev, [make(990001, "batched"), make(991001, "batched")],
                  0.93, record)
    print(json.dumps(record), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric",
                    choices=["mu10", "mu200", "fullevent", "all"],
                    default="all")
    ap.add_argument("--no-auc", action="store_true",
                    help="skip the AUC evaluation (throughput only)")
    args = ap.parse_args()

    runners = {"mu10": run_mu10, "mu200": run_mu200,
               "fullevent": run_fullevent}
    if args.metric == "all":
        order = ["mu10", "fullevent", "mu200"]  # headline LAST
    else:
        order = [args.metric]
    for name in order:
        runners[name](args.no_auc)


if __name__ == "__main__":
    main()

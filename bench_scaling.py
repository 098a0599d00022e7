#!/usr/bin/env python3
"""Scaling-efficiency harness: edges/s/chip vs device count.

BASELINE.md:25 requires >=90% scaling efficiency from 1 chip to >=2
hosts; this harness measures it for both parallel modes:

- **dp**: data parallelism — batched graphs sharded on the mesh ``data``
  axis (gradient all-reduce derived by GSPMD).
- **partitioned**: graph (context) parallelism — one large graph
  row-partitioned with boundary halo exchange (parallel/partition.py).

Runs unchanged on real multi-chip hardware and on a virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``,
where the numbers validate the mechanics, not ICI bandwidth).

Prints one JSON line:
  {"metric": "scaling_efficiency_<mode>", "value": eff_at_max_devices,
   "unit": "fraction", "per_device_counts": {...}}
"""

from __future__ import annotations

import argparse
import json
import time


def _timed_steps(step, params, opt_state, batch, n_steps, n_warmup=3):
    import jax

    for _ in range(n_warmup):
        params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, batch)
    # host readback synchronises (block_until_ready is unreliable through
    # the remote-TPU tunnel, see bench.py)
    float(loss)
    return time.perf_counter() - t0


def _fullevent_graph(n_sectors=36, n_layers=20, n_tracks=22, k=12):
    """One packed V~16k/E~217k kNN graph — the mu200 full-event regime
    (bench.py fullevent metric), for partitioned strong scaling."""
    import jax
    from gnn_fpga_tpu.core import graph as graph_lib
    from gnn_fpga_tpu.data import toy2d

    gs = toy2d.make_knn_segment_graphs(
        toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks, seed=0),
        n_sectors, k=k)
    return graph_lib.pack_graphs(graph_lib.unbatch_graphs(gs))


def run_mode(mode: str, device_counts, n_steps: int, hidden: int,
             n_iters: int, n_tracks: int, batch: int,
             scale: str = "sector"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.parallel import mesh as mesh_lib
    from gnn_fpga_tpu.parallel import partition
    from gnn_fpga_tpu.parallel import data_parallel as dp
    from gnn_fpga_tpu.train.trainer import TrainConfig

    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=hidden, n_iters=n_iters,
        aggregation="sparse")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    optimizer = optax.adam(1e-3)
    results = {}
    for n_dev in device_counts:
        devices = jax.devices()[:n_dev]
        if mode == "dp":
            # weak scaling: batch per device fixed
            g = toy2d.make_segment_graphs(
                toy2d.Toy2DConfig(n_layers=10, n_tracks=n_tracks, seed=0),
                batch * n_dev)
            n_edges = int(np.asarray(g.edge_mask).sum())
            mesh = mesh_lib.make_mesh((n_dev,), (mesh_lib.DATA_AXIS,),
                                      devices=devices)
            step = dp.make_dp_train_step(
                lambda p, gr, m: mpnn.segment_classifier_logits(
                    p, gr, mcfg, m),
                optimizer, mesh, TrainConfig(), donate=False)
            batch_dev = jax.tree.map(
                lambda a: jnp.asarray(a) if a is not None else None, g)
        else:
            # strong scaling: one large graph split over devices
            if scale == "fullevent":
                g = _fullevent_graph()
            else:
                g = jax.tree.map(lambda a: a[0], toy2d.make_segment_graphs(
                    toy2d.Toy2DConfig(n_layers=10,
                                      n_tracks=n_tracks * batch,
                                      seed=0), 1))
            n_edges = int(np.asarray(g.edge_mask).sum())
            mesh = mesh_lib.make_mesh((n_dev,), (mesh_lib.GRAPH_AXIS,),
                                      devices=devices)
            step = partition.make_sharded_train_step(optimizer, mesh, mcfg)
            batch_dev = jax.tree.map(jnp.asarray,
                                     partition.partition_graph(g, n_dev))
        opt_state = optimizer.init(params)
        dt = _timed_steps(step, params, opt_state, batch_dev, n_steps)
        eps = n_steps * n_edges / dt
        results[n_dev] = {"edges_per_s": eps,
                          "edges_per_s_per_chip": eps / n_dev}
    return results


# Public per-chip aggregate ICI bandwidth (GB/s), from
# cloud.google.com/tpu/docs/system-architecture-tpu-vm ("Interchip
# Interconnect BW"): v5e 1600 Gbps = 200 GB/s, v4 2400 Gbps = 300 GB/s,
# v5p 4800 Gbps = 600 GB/s.
_ICI_GBPS = {"TPU v5 lite": 200, "TPU v5e": 200, "TPU v4": 300,
             "TPU v5": 600, "TPU v5p": 600, "TPU v6 lite": 448,
             "TPU v6e": 448}


def _connected_fullevent_graph(n_layers=20, n_tracks=792, k=12):
    """ONE connected kNN graph at fullevent scale (V=15,840): the regime
    where halo partitioning actually communicates — the packed-sector
    fullevent graph is 36 disconnected components, so its halos are
    near-zero (sectoring is embarrassingly parallel; the reference
    exploits exactly that, `prepareGraphs.py:87-106`)."""
    import jax
    from gnn_fpga_tpu.data import toy2d

    gs = toy2d.make_knn_segment_graphs(
        toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks, seed=0),
        1, k=k)
    return jax.tree.map(lambda a: a[0], gs)


def comm_model(step_ms_1chip: float, device_counts, hidden: int = 64,
               n_iters: int = 6, dtype_bytes: int = 2):
    """Analytic real-mesh scaling prediction for the partitioned
    fullevent train step (VERDICT r4 #6): communication volume computed
    from the ACTUAL halo plans (`PartitionedGraph.halo_size`), compute
    time from the measured single-chip fused step.

    Per device per iteration the halo exchange moves ``(P-1) * S * D *
    dtype`` bytes over ICI in each of the two all_to_alls (the self
    chunk stays local), and the backward mirrors both collectives; the
    forward runs ``n_iters`` iterations plus the final edge scoring's
    extend.  Efficiency is reported both without overlap
    (t_comp/(t_comp + t_comm)) and with perfect overlap
    (t_comp/max(t_comp, t_comm)) — the fused shard body is structured so
    the V-sized matmuls carry no dependency on the collective
    (`parallel/partition.py` body), putting the real machine between the
    two curves.
    """
    import jax
    import numpy as np

    from gnn_fpga_tpu.parallel import partition

    kind = getattr(jax.devices()[0], "device_kind", "")
    ici = next((v for k, v in _ICI_GBPS.items() if kind.startswith(k)),
               None)
    if ici is None:
        ici = _ICI_GBPS["TPU v5e"]  # bench-chip assumption, stated below
        kind += " (v5e ICI assumed)"
    for name, g in (("sectors", _fullevent_graph()),
                    ("connected", _connected_fullevent_graph())):
        d = hidden + g.x.shape[-1]      # shortcut-concat width [H, X]
        n_exchanges = 2 * (n_iters + 1)  # fwd iters + final extend, x2 bwd
        out = {}
        for p in device_counts:
            if p < 2:
                continue
            pg = partition.partition_graph(g, p)
            s = pg.halo_size
            bytes_dev = 2 * (p - 1) * s * d * dtype_bytes * n_exchanges
            t_comp = step_ms_1chip / p
            t_comm = bytes_dev / (ici * 1e9) * 1e3  # ms
            out[str(p)] = {
                "halo_size": int(s),
                "comm_mb_per_step_per_dev": round(bytes_dev / 1e6, 3),
                "t_comm_ms": round(t_comm, 4),
                "t_comp_ms": round(t_comp, 4),
                "eff_no_overlap": round(t_comp / (t_comp + t_comm), 3),
                "eff_overlap": round(t_comp / max(t_comp, t_comm), 3),
            }
        record = {
            "metric": f"comm_model_partitioned_fullevent_{name}",
            "unit": "fraction",
            "step_ms_1chip": step_ms_1chip,
            "ici_gbps_assumed": ici,
            "device_kind": kind,
            "per_device_counts": out,
            "note": ("analytic: halo volume from real partition plans, "
                     "compute from the measured single-chip fused step; "
                     "real multi-chip hardware unavailable this round"),
        }
        print(json.dumps(record))


def main():
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honour it
    # explicitly so `JAX_PLATFORMS=cpu` + a virtual device count actually
    # lands on the 8-device CPU mesh (tests/conftest.py does the same).
    import os
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["dp", "partitioned", "both",
                                       "comm-model"],
                    default="both")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="comm-model: measured single-chip fullevent "
                    "ms/step (default: read from BENCH_r04/r05 records "
                    "is not attempted; pass explicitly)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--n-iters", type=int, default=4)
    ap.add_argument("--n-tracks", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--device-counts", type=int, nargs="*")
    ap.add_argument("--scale", choices=["sector", "fullevent"],
                    default="sector",
                    help="partitioned-mode graph size: 'fullevent' = one "
                    "packed V~16k/E~217k kNN graph (bench.py fullevent "
                    "regime)")
    args = ap.parse_args()

    import jax

    n = len(jax.devices())
    counts = args.device_counts or [c for c in (1, 2, 4, 8) if c <= n]
    if args.mode == "comm-model":
        if args.step_ms is None:
            raise SystemExit("--mode comm-model needs --step-ms "
                             "(measured single-chip fullevent ms/step)")
        # fullevent model config (bench.py): h=64, 6 iterations
        comm_model(args.step_ms, args.device_counts or [2, 4, 8],
                   hidden=64, n_iters=6)
        return
    modes = ["dp", "partitioned"] if args.mode == "both" else [args.mode]
    for mode in modes:
        res = run_mode(mode, counts, args.steps, args.hidden, args.n_iters,
                       args.n_tracks, args.batch, scale=args.scale)
        base = res[counts[0]]["edges_per_s_per_chip"]
        eff = res[counts[-1]]["edges_per_s_per_chip"] / base
        suffix = "_fullevent" if (args.scale == "fullevent"
                                  and mode == "partitioned") else ""
        record = {
            "metric": f"scaling_efficiency_{mode}{suffix}",
            "value": round(eff, 3),
            "unit": "fraction",
            "devices": counts,
            "per_device_counts": {
                str(k): {kk: round(vv, 1) for kk, vv in v.items()}
                for k, v in res.items()},
        }
        if jax.devices()[0].platform == "cpu":
            record["note"] = ("virtual CPU mesh: validates mechanics only "
                              "(devices share host cores, no ICI)")
        print(json.dumps(record))


if __name__ == "__main__":
    main()

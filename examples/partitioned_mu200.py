"""Example: training on one large (mu200-scale) graph partitioned across
a TPU mesh — the capability the reference lacks (it fell back to batch=2
and subsampling at 200 pileup, `MPNN_Seg_ACTS_mu200.ipynb`).

On a CPU host, exercise with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/partitioned_mu200.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-tracks", type=int, default=48,
                    help="tracks per event (~mu200 occupancy when large)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--hidden-dim", type=int, default=64)
    ap.add_argument("--n-iters", type=int, default=6)
    args = ap.parse_args()

    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    from gnn_fpga_tpu.parallel import mesh as mesh_lib
    from gnn_fpga_tpu.parallel import partition
    from gnn_fpga_tpu.utils.profiling import StepTimer

    n_dev = len(jax.devices())
    print(f"{n_dev} devices: {jax.devices()}")
    mesh = mesh_lib.make_mesh((n_dev,), (mesh_lib.GRAPH_AXIS,))

    cfg = toy2d.Toy2DConfig(n_layers=10, n_tracks=args.n_tracks, seed=0)
    big = jax.tree.map(lambda a: a[0], toy2d.make_segment_graphs(cfg, 1))
    print(f"graph: {big.n_node} nodes, {big.n_edge} edges")
    pg = jax.tree.map(jnp.asarray, partition.partition_graph(big, n_dev))
    print(f"partitioned: {pg.n_parts} shards x {pg.n_local} nodes, "
          f"{pg.senders.shape[1]} edges/shard")

    mcfg = mpnn.SegmentClassifierConfig(
        input_dim=2, hidden_dim=args.hidden_dim, n_iters=args.n_iters)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = partition.make_sharded_train_step(optimizer, mesh, mcfg)

    timer = StepTimer(warmup=2)
    for i in range(args.steps):
        with timer.step(n_edges=int(np.asarray(big.edge_mask).sum())):
            params, opt_state, loss = step(params, opt_state, pg)
            jax.block_until_ready(loss)
        if i % 10 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    s = timer.summary()
    print(f"mean step {s['mean_s']*1e3:.2f} ms, "
          f"{s.get('edges_per_s', 0)/1e6:.1f}M edges/s over {n_dev} devices")


if __name__ == "__main__":
    main()

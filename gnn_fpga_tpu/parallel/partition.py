"""Graph (context) parallelism: one large graph partitioned across chips.

The scaling axis the reference struggles with is graph size at high pileup
(SURVEY.md §5: mu200 events forced batch=2, `MPNN_Seg_ACTS_mu200.ipynb`);
its escape hatches are sectoring and subsampling.  Here a single large
graph is *row-partitioned* across the mesh ``graph`` axis:

- nodes are split into contiguous ranges, one per device;
- every edge is owned by the device owning its **receiver** (edges sorted
  by receiver in preprocessing), so the receiver-side aggregation
  ``mi = Σ_{e→n} e·h[send]`` is a purely local segment-sum;
- per message-passing iteration the (small) node-feature matrix is
  ``all_gather``-ed over ICI so edge gathers are local, and the
  sender-side aggregation ``mo`` is computed as partials in global node
  space and ``psum_scatter``-ed back to owners.

Communication per iteration: one all-gather of [N, D+F] activations and
one reduce-scatter of [N, D+F] partials — both O(N·D), negligible next to
the O(E·D²) edge/node MLP FLOPs at mu200 scale (E ~ 10-30×N), and both
ride ICI inside ``shard_map``.  No reference counterpart exists
(`SURVEY.md §2.3`); this is new capability.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_fpga_tpu.core.graph import Graph
from gnn_fpga_tpu.models import mpnn
from gnn_fpga_tpu.parallel import mesh as mesh_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """A graph split into P receiver-owned shards, stacked on axis 0.

    Shapes (per shard, stacked leading P):
      x:         [P, N_local, F]   node features of owned nodes
      senders:   [P, E_local]      GLOBAL sender ids
      receivers: [P, E_local]      LOCAL receiver ids (0.. N_local-1)
      y:         [P, E_local]      edge labels
      edge_mask: [P, E_local]
      node_mask: [P, N_local]
    """

    x: jax.Array
    senders: jax.Array
    receivers: jax.Array
    y: jax.Array
    edge_mask: jax.Array
    node_mask: jax.Array

    @property
    def n_parts(self) -> int:
        return self.x.shape[0]

    @property
    def n_local(self) -> int:
        return self.x.shape[1]

    @property
    def n_global(self) -> int:
        return self.x.shape[0] * self.x.shape[1]


def partition_graph(g: Graph, n_parts: int) -> PartitionedGraph:
    """Split one (unbatched, possibly padded) graph into receiver-owned
    shards (host-side numpy; one-time preprocessing per graph).

    Nodes are padded to a multiple of ``n_parts`` (pad rows masked).  Each
    shard's edges are those whose receiver falls in its node range, padded
    to the max shard edge count; pad edges point at the shard's last local
    node and are masked.
    """
    x = np.asarray(g.x)
    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    y = np.asarray(g.y)
    em = np.asarray(g.edge_mask)
    nm = np.asarray(g.node_mask)

    n = x.shape[0]
    n_local = -(-n // n_parts)
    n_pad = n_local * n_parts
    if n_pad > n:
        pad = n_pad - n
        x = np.pad(x, ((0, pad), (0, 0)))
        nm = np.pad(nm, (0, pad))

    owner = receivers // n_local
    # drop masked (padding) edges entirely; they are re-padded per shard
    keep = em > 0
    parts = []
    max_e = 0
    for p in range(n_parts):
        sel = keep & (owner == p)
        parts.append((senders[sel], receivers[sel] - p * n_local, y[sel]))
        max_e = max(max_e, int(sel.sum()))
    max_e = max(max_e, 1)

    def pad_part(s, r, yy):
        e = len(s)
        pad = max_e - e
        return (
            np.pad(s, (0, pad), constant_values=n_pad - 1),
            np.pad(r, (0, pad), constant_values=n_local - 1),
            np.pad(yy, (0, pad)),
            np.pad(np.ones(e, np.float32), (0, pad)),
        )

    padded = [pad_part(*p) for p in parts]
    return PartitionedGraph(
        x=np.stack(np.split(x, n_parts)).astype(np.float32),
        senders=np.stack([p[0] for p in padded]).astype(np.int32),
        receivers=np.stack([p[1] for p in padded]).astype(np.int32),
        y=np.stack([p[2] for p in padded]).astype(np.float32),
        edge_mask=np.stack([p[3] for p in padded]).astype(np.float32),
        node_mask=np.stack(np.split(nm, n_parts)).astype(np.float32),
    )


# ---------------------------------------------------------------------------
# Sharded forward pass (inside shard_map over the 'graph' axis)
# ---------------------------------------------------------------------------

def _linear(p, x, mask=None):
    w = p["w"] if mask is None else p["w"] * mask
    return x @ w + p["b"]


def _global_receivers(shard: PartitionedGraph):
    """Local receiver ids -> global ids for this shard (uses axis index)."""
    p = jax.lax.axis_index(mesh_lib.GRAPH_AXIS)
    return shard.receivers + p * shard.x.shape[0]


def sharded_segment_classifier_logits(
    params,
    shard: PartitionedGraph,
    cfg: mpnn.SegmentClassifierConfig,
    masks: Optional[dict] = None,
):
    """SegmentClassifier forward over one shard, to run INSIDE shard_map
    with axis ``graph``.  ``shard`` holds this device's slice (no leading P
    axis).  Returns this shard's edge logits [E_local].

    Per iteration:  all_gather(h) -> local edge net -> local mi segment-sum
    -> global mo partials -> psum_scatter -> local node net.
    Semantics identical to `mpnn.segment_classifier_logits` (`model.py:140-156`).
    """
    act = cfg.activation
    masks_e = None if masks is None else masks.get("edge")
    masks_n = None if masks is None else masks.get("node")
    n_local = shard.x.shape[0]
    x_local = shard.x

    h_local = act(_linear(params["input"], x_local))
    h_local = jnp.concatenate([h_local, x_local], axis=-1)

    def gather_full(h):
        """All-gather local activations into the global [N, D] matrix."""
        return jax.lax.all_gather(
            h, mesh_lib.GRAPH_AXIS, axis=0, tiled=True)

    def body(h_local, _):
        h_full = gather_full(h_local)
        recv_global = _global_receivers(shard)
        # --- edge network (`model.py:69-81`) on local edges
        b = jnp.concatenate([h_full[shard.senders], h_full[recv_global]],
                            axis=-1) * shard.edge_mask[:, None]
        m1 = None if masks_e is None else masks_e["l1"]
        m2 = None if masks_e is None else masks_e["l2"]
        z = act(_linear(params["edge"]["l1"], b, m1))
        e = jax.nn.sigmoid(_linear(params["edge"]["l2"], z, m2)[..., 0])
        # --- node network aggregation (`model.py:113-119`)
        bo = h_full[shard.senders] * shard.edge_mask[:, None]
        bi = h_full[recv_global] * shard.edge_mask[:, None]
        # mi: receiver-owned -> purely local
        mi = jax.ops.segment_sum(bo * e[:, None], shard.receivers,
                                 num_segments=n_local)
        # mo: partials over global senders -> reduce-scatter to owners
        mo_partial = jax.ops.segment_sum(
            bi * e[:, None], shard.senders,
            num_segments=n_local * jax.lax.axis_size(mesh_lib.GRAPH_AXIS))
        mo = jax.lax.psum_scatter(
            mo_partial, mesh_lib.GRAPH_AXIS, scatter_dimension=0, tiled=True)
        # --- node MLP (`model.py:94-98,120-125`) on local rows
        m = jnp.concatenate([mi, mo, h_local], axis=-1)
        mn1 = None if masks_n is None else masks_n["l1"]
        mn2 = None if masks_n is None else masks_n["l2"]
        hz = act(_linear(params["node"]["l1"], m, mn1))
        h_new = act(_linear(params["node"]["l2"], hz, mn2))
        h_local = jnp.concatenate([h_new, x_local], axis=-1)
        return h_local, None

    h_local, _ = jax.lax.scan(body, h_local, None, length=cfg.n_iters,
                              unroll=cfg.unroll)

    # final edge network on local edges
    h_full = gather_full(h_local)
    recv_global = _global_receivers(shard)
    b = jnp.concatenate([h_full[shard.senders], h_full[recv_global]],
                        axis=-1) * shard.edge_mask[:, None]
    m1 = None if masks_e is None else masks_e["l1"]
    m2 = None if masks_e is None else masks_e["l2"]
    z = act(_linear(params["edge"]["l1"], b, m1))
    return _linear(params["edge"]["l2"], z, m2)[..., 0]


def make_sharded_forward(mesh: Mesh, cfg: mpnn.SegmentClassifierConfig,
                         masks=None):
    """jittable ``(params, pg: PartitionedGraph[P-stacked]) -> logits [P, E]``
    running the sharded forward under shard_map on the ``graph`` axis."""
    from gnn_fpga_tpu.parallel.mesh import shard_map

    def fwd(params, pg: PartitionedGraph):
        def inner(params, pg_shard):
            shard = jax.tree.map(lambda a: a[0], pg_shard)
            logits = sharded_segment_classifier_logits(
                params, shard, cfg, masks)
            return logits[None]

        return shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(mesh_lib.GRAPH_AXIS)),
            out_specs=P(mesh_lib.GRAPH_AXIS),
        )(params, pg)

    return jax.jit(fwd)


def make_sharded_train_step(optimizer, mesh: Mesh,
                            cfg: mpnn.SegmentClassifierConfig,
                            l1: float = 0.0, masks=None):
    """jitted data-parallel-free training step on ONE partitioned graph:
    masked BCE over all shards (psum), grads psum-ed by shard_map."""
    import optax
    from gnn_fpga_tpu.parallel.mesh import shard_map
    from gnn_fpga_tpu.train.trainer import l1_penalty

    def loss_fn(params, pg: PartitionedGraph):
        def inner(params, pg_shard):
            shard = jax.tree.map(lambda a: a[0], pg_shard)
            logits = sharded_segment_classifier_logits(
                params, shard, cfg, masks)
            per = optax.sigmoid_binary_cross_entropy(logits, shard.y)
            local_sum = (per * shard.edge_mask).sum()
            local_cnt = shard.edge_mask.sum()
            total = jax.lax.psum(local_sum, mesh_lib.GRAPH_AXIS)
            cnt = jax.lax.psum(local_cnt, mesh_lib.GRAPH_AXIS)
            return (total / jnp.maximum(cnt, 1.0))[None]

        loss = shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(mesh_lib.GRAPH_AXIS)),
            out_specs=P(mesh_lib.GRAPH_AXIS),
        )(params, pg)
        loss = loss.mean()  # identical on all shards
        if l1:
            loss = loss + l1 * l1_penalty(params, masks=masks)
        return loss

    def step(params, opt_state, pg):
        loss, grads = jax.value_and_grad(loss_fn)(params, pg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if masks is not None:
            from gnn_fpga_tpu.compress.pruning import apply_masks_to_params
            params = apply_masks_to_params(params, masks)
        return params, opt_state, loss

    rep = NamedSharding(mesh, P())
    shard_sh = NamedSharding(mesh, P(mesh_lib.GRAPH_AXIS))
    pg_sh = PartitionedGraph(x=shard_sh, senders=shard_sh,
                             receivers=shard_sh, y=shard_sh,
                             edge_mask=shard_sh, node_mask=shard_sh)
    return jax.jit(step, in_shardings=(rep, rep, pg_sh),
                   out_shardings=(rep, rep, rep))

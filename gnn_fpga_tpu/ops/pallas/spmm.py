"""Fused Pallas TPU kernels for sparse GNN aggregation (SpMM + SDDMM).

These are the north-star hot ops of the framework — the TPU-native
counterpart of the reference's cuBLAS-delegated hot loop
(`/root/reference/gnn/model.py:69-81,113-125`):

    mi[n] = sum_{e: recv[e]==n} w[e] * h[send[e]]      (bmm(Ri*e, Ro^T X))
    mo[n] = sum_{e: send[e]==n} w[e] * h[recv[e]]      (bmm(Ro*e, Ri^T X))

Design (everything stays on the MXU, all intermediates stay in VMEM):

- Edges are pre-sorted by the *segment* endpoint (receiver for ``mi``);
  the sorted structure is a reusable per-topology :class:`EdgePlan`.
- **Windowed one-hot gather**: Mosaic has no large dynamic row-gather
  (``tpu.dynamic_gather`` is limited to one vreg along the gathered dim),
  so the gather ``h[send[e]]`` becomes ``one_hot(local_ids)[T, W] @
  h[win : win+W]`` — an MXU matmul against a per-tile *window* of the
  node table.  The window width ``W`` is auto-sized from the graph's
  locality: tracking graphs ordered by (layer, phi) have small bandwidth,
  so sorted edge tiles reference a narrow node range.  Worst case
  (random labels) ``W`` grows to the whole table and the kernel degrades
  gracefully to the dense-incidence form.
- **Rank-compacted one-hot scatter** (same trick as
  `ops/pallas/segment_sum.py`): within a tile of ``T`` sorted edges the
  compact segment-rank range is <= ``T``, so aggregation is one
  ``one_hot[T, T]^T @ msgs[T, D]`` matmul accumulated into a
  VMEM-resident compact output, scattered to node rows once at the end.
- The fusion means the per-edge message tensor ``[E, D]`` NEVER
  round-trips HBM: per aggregation the only HBM traffic is the edge ids
  and weights (~12 B/edge), the node table (once), and the output.

The backward pass needs the transpose aggregation (same kernel with the
sender-sorted plan) and an SDDMM ``dw[e] = <g[recv[e]], h[send[e]]>`` —
a second kernel using the same windowed gathers plus a row-wise dot.
:func:`aggregate_pair` packages both directions with a custom VJP.

Measured on the bench chip (TPU v5e, bf16, layered-locality graphs,
dispatch-amortised over 300 dependent iterations — benchmarks/
probe_spmm.py / the probe_bwd harness, 2026-08-19, tile=256 sub=8):

    V      E       D    op             XLA        pallas     speedup
    4096   32768   64   pair fwd        812 us     259 us     3.1x
    4096   32768   64   pair fwd+bwd   1283 us     731 us     1.75x
    16384  131072  128  pair fwd       3079 us     827 us     3.7x
    16384  131072  128  pair fwd+bwd   4844 us    2858 us     1.7x

The backward runs dh as two transpose-plan SpMMs and dw as ONE fused
dual SDDMM (both dot products in the recv plan's order — measured 396 us
vs 412 us for a *single* SDDMM at the 4k config; the fusion is nearly
free).  Kernel time is dominated by the one-hot *builds* (VPU iota
compares), not the matmuls: ablation (probe_spmm_ablate) shows
"one-hot builds only" at 325 us vs the full kernel's 332 us at the 16k
config — per-edge cost scales with (W + T), the gather window plus the
edge tile.

Crossover vs the dense-incidence path: at phi-sector scale (V=440,
E=5016) the one-hot bmm on the MXU runs the full train step 6-8x faster
than EITHER sparse path (see models/mpnn.py _DENSE_AUTO_LIMIT); these
kernels win where dense incidence stops fitting (V*E >~ 8M — single
large graphs, the partitioned mu200 full-event regime).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_TILE_E = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _align_down(x, m):
    return (x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgePlan:
    """Per-topology sorted-edge plan for one aggregation direction.

    Built once per (padded) graph topology by :func:`build_edge_plan` and
    carried alongside the graph; reused across training steps, iterations
    and fwd/bwd.  ``seg`` is the endpoint edges are grouped by (the
    segment id), ``oth`` the gathered endpoint.

    Data fields (arrays):
      order:        [E] sorted position -> edge index (seg-ascending)
      inv_order:    [E] edge index -> sorted position
      sorted_seg:   [E] seg ids in sorted order
      sorted_oth:   [E] oth ids in sorted order
      ranks:        [E] compact rank of each sorted edge's seg id
      node_of_rank: [R] node id owning each rank (pad rows -> n_node)
      rank_off:     [n_tiles] first rank per edge tile
      oth_win_off:  [n_tiles] node-table window start for the gather side
      seg_win_off:  [n_tiles] node-table window start for the seg side

    Static fields (hashable; participate in jit cache keys):
      n_node, n_edge, tile_e, w_oth, w_seg, table_rows
    """

    order: jax.Array
    inv_order: jax.Array
    sorted_seg: jax.Array
    sorted_oth: jax.Array
    ranks: jax.Array
    node_of_rank: jax.Array
    rank_off: jax.Array
    oth_win_off: jax.Array
    seg_win_off: jax.Array
    n_node: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_edge: int = dataclasses.field(metadata=dict(static=True), default=0)
    tile_e: int = dataclasses.field(metadata=dict(static=True),
                                    default=DEFAULT_TILE_E)
    w_oth: int = dataclasses.field(metadata=dict(static=True), default=128)
    w_seg: int = dataclasses.field(metadata=dict(static=True), default=128)
    table_rows: int = dataclasses.field(metadata=dict(static=True),
                                        default=128)

    @property
    def n_tiles(self) -> int:
        return self.n_edge // self.tile_e


class AggPlans(NamedTuple):
    """The (receiver-sorted, sender-sorted) plan pair for a graph.

    ``recv`` aggregates by receiver gathering senders (``mi``); ``send``
    is its transpose (``mo``, and the backward of ``mi``)."""

    recv: EdgePlan
    send: EdgePlan


def _window_offsets(ids_t: np.ndarray, window: Optional[int],
                    table_rows_floor: int):
    """Per-tile window starts + auto-sized width for sorted-tile ids.

    ``ids_t``: [n_tiles, tile_e] the ids each tile gathers.  Offsets are
    16-aligned (the bf16 sublane tile; Mosaic must statically prove the
    dynamic-slice alignment); width is a multiple of 128 (lane count of
    the one-hot operand)."""
    mins = _align_down(ids_t.min(axis=1), 16)
    maxs = ids_t.max(axis=1)
    span = int((maxs - mins + 1).max()) if len(ids_t) else 1
    w = _round_up(max(span, 128), 128) if window is None else window
    table_rows = _round_up(max(table_rows_floor, w), 16)
    off = np.minimum(mins, _align_down(table_rows - w, 16)).astype(np.int32)
    if ((maxs - off) >= w).any():
        raise ValueError(
            f"window {w} too narrow for tile spans (max local id "
            f"{int((maxs - off).max())}); pass a larger `window` or "
            f"relabel nodes for locality (core.ordering)")
    return off, w, table_rows


def build_edge_plan(seg_ids, oth_ids, n_node: int,
                    tile_e: int = DEFAULT_TILE_E,
                    window: Optional[int] = None,
                    window_seg: Optional[int] = None) -> EdgePlan:
    """Host-side (numpy) plan construction for one aggregation direction.

    ``seg_ids``/``oth_ids``: [E] int arrays (E a multiple of ``tile_e``;
    pad with edges pointing at any real node and weight 0).  ``window``:
    override the auto-sized gather window (must cover every tile's id
    span)."""
    seg_ids = np.asarray(seg_ids, np.int32)
    oth_ids = np.asarray(oth_ids, np.int32)
    e = len(seg_ids)
    if e % tile_e:
        raise ValueError(f"edge count {e} not a multiple of tile {tile_e}")
    if seg_ids.max(initial=0) >= n_node or oth_ids.max(initial=0) >= n_node:
        raise ValueError("edge ids must be < n_node")
    order = np.argsort(seg_ids, kind="stable").astype(np.int32)
    inv_order = np.argsort(order, kind="stable").astype(np.int32)
    ss, so = seg_ids[order], oth_ids[order]
    new_seg = np.concatenate([[0], (ss[1:] != ss[:-1]).astype(np.int32)])
    ranks = np.cumsum(new_seg).astype(np.int32)
    node_of_rank = np.full(n_node + 1, n_node, np.int32)
    node_of_rank[ranks] = ss
    n_tiles = e // tile_e
    rank_off = ranks[::tile_e].copy()
    oth_off, w_oth, tr1 = _window_offsets(
        so.reshape(n_tiles, tile_e), window, n_node)
    seg_off, w_seg, tr2 = _window_offsets(
        ss.reshape(n_tiles, tile_e), window_seg, n_node)
    return EdgePlan(
        order=order, inv_order=inv_order, sorted_seg=ss, sorted_oth=so,
        ranks=ranks, node_of_rank=node_of_rank, rank_off=rank_off,
        oth_win_off=oth_off, seg_win_off=seg_off,
        n_node=n_node, n_edge=e, tile_e=tile_e,
        w_oth=w_oth, w_seg=w_seg, table_rows=max(tr1, tr2),
    )


def build_agg_plans(senders, receivers, n_node: int,
                    tile_e: int = DEFAULT_TILE_E,
                    window: Optional[int] = None) -> AggPlans:
    """Both aggregation directions for a graph topology (host-side)."""
    recv = build_edge_plan(receivers, senders, n_node, tile_e, window)
    send = build_edge_plan(senders, receivers, n_node, tile_e, window)
    return AggPlans(recv=recv, send=send)


# ---------------------------------------------------------------------------
# SpMM kernel: out[rank] += onehot_rank^T @ (w * (onehot_gather @ h_window))
# ---------------------------------------------------------------------------

# Edge subtiles processed per grid step: amortises the per-step grid/DMA
# overhead (~1 us on the bench chip) over several MXU tile pairs.
DEFAULT_SUBTILES = 4


def _precision_for(dtype) -> jax.lax.Precision:
    """bf16 inputs are exact in one MXU pass (f32 accumulate); f32 inputs
    use HIGH (bf16x3, 3 MXU passes) — NOT DEFAULT, which rounds the table
    through one bf16 pass (measured max abs err ~0.2 on N(0,1) tables).
    HIGH is sufficient here because the one-hot operand is exactly
    representable in bf16 (0/1), so the hi+lo split of the *table* side
    reconstructs every f32 row exactly; HIGHEST (6 passes) buys nothing
    for one-hot matmuls and costs 2x (measured err 1.5e-5 both ways)."""
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGH)


def _spmm_kernel(rank_off_ref, win_off_ref, ranks_ref, oth_ref, w_ref,
                 h_ref, out_ref, *, w_oth, tile_e, subtiles, precision):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        r0 = rank_off_ref[t]
        v0 = pl.multiple_of(win_off_ref[t], 16)
        window = h_ref[pl.ds(v0, w_oth), :]                   # [W, D]
        loc = oth_ref[sl]                                     # [T, 1]
        gcols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, w_oth), 1)
        oh_g = ((loc - v0) == gcols).astype(h_ref.dtype)      # [T, W]
        gathered = jnp.dot(oh_g, window,
                           preferred_element_type=jnp.float32,
                           precision=precision)              # [T, D] f32
        msgs = gathered * w_ref[sl]                           # [T, D]
        lr = ranks_ref[sl] - r0                               # [T, 1]
        scols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_e), 1)
        oh_s = (lr == scols).astype(h_ref.dtype)              # [T, T]
        partial = jax.lax.dot_general(
            oh_s, msgs.astype(h_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                     # [T, D]
        out_ref[pl.ds(r0, tile_e), :] += partial


def _spmm_compact(h_table: jax.Array, w_sorted: jax.Array,
                  plan: EdgePlan,
                  subtiles: int | None = None) -> jax.Array:
    """Compact [R_pad, D] f32 rank sums for one direction."""
    if subtiles is None:
        subtiles = DEFAULT_SUBTILES  # module attr: tunable at runtime
    e, t = plan.n_edge, plan.tile_e
    d = h_table.shape[1]
    n_ranks_pad = _round_up(plan.n_node + 1, 8) + t
    while plan.n_tiles % subtiles:
        subtiles //= 2
    group = t * subtiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.n_tiles // subtiles,),
        in_specs=[
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),            # h table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, w_oth=plan.w_oth, tile_e=t,
                          subtiles=subtiles,
                          precision=_precision_for(h_table.dtype)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ranks_pad, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * (plan.w_oth + t) * d,
            bytes_accessed=(plan.table_rows * d + n_ranks_pad * d + 3 * e)
            * 4,
            transcendentals=0,
        ),
    )(plan.rank_off, plan.oth_win_off,
      plan.ranks[:, None], plan.sorted_oth[:, None],
      w_sorted[:, None], h_table)


def _pad_table(h: jax.Array, plan: EdgePlan) -> jax.Array:
    v, d = h.shape
    if v < plan.table_rows:
        h = jnp.pad(h, ((0, plan.table_rows - v), (0, 0)))
    return h


def _spmm_raw(h: jax.Array, w: jax.Array, plan: EdgePlan) -> jax.Array:
    """``out[n] = sum_{e: seg[e]==n} w[e] * h[oth[e]]`` — no VJP attached.

    ``h``: [n_node, D] node table, ``w``: [E] edge weights in EDGE order
    (permutation into plan order is fused here).  Returns [n_node, D] in
    ``h.dtype``."""
    w_sorted = jnp.take(w.astype(jnp.float32), plan.order, axis=0)
    compact = _spmm_compact(_pad_table(h, plan), w_sorted, plan)
    out = jnp.zeros((plan.n_node + 1, h.shape[1]), jnp.float32)
    # No unique_indices: every unused rank slot of node_of_rank holds the
    # same dump index n_node (duplicates), so the unique-indices contract
    # would be violated (UB).  The duplicate rows contribute zeros and the
    # dump row is sliced off below.
    out = out.at[plan.node_of_rank].add(compact[: plan.n_node + 1])
    return out[: plan.n_node].astype(h.dtype)


# ---------------------------------------------------------------------------
# SDDMM kernel: w[e] = <a[seg[e]], b[oth[e]]>
# ---------------------------------------------------------------------------

def _sddmm_kernel(seg_off_ref, oth_off_ref, seg_ref, oth_ref,
                  a_ref, b_ref, out_ref, *, w_seg, w_oth, tile_e,
                  subtiles, precision):
    g = pl.program_id(0)
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        s0 = pl.multiple_of(seg_off_ref[t], 16)
        v0 = pl.multiple_of(oth_off_ref[t], 16)
        a_win = a_ref[pl.ds(s0, w_seg), :]
        b_win = b_ref[pl.ds(v0, w_oth), :]
        acols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, w_seg), 1)
        bcols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, w_oth), 1)
        oh_a = ((seg_ref[sl] - s0) == acols).astype(a_ref.dtype)
        oh_b = ((oth_ref[sl] - v0) == bcols).astype(b_ref.dtype)
        a_rows = jnp.dot(oh_a, a_win, preferred_element_type=jnp.float32,
                         precision=precision)
        b_rows = jnp.dot(oh_b, b_win, preferred_element_type=jnp.float32,
                         precision=precision)
        out_ref[sl] = jnp.sum(a_rows * b_rows, axis=1, keepdims=True)


def sddmm(a: jax.Array, b: jax.Array, plan: EdgePlan,
          subtiles: int | None = None) -> jax.Array:
    """Sampled dense-dense matmul: ``out[e] = <a[seg[e]], b[oth[e]]>``.

    ``a``/``b``: [n_node, D] tables.  Returns [E] f32 in EDGE order.
    This is the gradient of :func:`_spmm_raw` w.r.t. ``w``, and the
    building block of fused edge scoring (`model.py:69-81`)."""
    if subtiles is None:
        subtiles = DEFAULT_SUBTILES
    e, t = plan.n_edge, plan.tile_e
    a = _pad_table(a, plan)
    b = _pad_table(b, plan)
    while plan.n_tiles % subtiles:
        subtiles //= 2
    group = t * subtiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.n_tiles // subtiles,),
        in_specs=[
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, w_seg=plan.w_seg,
                          w_oth=plan.w_oth, tile_e=t, subtiles=subtiles,
                          precision=_precision_for(a.dtype)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * (plan.w_seg + plan.w_oth) * a.shape[1],
            bytes_accessed=(2 * plan.table_rows * a.shape[1] + 3 * e) * 4,
            transcendentals=0,
        ),
    )(plan.seg_win_off, plan.oth_win_off,
      plan.sorted_seg[:, None], plan.sorted_oth[:, None], a, b)
    return jnp.take(out[:, 0], plan.inv_order, axis=0)


def _sddmm_dual_kernel(seg_off_ref, oth_off_ref, seg_ref, oth_ref,
                       p_ref, q_ref, u_ref, v_ref, out_ref, *, w_seg,
                       w_oth, tile_e, subtiles, precision):
    """out[e] = <p[seg_e], q[oth_e]> + <u[oth_e], v[seg_e]> — both dot
    products in one pass, sharing the two one-hot builds (p/v gather with
    the seg one-hot, q/u with the oth one-hot)."""
    g = pl.program_id(0)
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        s0 = pl.multiple_of(seg_off_ref[t], 16)
        v0 = pl.multiple_of(oth_off_ref[t], 16)
        acols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, w_seg), 1)
        bcols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, w_oth), 1)
        oh_s = ((seg_ref[sl] - s0) == acols).astype(p_ref.dtype)
        oh_o = ((oth_ref[sl] - v0) == bcols).astype(p_ref.dtype)
        dot = lambda oh, win: jnp.dot(oh, win,
                                      preferred_element_type=jnp.float32,
                                      precision=precision)
        p_rows = dot(oh_s, p_ref[pl.ds(s0, w_seg), :])
        v_rows = dot(oh_s, v_ref[pl.ds(s0, w_seg), :])
        q_rows = dot(oh_o, q_ref[pl.ds(v0, w_oth), :])
        u_rows = dot(oh_o, u_ref[pl.ds(v0, w_oth), :])
        out_ref[sl] = jnp.sum(p_rows * q_rows + u_rows * v_rows,
                              axis=1, keepdims=True)


def sddmm_dual(p: jax.Array, q: jax.Array, u: jax.Array, v: jax.Array,
               plan: EdgePlan, subtiles: int | None = None) -> jax.Array:
    """``out[e] = <p[seg[e]], q[oth[e]]> + <u[oth[e]], v[seg[e]]>`` fused.

    One kernel launch instead of two :func:`sddmm` calls — this is the
    full ``dw`` of :func:`aggregate_pair` expressed in ONE plan's edge
    order (`model.py:113-119` backward): with the recv plan
    (seg=recv, oth=send), ``dw = <g_mi[recv], h[send]> +
    <g_mo[send], h[recv]>`` = ``sddmm_dual(g_mi, h, g_mo, h, recv)``.
    Returns [E] f32 in EDGE order.
    """
    if subtiles is None:
        subtiles = DEFAULT_SUBTILES
    e, t = plan.n_edge, plan.tile_e
    p, q = _pad_table(p, plan), _pad_table(q, plan)
    u, v = _pad_table(u, plan), _pad_table(v, plan)
    while plan.n_tiles % subtiles:
        subtiles //= 2
    group = t * subtiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.n_tiles // subtiles,),
        in_specs=[
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_dual_kernel, w_seg=plan.w_seg,
                          w_oth=plan.w_oth, tile_e=t, subtiles=subtiles,
                          precision=_precision_for(p.dtype)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * e * (plan.w_seg + plan.w_oth) * p.shape[1],
            bytes_accessed=(4 * plan.table_rows * p.shape[1] + 3 * e) * 4,
            transcendentals=0,
        ),
    )(plan.seg_win_off, plan.oth_win_off,
      plan.sorted_seg[:, None], plan.sorted_oth[:, None], p, q, u, v)
    return jnp.take(out[:, 0], plan.inv_order, axis=0)


# ---------------------------------------------------------------------------
# aggregate_pair: both directions + custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def aggregate_pair(h: jax.Array, w: jax.Array, plans: AggPlans):
    """Fused edge-weighted neighbour aggregation, both directions.

    ``mi[n] = sum_{e: recv[e]==n} w[e] * h[send[e]]`` and
    ``mo[n] = sum_{e: send[e]==n} w[e] * h[recv[e]]`` — the reference's
    ``bmm(Ri*e, bo)`` / ``bmm(Ro*e, bi)`` pair (`model.py:113-119`).
    ``w`` must already include the edge mask (padded edges -> 0).
    """
    mi = _spmm_raw(h, w, plans.recv)
    mo = _spmm_raw(h, w, plans.send)
    return mi, mo


def _agg_fwd(h, w, plans):
    return aggregate_pair(h, w, plans), (h, w, plans)


def _agg_bwd(res, g):
    h, w, plans = res
    g_mi, g_mo = g
    g_mi = g_mi.astype(h.dtype)
    g_mo = g_mo.astype(h.dtype)
    # d h[v] = sum_{e: send==v} w_e g_mi[recv_e] + sum_{e: recv==v} w_e g_mo[send_e]
    dh = (_spmm_raw(g_mi, w, plans.send).astype(jnp.float32)
          + _spmm_raw(g_mo, w, plans.recv).astype(jnp.float32))
    # d w[e] = <g_mi[recv_e], h[send_e]> + <g_mo[send_e], h[recv_e]>
    # — both terms in ONE fused kernel via the recv plan (seg=recv,
    # oth=send), sharing the one-hot builds.
    dw = sddmm_dual(g_mi, h, g_mo, h, plans.recv)
    return dh.astype(h.dtype), dw.astype(w.dtype), None


aggregate_pair.defvjp(_agg_fwd, _agg_bwd)


def spmm(h: jax.Array, w: jax.Array, plan: EdgePlan,
         plan_t: EdgePlan) -> jax.Array:
    """Single-direction differentiable SpMM (``plan_t`` = transpose plan)."""

    @jax.custom_vjp
    def _op(h, w):
        return _spmm_raw(h, w, plan)

    def _fwd(h, w):
        return _op(h, w), (h, w)

    def _bwd(res, g):
        h, w = res
        g = g.astype(h.dtype)
        dh = _spmm_raw(g, w, plan_t)
        dw = sddmm(g, h, plan)
        return dh.astype(h.dtype), dw.astype(w.dtype)

    _op.defvjp(_fwd, _bwd)
    return _op(h, w)


# ---------------------------------------------------------------------------
# jnp oracles (tests)
# ---------------------------------------------------------------------------

def aggregate_pair_reference(h, w, senders, receivers, n_node):
    mi = jax.ops.segment_sum(
        jnp.take(h, senders, axis=0) * w[:, None], receivers,
        num_segments=n_node)
    mo = jax.ops.segment_sum(
        jnp.take(h, receivers, axis=0) * w[:, None], senders,
        num_segments=n_node)
    return mi, mo


def sddmm_reference(a, b, seg_ids, oth_ids):
    return jnp.sum(jnp.take(a, seg_ids, axis=0)
                   * jnp.take(b, oth_ids, axis=0), axis=1)

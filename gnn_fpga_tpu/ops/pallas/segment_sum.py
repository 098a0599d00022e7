"""Pallas TPU kernel: segment-sum (SpMM) over sorted COO edges.

The GNN aggregation hot op — ``out[n] = sum_{e: ids[e]==n} messages[e]``
(the reference's ``bmm(Ri*e, ...)`` form, `/root/reference/gnn/model.py:113-119`)
— implemented MXU-first instead of scatter-add:

- Edges are pre-sorted by segment id (a one-time, reusable preprocessing
  step per graph topology; see :func:`build_sorted_segments`).
- Sorted ids are *rank-compacted*: ``rank[e]`` counts distinct ids seen so
  far.  Within any tile of ``TILE_E`` edges the local rank range is then
  bounded by ``TILE_E`` regardless of degree gaps, so each tile reduces to
  one ``one_hot[TILE_E, TILE_E].T @ messages[TILE_E, D]`` matmul on the
  MXU plus one accumulation into a dynamically-sliced VMEM window.
- The compact [n_ranks, D] result is scattered to node rows with a single
  N-row XLA scatter (cheap: N ~ E/10..E/30).

Sequential TPU grid ⇒ the `+=` accumulation across tiles sharing a
boundary rank is race-free.

Backward pass: d(messages) = grad_out gathered at the edge ids — a pure
gather, implemented as the custom VJP.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Fastest in the honest (readback-synchronised) on-chip sweep.  Measured
# vs XLA scatter-add at V=16384/E=131072: F=128 33.8 vs 26.4 GB/s,
# F=64 16.5 vs 12.7 GB/s (tile 512 is ~10% slower; a subtiled in-kernel
# fori_loop variant and an aligned/fixed-offset accumulation probe were
# both tried and did not beat this — the per-grid-step floor is ~3us on
# the bench chip).  At small sizes (V~3.5k, E~29k) the dense-incidence
# MXU path (ops/dense_incidence.py) dominates both by >10x.
DEFAULT_TILE_E = 256


class SortedSegments(NamedTuple):
    """Reusable sorted-edge structure for one graph topology.

    order:        [E] permutation sorting edges by segment id
    sorted_ids:   [E] ids[order]
    ranks:        [E] compact rank of each sorted edge's id
    node_of_rank: [N+1] segment id owning each rank (N = padded rank slot)
    """

    order: jax.Array
    sorted_ids: jax.Array
    ranks: jax.Array
    node_of_rank: jax.Array


def build_sorted_segments(ids: jax.Array, n_node: int) -> SortedSegments:
    """Precompute the sorted/ranked structure for ``ids`` (host or device).

    Pure jnp — can run under jit; typically executed once per topology in
    the data pipeline and cached alongside the graph.
    """
    ids = jnp.asarray(ids, jnp.int32)
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    new_seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)])
    ranks = jnp.cumsum(new_seg)
    # rank -> node id (idempotent scatter; unclaimed ranks hit the pad row)
    node_of_rank = jnp.full((n_node + 1,), n_node, jnp.int32)
    node_of_rank = node_of_rank.at[ranks].set(sorted_ids)
    return SortedSegments(order, sorted_ids, ranks.astype(jnp.int32),
                          node_of_rank)


def _segment_sum_kernel(offsets_ref, ranks_ref, msgs_ref, out_ref, *,
                        precision):
    """One edge tile: one-hot local ranks -> MXU partial sum -> accumulate.

    offsets_ref: [n_tiles] int32 (scalar-prefetched) — first rank per tile.
    ranks_ref:   [TILE_E, 1] int32 — compact ranks of this tile's edges.
    msgs_ref:    [TILE_E, D] float — messages of this tile's edges.
    out_ref:     [R_pad, D] float — full compact output (VMEM resident).
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r0 = offsets_ref[t]
    tile_e = msgs_ref.shape[0]
    local = ranks_ref[:] - r0                                   # [TILE_E, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_e), 1)
    one_hot = (local == cols).astype(msgs_ref.dtype)            # [E_t, R_t]
    partial = jax.lax.dot_general(
        one_hot, msgs_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                           # [R_t, D]
    out_ref[pl.ds(r0, tile_e), :] += partial.astype(out_ref.dtype)


def _compact_segment_sum(sorted_messages: jax.Array, ranks: jax.Array,
                         n_ranks_pad: int, tile_e: int,
                         precision) -> jax.Array:
    e, d = sorted_messages.shape
    assert e % tile_e == 0, f"edge count {e} not a multiple of {tile_e}"
    n_tiles = e // tile_e
    offsets = ranks[::tile_e]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_e, 1), lambda t, off: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_e, d), lambda t, off: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_segment_sum_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ranks_pad, d),
                                       sorted_messages.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * tile_e * d,
            bytes_accessed=(e * d + n_ranks_pad * d + e) * 4,
            transcendentals=0,
        ),
    )(offsets, ranks[:, None], sorted_messages)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum(sorted_messages: jax.Array, seg: SortedSegments,
                       n_node: int, tile_e: int = DEFAULT_TILE_E,
                       precision: str = "highest") -> jax.Array:
    """``out[n] = sum_e sorted_messages[e] * (seg.sorted_ids[e] == n)``.

    ``sorted_messages`` must already be in ``seg.order`` order (the caller
    fuses the permutation into its gathers).  Ids equal to ``n_node`` are
    treated as padding and dropped.  Returns [n_node, D].

    ``precision``: 'highest' (exact f32 one-hot matmul, 6-pass MXU) or
    'default' (bf16 MXU inputs — ~0.4% relative error on the messages,
    the usual TPU training trade-off).
    """
    return _fwd_impl(sorted_messages, seg, n_node, tile_e, precision)


_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "default": jax.lax.Precision.DEFAULT}


def _fwd_impl(sorted_messages, seg, n_node, tile_e, precision):
    n_ranks_pad = _round_up(n_node + 1, 8) + tile_e
    compact = _compact_segment_sum(sorted_messages, seg.ranks,
                                   n_ranks_pad, tile_e,
                                   _PRECISIONS[precision])
    out = jnp.zeros((n_node + 1, sorted_messages.shape[1]),
                    sorted_messages.dtype)
    out = out.at[seg.node_of_rank].add(compact[: n_node + 1],
                                       indices_are_sorted=False,
                                       unique_indices=True)
    return out[:n_node]


def _fwd(sorted_messages, seg, n_node, tile_e, precision):
    return _fwd_impl(sorted_messages, seg, n_node, tile_e, precision), seg


def _bwd(n_node, tile_e, precision, seg, g):
    # d messages[e] = g[sorted_ids[e]] (zero for the pad id n_node)
    g_pad = jnp.concatenate(
        [g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    return (jnp.take(g_pad, seg.sorted_ids, axis=0), None)


sorted_segment_sum.defvjp(_fwd, _bwd)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_edges_to_tile(n_edge: int, tile_e: int = DEFAULT_TILE_E) -> int:
    """Edge-count pad target for the kernel's tile divisibility."""
    return max(_round_up(n_edge, tile_e), tile_e)


def segment_sum_reference(messages, ids, n_node):
    """jnp oracle used in tests."""
    return jax.ops.segment_sum(messages, ids, num_segments=n_node)

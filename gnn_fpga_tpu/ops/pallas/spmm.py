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
- **Window one-hot scatter**: the same per-tile one-hots drive the
  scatters — ``out[win : win+W] += one_hot[T, W]^T @ msgs[T, D]``
  accumulated directly into full VMEM-resident node tables (the TPU grid
  executes sequentially, so overlapping windows are safe).  No
  compact-rank intermediate, no XLA scatter-add fixup after the kernel.
- **Prebuilt one-hots** (``precompute="int8"``/``"bf16"``): the one-hots
  are pure functions of the static topology, so plans can carry them as
  dense blocked-ELL arrays that the kernel streams from HBM
  (double-buffered behind the MXU) instead of rebuilding on the VPU.
- The fusion means the per-edge message tensor ``[E, D]`` NEVER
  round-trips HBM: per aggregation the only HBM traffic is the edge ids
  and weights (~12 B/edge; + the prebuilt one-hots when enabled), the
  node table (once), and the output.

The fused backward is ONE kernel too: both dh scatters accumulate into a
single node table and dw (the dual SDDMM) reuses the same gathered rows.
:func:`aggregate_pair` packages both directions with a custom VJP.

Measured on the bench chip (TPU v5e, bf16, layered-locality graphs,
dispatch-amortised over 200 dependent iterations — benchmarks/
probe_spmm.py, 2026-08-20, tile=256 sub=8; "pre" = prebuilt int8):

    V      E       D    op             XLA        pallas     pre     best x
    4096   32768   64   pair fwd        844 us     204 us    241 us   4.1x
    4096   32768   64   pair fwd+bwd   1324 us     563 us    598 us   2.35x
    16384  131072  128  pair fwd       3066 us     520 us    483 us   6.4x
    16384  131072  128  pair fwd+bwd   4875 us    1972 us   1835 us   2.66x

Whole-iteration fusion (:func:`iteration_pair` — the edge-MLP scoring
chain AND both aggregations in one launch; benchmarks/probe_iter.py,
f32, same graphs, full edge+node-dim configs):

    V      D    op                  XLA chain  unfused    fused    x
    4096   64   iter fwd             818 us     717 us    504 us   1.62x
    4096   64   iter fwd+bwd        1903 us    1846 us   1098 us   1.73x
    16384  128  iter fwd            3005 us    2580 us   1521 us   1.98x
    16384  128  iter fwd+bwd        7700 us    6825 us   3802 us   2.03x

("unfused" = XLA edge MLP + fused aggregate_pair; "fused" rows use
prebuilt int8 one-hots, which win by a further ~1-2% over in-kernel iota
builds at both sizes here.)  The [E, H] pre-activation and [E] scores
never leave VMEM; the VJP recomputes them per tile from V-sized
residuals, so backward HBM traffic is node tables only.

Recompute-vs-stash ablation (2026-08-21, bench shape V=15848/E=180736/
D=66/H=64 bf16, `probe_iter --ablate-stash`): a backward variant fed
STASHED [E] sigmoid scores measures 1363 vs 1386 us — 1.6% — before
paying the forward's extra [E] f32 write and HBM round-trip.  Expected
from structure: ``dpre = dz * (1 - z^2)`` needs ``z``, which needs the
pa/pb gathers — the dominant recompute — regardless of the scores; the
stash can only remove the [T, H] x [H, 1] contraction and the sigmoid.
Recompute kept.

Negative result (measured 2026-08-20, kept for the record): a
"wide-table" variant — lane-concatenating [pa | h] / [pb | h | gmi]
so each one-hot issues ONE wide gather matmul instead of 2-3, and the
backward scatters [dh | dpre] in one transpose matmul per one-hot — ran
~10% SLOWER at both sizes (fwd 1684 vs 1521 us, fwd+bwd 4219 vs 3802 us
at 16k).  The XLA-side concats materialize [V, 3*128] tables in HBM
every call and duplicate the h table per side, costing more bandwidth
than the halved matmul-issue count saves.  Matmul count is not the
bottleneck at these shapes; table bytes are.

(At 4k the whole working set is small enough that the in-kernel iota
builds beat streaming prebuilt operands; at 16k prebuilt wins — callers
pick via ``attach_plans(precompute=...)``.)  History: the round-3 design
scattered through a compact-rank one-hot + XLA ``at[].add`` expansion
and rebuilt one-hots every launch; it measured 3.7x/1.7x at the 16k
config.  Replacing the rank scatter with the seg-window one-hot (already
needed for the gather side) removed one build of three and all scatter
fixup launches — that rewrite, not prebuilding, was the bigger lever.

Roofline + knob-sweep closure (2026-08-21, TPU v5e, bench fullevent
config V=15848 / E=180736 / D=66 / H=64, bf16; `utils/flops.py::
fused_step_cost`, `benchmarks/probe_fullevent.py`):

- Attainable bound: ~596 executed MXU GFLOP/train-step for 75 useful
  (the W=128 one-hot amplification) -> 3.02 ms/step at peak, MXU-bound
  (HBM model: 0.89 ms).  Attainable MFU 12.6%.
- Measured fused kernel alone (probe_iter --shape bench, bf16):
  fwd 1047 us, fwd+bwd 2099 us per iteration (theory ~180/480 us) —
  ~22% of the bound; full step 14.3 ms.
- Knob sweep (full train step, ms/step): tile 256->512 gains 7%,
  prebuilt int8 gains 6-7%, subtiles 4->8/16 is noise; best combo
  tile=512 sub=8 int8 = 14.41 vs 16.52 baseline on the 8-step harness
  (~1.15x).  The residual ~4x gap to the bound is per-subtile Mosaic
  overhead (window dynamic-slices, one-hot builds, f32 accumulate
  read-modify-writes serialized against the MXU), not launch count,
  operand streaming, or transcendentals; the earlier wide-table
  negative result (below) rules out matmul-issue count as the driver.
- WORKLOAD routing consequence: the fullevent bench's 36-sector batch
  runs 7.90 ms/step on the blocked layered path (`ops/blocked.py`,
  probe_blocked fullevent36) vs 14.3 ms packed-pallas — sectored
  (disconnected) events decompose and blocked's per-sector MXU blocks
  beat the window amplification; the fused kernels remain the path for
  CONNECTED large graphs (single mu200 full event without sectoring,
  and the per-shard partitioned regime), where batching is unavailable
  and blocked's [nB*bn, V] broadcast one-hot stops fitting.  auto
  therefore prefers blocks over plans (pinned in tests/test_routing).

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
      oth_win_off:  [n_tiles] node-table window start for the gather side
      seg_win_off:  [n_tiles] node-table window start for the seg side

    Static fields (hashable; participate in jit cache keys):
      n_node, n_edge, tile_e, w_oth, w_seg, table_rows

    Scatters to the seg side reuse the seg-window one-hot ``oh_s`` that
    the gather side already needs: ``out[vs : vs+Ws] += oh_s^T @ msgs``
    accumulates straight into a full VMEM node table (the grid runs
    sequentially, so overlapping windows are safe).  This replaced the
    original compact-rank scatter (one-hot over per-tile rank offsets +
    an XLA ``at[node_of_rank].add`` expansion after the kernel): one
    fewer one-hot build per tile, no [R, D] scatter-add launch per call.
    """

    order: jax.Array
    inv_order: jax.Array
    sorted_seg: jax.Array
    sorted_oth: jax.Array
    oth_win_off: jax.Array
    seg_win_off: jax.Array
    # Optional PREBUILT one-hot operands (int8 or bf16, [E, W*]): the
    # one-hots are pure functions of the static topology, so building
    # them once host-side turns the kernels' VPU iota-compare builds
    # into streamed DMA that Pallas double-buffers behind the MXU work.
    # This is the blocked-ELL storage of the incidence matrix.
    oh_oth: Optional[jax.Array] = None     # [E, w_oth]
    oh_seg: Optional[jax.Array] = None     # [E, w_seg]
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

    @property
    def prebuilt(self) -> bool:
        return self.oh_oth is not None


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


def _prebuild_oh(ids: np.ndarray, off: np.ndarray, width: int,
                 tile_e: int, dtype) -> np.ndarray:
    """[E, width] one-hot of (ids - per-tile offset), built host-side."""
    loc = ids - np.repeat(off, tile_e)
    return (loc[:, None] == np.arange(width, dtype=loc.dtype)[None, :]
            ).astype(dtype)


def build_edge_plan(seg_ids, oth_ids, n_node: int,
                    tile_e: int = DEFAULT_TILE_E,
                    window: Optional[int] = None,
                    window_seg: Optional[int] = None,
                    boundaries=None,
                    precompute: Optional[str] = None) -> EdgePlan:
    """Host-side (numpy) plan construction for one aggregation direction.

    ``seg_ids``/``oth_ids``: [E] int arrays (E a multiple of ``tile_e``
    unless ``boundaries`` is given; pad with edges pointing at any real
    node and weight 0).  ``window``: override the auto-sized gather
    window (must cover every tile's id span).

    ``boundaries``: optional ascending node-id boundaries (e.g. detector
    layer offsets, `data.toy2d.layer_offsets`) covering ``[0, n_node]``.
    When given, the seg-sorted edges are padded per boundary segment so
    that **no tile spans two segments**: on layered graphs this shrinks
    the per-tile id span — and hence the one-hot window ``W``, which
    dominates kernel time — from ~n_nodes_per_layer to the locality
    neighbourhood (measured 1024 -> 128 at V=16k fullevent scale).  Pad
    slots duplicate the segment's last real edge and carry sentinel
    ``order == len(seg_ids)`` so ``jnp.take(w, order, fill_value=0)``
    zeroes their weight; real-edge outputs are recovered via
    ``inv_order`` (length = real edge count).

    ``precompute``: ``"int8"`` or ``"bf16"`` — additionally store the
    two per-edge one-hot operands (gather-by-oth, gather-by-seg; they
    double as the scatter operands) as dense [E, W] arrays so the
    kernels stream them from HBM instead of rebuilding them on the VPU
    every launch.  Costs ``E*(w_oth + w_seg)`` bytes (int8) of plan
    memory — e.g. ~47 MB at the fullevent config (E=182k, 128/128).
    ``"int8"`` halves the DMA and casts in the kernel; ``"bf16"`` feeds
    the MXU directly.
    """
    seg_ids = np.asarray(seg_ids, np.int32)
    oth_ids = np.asarray(oth_ids, np.int32)
    e = len(seg_ids)
    if seg_ids.max(initial=0) >= n_node or oth_ids.max(initial=0) >= n_node:
        raise ValueError("edge ids must be < n_node")
    order = np.argsort(seg_ids, kind="stable").astype(np.int32)
    ss, so = seg_ids[order], oth_ids[order]
    if boundaries is not None:
        b = np.asarray(boundaries, np.int64)
        if b[0] != 0 or b[-1] < n_node:
            raise ValueError("boundaries must cover [0, n_node]")
        bucket = np.searchsorted(b, ss, side="right") - 1   # per sorted edge
        counts = np.bincount(bucket, minlength=len(b) - 1)
        padded = -(-counts // tile_e) * tile_e
        ends = np.cumsum(counts)
        new_e = int(padded.sum())
        ss_p = np.empty(new_e, np.int32)
        so_p = np.empty(new_e, np.int32)
        order_p = np.full(new_e, e, np.int32)               # sentinel = e
        pos = 0
        for i, (c, p) in enumerate(zip(counts, padded)):
            if p == 0:
                continue
            lo = ends[i] - c
            ss_p[pos:pos + c] = ss[lo:ends[i]]
            so_p[pos:pos + c] = so[lo:ends[i]]
            order_p[pos:pos + c] = order[lo:ends[i]]
            if p > c:  # duplicate the last real edge into the pad slots
                ss_p[pos + c:pos + p] = ss[ends[i] - 1]
                so_p[pos + c:pos + p] = so[ends[i] - 1]
            pos += p
        ss, so, order = ss_p, so_p, order_p
        inv_order = np.zeros(e, np.int32)
        real = order < e
        inv_order[order[real]] = np.arange(len(order), dtype=np.int32)[real]
        e_pad = new_e
    else:
        if e % tile_e:
            raise ValueError(
                f"edge count {e} not a multiple of tile {tile_e}")
        inv_order = np.argsort(order, kind="stable").astype(np.int32)
        e_pad = e
    n_tiles = e_pad // tile_e
    oth_off, w_oth, tr1 = _window_offsets(
        so.reshape(n_tiles, tile_e), window, n_node)
    seg_off, w_seg, tr2 = _window_offsets(
        ss.reshape(n_tiles, tile_e), window_seg, n_node)
    oh_oth = oh_seg = None
    if precompute is not None:
        import ml_dtypes
        dt = {"int8": np.int8, "bf16": ml_dtypes.bfloat16}[precompute]
        oh_oth = _prebuild_oh(so, oth_off, w_oth, tile_e, dt)
        oh_seg = _prebuild_oh(ss, seg_off, w_seg, tile_e, dt)
    return EdgePlan(
        order=order, inv_order=inv_order, sorted_seg=ss, sorted_oth=so,
        oth_win_off=oth_off, seg_win_off=seg_off,
        oh_oth=oh_oth, oh_seg=oh_seg,
        n_node=n_node, n_edge=e_pad, tile_e=tile_e,
        w_oth=w_oth, w_seg=w_seg, table_rows=max(tr1, tr2),
    )


def build_agg_plans(senders, receivers, n_node: int,
                    tile_e: int = DEFAULT_TILE_E,
                    window: Optional[int] = None,
                    window_seg: Optional[int] = None,
                    boundaries=None,
                    precompute: Optional[str] = None) -> AggPlans:
    """Both aggregation directions for a graph topology (host-side).

    The fused pair kernels (:func:`aggregate_pair`, :func:`gather_pair`)
    only consume ``recv``; ``send`` backs the single-direction
    :func:`spmm` API.  ``boundaries``/``precompute``: see
    :func:`build_edge_plan` (one-hots are only prebuilt on ``recv`` —
    the plan the fused kernels run on)."""
    recv = build_edge_plan(receivers, senders, n_node, tile_e, window,
                           window_seg=window_seg, boundaries=boundaries,
                           precompute=precompute)
    send = build_edge_plan(senders, receivers, n_node, tile_e, window,
                           window_seg=window_seg, boundaries=boundaries)
    return AggPlans(recv=recv, send=send)


def _sorted_w(w, plan: EdgePlan):
    """Edge weights permuted into plan order; pad-slot sentinels -> 0."""
    return jnp.take(w.astype(jnp.float32), plan.order, axis=0,
                    mode="fill", fill_value=0.0)


# ---------------------------------------------------------------------------
# SpMM kernel: out[seg window] += onehot_seg^T @ (w * (onehot_oth @ h_window))
# ---------------------------------------------------------------------------

# Edge subtiles processed per grid step: amortises the per-step grid/DMA
# overhead (~1 us on the bench chip) over several MXU tile pairs.
DEFAULT_SUBTILES = 4

# The fused pair kernels hold the node table(s) plus two f32 output
# tables resident in VMEM — past the 16MB default scoped limit at
# V=16k, D=128.  v5e/v5p chips have 128MB VMEM; reserve what the
# largest fused kernel needs.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


def _precision_for(dtype) -> jax.lax.Precision:
    """bf16 inputs are exact in one MXU pass (f32 accumulate); f32 inputs
    need multi-pass precision — DEFAULT rounds the table through one
    bf16 pass (measured max abs err ~0.2 on N(0,1) tables).  HIGH
    (bf16x3) would suffice — the one-hot operand is exactly representable
    in bf16, so the hi+lo split of the *table* side reconstructs every
    f32 row — but Mosaic's dot lowering only implements DEFAULT/HIGHEST
    on this toolchain, so f32 pays HIGHEST (6 passes).  All production
    paths run the tables in bf16 (`compute_dtype`), where DEFAULT is
    exact."""
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _spmm_kernel(seg_off_ref, win_off_ref, seg_ref, oth_ref, w_ref,
                 h_ref, out_ref, *, w_oth, w_seg, tile_e, subtiles,
                 precision):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        s0 = pl.multiple_of(seg_off_ref[t], 16)
        v0 = pl.multiple_of(win_off_ref[t], 16)
        oh_g = _oh(oth_ref[sl], v0, w_oth, h_ref.dtype)       # [T, Wo]
        gathered = _dotf(oh_g, h_ref[pl.ds(v0, w_oth), :],
                         precision)                           # [T, D] f32
        msgs = gathered * w_ref[sl]                           # [T, D]
        oh_s = _oh(seg_ref[sl], s0, w_seg, h_ref.dtype)       # [T, Ws]
        out_ref[pl.ds(s0, w_seg), :] += _dott(
            oh_s, msgs.astype(h_ref.dtype), precision)


def _spmm_table(h_table: jax.Array, w_sorted: jax.Array,
                plan: EdgePlan,
                subtiles: int | None = None) -> jax.Array:
    """[table_rows, D] f32 node sums for one direction."""
    if subtiles is None:
        subtiles = DEFAULT_SUBTILES  # module attr: tunable at runtime
    e, t = plan.n_edge, plan.tile_e
    d = h_table.shape[1]
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
        functools.partial(_spmm_kernel, w_oth=plan.w_oth,
                          w_seg=plan.w_seg, tile_e=t,
                          subtiles=subtiles,
                          precision=_precision_for(h_table.dtype)),
        grid_spec=grid_spec,
        compiler_params=_VMEM_LIMIT,
        out_shape=jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * (plan.w_oth + plan.w_seg) * d,
            bytes_accessed=(2 * plan.table_rows * d + 3 * e) * 4,
            transcendentals=0,
        ),
    )(plan.seg_win_off, plan.oth_win_off,
      plan.sorted_seg[:, None], plan.sorted_oth[:, None],
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
    w_sorted = _sorted_w(w, plan)
    out = _spmm_table(_pad_table(h, plan), w_sorted, plan)
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
# Fused pair kernels: fwd (mi + mo) and bwd (dh + dw), ONE plan, ONE launch
# ---------------------------------------------------------------------------
#
# Everything is expressed in the RECV plan's sorted order (seg = recv,
# oth = send).  Per edge tile only TWO one-hot operands are needed:
#
#   oh_s [T, Ws]  by seg id        oh_o [T, Wo]  by oth id
#
# and every gather AND scatter is a matmul against them: gathers as
# ``oh @ window``, scatters as ``oh^T @ msgs`` accumulated into
# full-table VMEM outputs via per-tile window slices (safe: the TPU
# grid executes sequentially).  The one-hots are either built in-kernel
# (VPU iota compare, O(T*W)) or — with ``precompute`` — streamed
# prebuilt from HBM.  The fused forms need 2 builds for both forward
# directions (vs 4 for two separate SpMMs) and 2 for the whole backward
# (vs 6 for 2 SpMMs + the dual SDDMM), and no XLA scatter-add fixup
# launches after the kernel.


def _oh(ids, off, width, dtype):
    cols = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], width), 1)
    return ((ids - off) == cols).astype(dtype)


def _dotf(a, b, precision):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _dott(a, b, precision):
    """a^T @ b with f32 accumulate (contraction over the edge axis)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _agg_pair_kernel(oth_off_ref, seg_off_ref,
                     oth_ref, seg_ref, w_ref, h_ref,
                     mi_ref, mo_ref, *, w_oth, w_seg, tile_e,
                     subtiles, precision):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        mi_ref[:] = jnp.zeros_like(mi_ref)
        mo_ref[:] = jnp.zeros_like(mo_ref)

    dt = h_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        oh_o = _oh(oth_ref[sl], vo, w_oth, dt)
        oh_s = _oh(seg_ref[sl], vs, w_seg, dt)
        w = w_ref[sl]
        h_o = _dotf(oh_o, h_ref[pl.ds(vo, w_oth), :], precision)  # h[send]
        h_s = _dotf(oh_s, h_ref[pl.ds(vs, w_seg), :], precision)  # h[recv]
        mi_ref[pl.ds(vs, w_seg), :] += _dott(
            oh_s, (w * h_o).astype(dt), precision)
        mo_ref[pl.ds(vo, w_oth), :] += _dott(
            oh_o, (w * h_s).astype(dt), precision)


def _agg_pair_kernel_pre(oth_off_ref, seg_off_ref,
                         oho_ref, ohs_ref, w_ref, h_ref,
                         mi_ref, mo_ref, *, w_oth, w_seg, tile_e,
                         subtiles, precision):
    """Prebuilt-one-hot variant: both one-hots stream from HBM
    ([group, W] blocks, double-buffered by the grid pipeline) instead of
    being rebuilt on the VPU."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        mi_ref[:] = jnp.zeros_like(mi_ref)
        mo_ref[:] = jnp.zeros_like(mo_ref)

    dt = h_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        oh_o = oho_ref[sl, :].astype(dt)
        oh_s = ohs_ref[sl, :].astype(dt)
        w = w_ref[sl]
        h_o = _dotf(oh_o, h_ref[pl.ds(vo, w_oth), :], precision)
        h_s = _dotf(oh_s, h_ref[pl.ds(vs, w_seg), :], precision)
        mi_ref[pl.ds(vs, w_seg), :] += _dott(
            oh_s, (w * h_o).astype(dt), precision)
        mo_ref[pl.ds(vo, w_oth), :] += _dott(
            oh_o, (w * h_s).astype(dt), precision)


def _pair_grid(plan: EdgePlan, subtiles, n_scalar, in_specs, out_specs,
               d: int = 1):
    """Grid spec helper: ``"edge"`` -> per-step [group, 1] block,
    ``"edge_d"`` -> per-step [group, d] block, ``("edge", w)`` -> per-step
    [group, w] block (prebuilt one-hot streams), ``"tab"`` -> whole-array
    VMEM resident."""
    while plan.n_tiles % subtiles:
        subtiles //= 2
    group = plan.tile_e * subtiles

    def spec(s):
        if isinstance(s, tuple):
            return pl.BlockSpec((group, s[1]), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
        return {
            "edge": pl.BlockSpec((group, 1), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
            "edge_d": pl.BlockSpec((group, d), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            "tab": pl.BlockSpec(memory_space=pltpu.VMEM),
        }[s]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(plan.n_tiles // subtiles,),
        in_specs=[spec(s) for s in in_specs],
        out_specs=[spec(s) for s in out_specs],
    )
    return subtiles, grid_spec


def _agg_pair_fused(h: jax.Array, w: jax.Array, plan: EdgePlan,
                    subtiles: int | None = None):
    """(mi, mo) of :func:`aggregate_pair` in ONE kernel launch."""
    subtiles = DEFAULT_SUBTILES if subtiles is None else subtiles
    e, t, d = plan.n_edge, plan.tile_e, h.shape[1]
    w_sorted = _sorted_w(w, plan)
    if plan.prebuilt:
        kernel = _agg_pair_kernel_pre
        in_specs = [("edge", plan.w_oth), ("edge", plan.w_seg),
                    "edge", "tab"]
        operands = (plan.oh_oth, plan.oh_seg)
    else:
        kernel = _agg_pair_kernel
        in_specs = ["edge"] * 3 + ["tab"]
        operands = (plan.sorted_oth[:, None], plan.sorted_seg[:, None])
    subtiles, grid_spec = _pair_grid(
        plan, subtiles, 2, in_specs, ["tab", "tab"])
    mi_tab, mo_tab = pl.pallas_call(
        functools.partial(kernel, w_oth=plan.w_oth,
                          w_seg=plan.w_seg, tile_e=t,
                          subtiles=subtiles,
                          precision=_precision_for(h.dtype)),
        grid_spec=grid_spec,
        compiler_params=_VMEM_LIMIT,
        out_shape=[jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32),
                   jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * e * (plan.w_oth + plan.w_seg) * d
            + 2 * e * (plan.w_oth + plan.w_seg),
            bytes_accessed=(3 * plan.table_rows * d + 4 * e) * 4,
            transcendentals=0,
        ),
    )(plan.oth_win_off, plan.seg_win_off,
      *operands, w_sorted[:, None], _pad_table(h, plan))
    return (mi_tab[: plan.n_node].astype(h.dtype),
            mo_tab[: plan.n_node].astype(h.dtype))


def _agg_bwd_kernel(oth_off_ref, seg_off_ref,
                    oth_ref, seg_ref, w_ref,
                    gmi_ref, gmo_ref, h_ref,
                    dh_ref, dw_ref, *, w_oth, w_seg,
                    tile_e, subtiles, precision):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    dt = h_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        oh_o = _oh(oth_ref[sl], vo, w_oth, dt)
        oh_s = _oh(seg_ref[sl], vs, w_seg, dt)
        w = w_ref[sl]
        gmi_s = _dotf(oh_s, gmi_ref[pl.ds(vs, w_seg), :], precision)
        gmo_o = _dotf(oh_o, gmo_ref[pl.ds(vo, w_oth), :], precision)
        h_o = _dotf(oh_o, h_ref[pl.ds(vo, w_oth), :], precision)
        h_s = _dotf(oh_s, h_ref[pl.ds(vs, w_seg), :], precision)
        # dw[e] = <g_mi[recv], h[send]> + <g_mo[send], h[recv]>
        dw_ref[sl] = jnp.sum(gmi_s * h_o + gmo_o * h_s, axis=1,
                             keepdims=True)
        # BOTH dh scatters accumulate into ONE node table:
        # dh[send] += w * g_mi[recv]  and  dh[recv] += w * g_mo[send]
        dh_ref[pl.ds(vo, w_oth), :] += _dott(
            oh_o, (w * gmi_s).astype(dt), precision)
        dh_ref[pl.ds(vs, w_seg), :] += _dott(
            oh_s, (w * gmo_o).astype(dt), precision)


def _agg_bwd_kernel_pre(oth_off_ref, seg_off_ref,
                        oho_ref, ohs_ref, w_ref,
                        gmi_ref, gmo_ref, h_ref,
                        dh_ref, dw_ref, *, w_oth, w_seg,
                        tile_e, subtiles, precision):
    """Prebuilt-one-hot variant of the fused backward."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    dt = h_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        oh_o = oho_ref[sl, :].astype(dt)
        oh_s = ohs_ref[sl, :].astype(dt)
        w = w_ref[sl]
        gmi_s = _dotf(oh_s, gmi_ref[pl.ds(vs, w_seg), :], precision)
        gmo_o = _dotf(oh_o, gmo_ref[pl.ds(vo, w_oth), :], precision)
        h_o = _dotf(oh_o, h_ref[pl.ds(vo, w_oth), :], precision)
        h_s = _dotf(oh_s, h_ref[pl.ds(vs, w_seg), :], precision)
        dw_ref[sl] = jnp.sum(gmi_s * h_o + gmo_o * h_s, axis=1,
                             keepdims=True)
        dh_ref[pl.ds(vo, w_oth), :] += _dott(
            oh_o, (w * gmi_s).astype(dt), precision)
        dh_ref[pl.ds(vs, w_seg), :] += _dott(
            oh_s, (w * gmo_o).astype(dt), precision)


def _agg_bwd_fused(g_mi, g_mo, h, w, plan: EdgePlan,
                   subtiles: int | None = None):
    """(dh, dw) of :func:`aggregate_pair` in ONE kernel launch."""
    subtiles = DEFAULT_SUBTILES if subtiles is None else subtiles
    e, t, d = plan.n_edge, plan.tile_e, h.shape[1]
    if plan.prebuilt:
        kernel = _agg_bwd_kernel_pre
        in_specs = [("edge", plan.w_oth), ("edge", plan.w_seg),
                    "edge"] + ["tab"] * 3
        operands = (plan.oh_oth, plan.oh_seg)
    else:
        kernel = _agg_bwd_kernel
        in_specs = ["edge"] * 3 + ["tab"] * 3
        operands = (plan.sorted_oth[:, None], plan.sorted_seg[:, None])
    subtiles, grid_spec = _pair_grid(
        plan, subtiles, 2, in_specs, ["tab", "edge"])
    w_sorted = _sorted_w(w, plan)
    dh_tab, dw = pl.pallas_call(
        functools.partial(kernel, w_oth=plan.w_oth,
                          w_seg=plan.w_seg, tile_e=t,
                          subtiles=subtiles,
                          precision=_precision_for(h.dtype)),
        grid_spec=grid_spec,
        compiler_params=_VMEM_LIMIT,
        out_shape=[jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32),
                   jax.ShapeDtypeStruct((e, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * e * d * (plan.w_oth + plan.w_seg) + 6 * e * d,
            bytes_accessed=(4 * plan.table_rows * d + 5 * e) * 4,
            transcendentals=0,
        ),
    )(plan.oth_win_off, plan.seg_win_off,
      *operands, w_sorted[:, None],
      _pad_table(g_mi.astype(h.dtype), plan),
      _pad_table(g_mo.astype(h.dtype), plan), _pad_table(h, plan))
    dh = dh_tab[: plan.n_node]
    dw_edge = jnp.take(dw[:, 0], plan.inv_order, axis=0)
    return dh, dw_edge


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
    Forward and backward are each ONE fused kernel on the recv plan.
    """
    mi, mo = _agg_pair_fused(h, w, plans.recv)
    return mi, mo


def _agg_fwd(h, w, plans):
    return aggregate_pair(h, w, plans), (h, w, plans)


def _agg_bwd(res, g):
    h, w, plans = res
    g_mi, g_mo = g
    dh, dw = _agg_bwd_fused(g_mi, g_mo, h, w, plans.recv)
    return dh.astype(h.dtype), dw.astype(w.dtype), None


aggregate_pair.defvjp(_agg_fwd, _agg_bwd)


# ---------------------------------------------------------------------------
# gather_pair: fused per-edge endpoint-projection sum + custom VJP
# ---------------------------------------------------------------------------

def _gather_pair_kernel(oth_off_ref, seg_off_ref, oth_ref, seg_ref,
                        pa_ref, pb_ref, out_ref, *, w_oth, w_seg, tile_e,
                        subtiles, precision):
    g = pl.program_id(0)
    dt = pa_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        oh_o = _oh(oth_ref[sl], vo, w_oth, dt)
        oh_s = _oh(seg_ref[sl], vs, w_seg, dt)
        out_ref[sl, :] = (
            _dotf(oh_o, pa_ref[pl.ds(vo, w_oth), :], precision)
            + _dotf(oh_s, pb_ref[pl.ds(vs, w_seg), :], precision))


def _gather_bwd_kernel(oth_off_ref, seg_off_ref, oth_ref, seg_ref,
                       g_ref, dpa_ref, dpb_ref, *, w_oth, w_seg, tile_e,
                       subtiles, precision):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        dpa_ref[:] = jnp.zeros_like(dpa_ref)
        dpb_ref[:] = jnp.zeros_like(dpb_ref)

    dt = g_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        oh_o = _oh(oth_ref[sl], vo, w_oth, dt)
        oh_s = _oh(seg_ref[sl], vs, w_seg, dt)
        gt = g_ref[sl, :]
        dpa_ref[pl.ds(vo, w_oth), :] += _dott(oh_o, gt, precision)
        dpb_ref[pl.ds(vs, w_seg), :] += _dott(oh_s, gt, precision)


def _gather_bwd_kernel_pre(oth_off_ref, seg_off_ref, oho_ref, ohs_ref,
                           g_ref, dpa_ref, dpb_ref, *, w_oth, w_seg,
                           tile_e, subtiles, precision):
    """Prebuilt-one-hot variant of the gather_pair backward."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        dpa_ref[:] = jnp.zeros_like(dpa_ref)
        dpb_ref[:] = jnp.zeros_like(dpb_ref)

    dt = g_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        oh_o = oho_ref[sl, :].astype(dt)
        oh_s = ohs_ref[sl, :].astype(dt)
        gt = g_ref[sl, :]
        dpa_ref[pl.ds(vo, w_oth), :] += _dott(oh_o, gt, precision)
        dpb_ref[pl.ds(vs, w_seg), :] += _dott(oh_s, gt, precision)


def _gather_pair_raw(pa, pb, plan: EdgePlan, subtiles=None):
    subtiles = DEFAULT_SUBTILES if subtiles is None else subtiles
    e, t, d = plan.n_edge, plan.tile_e, pa.shape[1]
    subtiles, grid_spec = _pair_grid(
        plan, subtiles, 2, ["edge"] * 2 + ["tab"] * 2, ["edge_d"], d=d)
    out = pl.pallas_call(
        functools.partial(_gather_pair_kernel, w_oth=plan.w_oth,
                          w_seg=plan.w_seg, tile_e=t, subtiles=subtiles,
                          precision=_precision_for(pa.dtype)),
        grid_spec=grid_spec,
        compiler_params=_VMEM_LIMIT,
        out_shape=[jax.ShapeDtypeStruct((e, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * e * (plan.w_oth + plan.w_seg) * d + e * d,
            bytes_accessed=(2 * plan.table_rows * d + e * d + 2 * e) * 4,
            transcendentals=0,
        ),
    )(plan.oth_win_off, plan.seg_win_off,
      plan.sorted_oth[:, None], plan.sorted_seg[:, None],
      _pad_table(pa, plan), _pad_table(pb, plan))[0]
    return jnp.take(out, plan.inv_order, axis=0)


def _gather_pair_bwd_raw(g, plan: EdgePlan, dtype, subtiles=None):
    subtiles = DEFAULT_SUBTILES if subtiles is None else subtiles
    e, t, d = plan.n_edge, plan.tile_e, g.shape[1]
    # cotangent rows into plan order; pad-slot sentinels -> zero rows
    g_sorted = jnp.take(g.astype(dtype), plan.order, axis=0,
                        mode="fill", fill_value=0)
    if plan.prebuilt:
        kernel = _gather_bwd_kernel_pre
        in_specs = [("edge", plan.w_oth), ("edge", plan.w_seg), "edge_d"]
        operands = (plan.oh_oth, plan.oh_seg)
    else:
        kernel = _gather_bwd_kernel
        in_specs = ["edge", "edge", "edge_d"]
        operands = (plan.sorted_oth[:, None], plan.sorted_seg[:, None])
    subtiles, grid_spec = _pair_grid(
        plan, subtiles, 2, in_specs, ["tab", "tab"], d=d)
    dpa_tab, dpb_tab = pl.pallas_call(
        functools.partial(kernel, w_oth=plan.w_oth, w_seg=plan.w_seg,
                          tile_e=t, subtiles=subtiles,
                          precision=_precision_for(dtype)),
        grid_spec=grid_spec,
        compiler_params=_VMEM_LIMIT,
        out_shape=[jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32),
                   jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * e * (plan.w_oth + plan.w_seg) * d,
            bytes_accessed=(2 * plan.table_rows * d + e * d + 2 * e) * 4,
            transcendentals=0,
        ),
    )(plan.oth_win_off, plan.seg_win_off, *operands, g_sorted)
    return dpa_tab[: plan.n_node], dpb_tab[: plan.n_node]


@jax.custom_vjp
def gather_pair(pa: jax.Array, pb: jax.Array, senders: jax.Array,
                receivers: jax.Array, plans: AggPlans):
    """``out[e] = pa[senders[e]] + pb[receivers[e]]`` — the projection-
    form edge-MLP first layer (`models/mpnn.py
    edge_network_logits_proj`, the reference's
    ``cat[h[send], h[recv]] @ W1`` refactored, `model.py:69-81`).

    The FORWARD stays on XLA's native row gather — measured FASTER than
    the windowed-one-hot kernel for pure gathers (572 vs 1524 us at
    V=16k/E=131k/D=128: a gather is pure data movement, and XLA's copy
    engine beats rebuilding one-hots on the VPU).  The VJP — two
    [E, D]-row segment-sums, the scatter XLA handles badly (2336 us
    fwd+bwd) — runs as ONE fused Pallas scatter kernel
    (`_gather_bwd_kernel`).  Returns [E, D] in the INPUT dtype, EDGE
    order — at bf16 the [E, D] pre-activation is the train step's
    biggest HBM tensor, and emitting it f32 would double its traffic.
    """
    del plans
    return gather_pair_reference(pa, pb, senders, receivers)


def _gp_fwd(pa, pb, senders, receivers, plans):
    # zero-size slices carry only the primal dtypes into the bwd rule
    return (gather_pair_reference(pa, pb, senders, receivers),
            (pa[:0], pb[:0], plans))


def _gp_bwd(res, g):
    pa0, pb0, plans = res
    dpa, dpb = _gather_pair_bwd_raw(g, plans.recv, pa0.dtype)
    return dpa.astype(pa0.dtype), dpb.astype(pb0.dtype), None, None, None


gather_pair.defvjp(_gp_fwd, _gp_bwd)


def gather_pair_reference(pa, pb, senders, receivers):
    return (jnp.take(pa, senders, axis=0)
            + jnp.take(pb, receivers, axis=0))


# ---------------------------------------------------------------------------
# iteration_pair: ONE kernel for a whole message-passing iteration's edge
# scoring + weighted aggregation (fwd and bwd each a single launch)
# ---------------------------------------------------------------------------
#
# The per-iteration chain of the SegmentClassifier (`model.py:148-154`,
# proj form `models/mpnn.py edge_network_logits_proj`):
#
#     pre[e] = (pa[send] + pb[recv]) * em        [E, H]
#     z      = tanh(pre + b1)                    [E, H]
#     e_     = sigmoid(z @ w2 + b2) * em         [E]
#     mi[n]  = sum_{recv==n} e_ * h[send]        [V, D]
#     mo[n]  = sum_{send==n} e_ * h[recv]        [V, D]
#
# runs as ONE kernel: the [E, H] intermediates (pre, z) and the [E]
# scores live only in VMEM tile registers — at fullevent scale
# (E=182k, H=64 bf16) that removes ~4 x 23 MB of HBM round-trips per
# iteration plus three launch boundaries.  The backward is also one
# launch: residuals are just the node tables (z, e_ recomputed per tile
# — VPU work traded for the [E, H] residual traffic).


def _iter_pair_kernel(oth_off_ref, seg_off_ref, oth_ref, seg_ref, em_ref,
                      pa_ref, pb_ref, h_ref, w2_ref, b1_ref, b2_ref,
                      mi_ref, mo_ref, *, w_oth, w_seg, tile_e, subtiles,
                      precision, prebuilt):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        mi_ref[:] = jnp.zeros_like(mi_ref)
        mo_ref[:] = jnp.zeros_like(mo_ref)

    dt = h_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        if prebuilt:
            oh_o = oth_ref[sl, :].astype(dt)
            oh_s = seg_ref[sl, :].astype(dt)
        else:
            oh_o = _oh(oth_ref[sl], vo, w_oth, dt)
            oh_s = _oh(seg_ref[sl], vs, w_seg, dt)
        em = em_ref[sl]                                         # [T, 1]
        pa_rows = _dotf(oh_o, pa_ref[pl.ds(vo, w_oth), :], precision)
        pb_rows = _dotf(oh_s, pb_ref[pl.ds(vs, w_seg), :], precision)
        pre = (pa_rows + pb_rows) * em                          # [T, H]
        z = jnp.tanh(pre + b1_ref[0:1, :])                      # f32
        logit = (_dotf(z.astype(dt), w2_ref[:, :], precision)
                 + b2_ref[0:1, 0:1])
        e_ = jax.nn.sigmoid(logit) * em                         # [T, 1]
        h_o = _dotf(oh_o, h_ref[pl.ds(vo, w_oth), :], precision)
        h_s = _dotf(oh_s, h_ref[pl.ds(vs, w_seg), :], precision)
        mi_ref[pl.ds(vs, w_seg), :] += _dott(
            oh_s, (e_ * h_o).astype(dt), precision)
        mo_ref[pl.ds(vo, w_oth), :] += _dott(
            oh_o, (e_ * h_s).astype(dt), precision)


def _iter_pair_bwd_kernel(oth_off_ref, seg_off_ref, oth_ref, seg_ref,
                          em_ref, pa_ref, pb_ref, h_ref, w2_ref,
                          w2row_ref, b1_ref, b2_ref, gmi_ref, gmo_ref,
                          dh_ref, dpa_ref, dpb_ref, dw2_ref, db1_ref,
                          db2_ref, *, w_oth, w_seg, tile_e, subtiles,
                          precision, prebuilt):
    """Full VJP of :func:`_iter_pair_kernel` in one launch.

    Recomputes z / e_ per tile from the node tables (the residuals are
    V-sized, never E-sized) and accumulates dh, dpa, dpb into node
    tables plus dw2/db1/db2 into small reduction rows."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dpa_ref[:] = jnp.zeros_like(dpa_ref)
        dpb_ref[:] = jnp.zeros_like(dpb_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dt = h_ref.dtype
    for k in range(subtiles):
        t = g * subtiles + k
        sl = slice(k * tile_e, (k + 1) * tile_e)
        vo = pl.multiple_of(oth_off_ref[t], 16)
        vs = pl.multiple_of(seg_off_ref[t], 16)
        if prebuilt:
            oh_o = oth_ref[sl, :].astype(dt)
            oh_s = seg_ref[sl, :].astype(dt)
        else:
            oh_o = _oh(oth_ref[sl], vo, w_oth, dt)
            oh_s = _oh(seg_ref[sl], vs, w_seg, dt)
        em = em_ref[sl]
        # --- recompute forward tile state
        pa_rows = _dotf(oh_o, pa_ref[pl.ds(vo, w_oth), :], precision)
        pb_rows = _dotf(oh_s, pb_ref[pl.ds(vs, w_seg), :], precision)
        pre = (pa_rows + pb_rows) * em
        z = jnp.tanh(pre + b1_ref[0:1, :])
        logit = (_dotf(z.astype(dt), w2_ref[:, :], precision)
                 + b2_ref[0:1, 0:1])
        sig = jax.nn.sigmoid(logit)
        e_ = sig * em
        h_o = _dotf(oh_o, h_ref[pl.ds(vo, w_oth), :], precision)
        h_s = _dotf(oh_s, h_ref[pl.ds(vs, w_seg), :], precision)
        gmi_s = _dotf(oh_s, gmi_ref[pl.ds(vs, w_seg), :], precision)
        gmo_o = _dotf(oh_o, gmo_ref[pl.ds(vo, w_oth), :], precision)
        # --- dh through the aggregation (same as _agg_bwd_kernel)
        dh_ref[pl.ds(vo, w_oth), :] += _dott(
            oh_o, (e_ * gmi_s).astype(dt), precision)
        dh_ref[pl.ds(vs, w_seg), :] += _dott(
            oh_s, (e_ * gmo_o).astype(dt), precision)
        # --- de_ -> dlogit -> dz -> dpre
        de = jnp.sum(gmi_s * h_o + gmo_o * h_s, axis=1, keepdims=True)
        dlogit = de * em * sig * (1.0 - sig)                    # [T, 1]
        dz = dlogit * w2row_ref[0:1, :]                         # [T, H]
        dpre = dz * (1.0 - z * z) * em                          # [T, H]
        dpa_ref[pl.ds(vo, w_oth), :] += _dott(
            oh_o, dpre.astype(dt), precision)
        dpb_ref[pl.ds(vs, w_seg), :] += _dott(
            oh_s, dpre.astype(dt), precision)
        # --- parameter reductions (tiny rows, accumulated across tiles)
        dw2_ref[0:1, :] += jnp.sum(z * dlogit, axis=0, keepdims=True)
        db1_ref[0:1, :] += jnp.sum(dz * (1.0 - z * z), axis=0,
                                   keepdims=True)
        db2_ref[0:1, 0:1] += jnp.sum(dlogit, keepdims=True)[0:1, 0:1]


def _iter_pair_call(pa, pb, h, em_sorted, w2, b1, b2, plan: EdgePlan,
                    subtiles=None):
    subtiles = DEFAULT_SUBTILES if subtiles is None else subtiles
    e, t, d = plan.n_edge, plan.tile_e, h.shape[1]
    hdim = pa.shape[1]
    if plan.prebuilt:
        id_specs = [("edge", plan.w_oth), ("edge", plan.w_seg)]
        id_ops = (plan.oh_oth, plan.oh_seg)
    else:
        id_specs = ["edge", "edge"]
        id_ops = (plan.sorted_oth[:, None], plan.sorted_seg[:, None])
    subtiles, grid_spec = _pair_grid(
        plan, subtiles, 2, id_specs + ["edge"] + ["tab"] * 6,
        ["tab", "tab"])
    mi_tab, mo_tab = pl.pallas_call(
        functools.partial(_iter_pair_kernel, w_oth=plan.w_oth,
                          w_seg=plan.w_seg, tile_e=t, subtiles=subtiles,
                          precision=_precision_for(h.dtype),
                          prebuilt=plan.prebuilt),
        grid_spec=grid_spec,
        compiler_params=_VMEM_LIMIT,
        out_shape=[jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32),
                   jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * e * (plan.w_oth + plan.w_seg) * (d + hdim),
            bytes_accessed=(5 * plan.table_rows * d + 4 * e) * 4,
            transcendentals=2 * e * hdim,
        ),
    )(plan.oth_win_off, plan.seg_win_off, *id_ops, em_sorted[:, None],
      _pad_table(pa, plan), _pad_table(pb, plan), _pad_table(h, plan),
      w2[:, None], b1[None, :], b2.reshape(1, 1))
    return (mi_tab[: plan.n_node].astype(h.dtype),
            mo_tab[: plan.n_node].astype(h.dtype))


def _iter_pair_bwd_call(pa, pb, h, em_sorted, w2, b1, b2, g_mi, g_mo,
                        plan: EdgePlan, subtiles=None):
    subtiles = DEFAULT_SUBTILES if subtiles is None else subtiles
    e, t, d = plan.n_edge, plan.tile_e, h.shape[1]
    hdim = pa.shape[1]
    if plan.prebuilt:
        id_specs = [("edge", plan.w_oth), ("edge", plan.w_seg)]
        id_ops = (plan.oh_oth, plan.oh_seg)
    else:
        id_specs = ["edge", "edge"]
        id_ops = (plan.sorted_oth[:, None], plan.sorted_seg[:, None])
    subtiles, grid_spec = _pair_grid(
        plan, subtiles, 2, id_specs + ["edge"] + ["tab"] * 9,
        ["tab"] * 3 + ["tab"] * 3)
    dt = h.dtype
    outs = pl.pallas_call(
        functools.partial(_iter_pair_bwd_kernel, w_oth=plan.w_oth,
                          w_seg=plan.w_seg, tile_e=t, subtiles=subtiles,
                          precision=_precision_for(dt),
                          prebuilt=plan.prebuilt),
        grid_spec=grid_spec,
        compiler_params=_VMEM_LIMIT,
        out_shape=[
            jax.ShapeDtypeStruct((plan.table_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((plan.table_rows, hdim), jnp.float32),
            jax.ShapeDtypeStruct((plan.table_rows, hdim), jnp.float32),
            jax.ShapeDtypeStruct((8, hdim), jnp.float32),
            jax.ShapeDtypeStruct((8, hdim), jnp.float32),
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * e * (plan.w_oth + plan.w_seg) * (d + hdim),
            bytes_accessed=(9 * plan.table_rows * d + 4 * e) * 4,
            transcendentals=2 * e * hdim,
        ),
    )(plan.oth_win_off, plan.seg_win_off, *id_ops, em_sorted[:, None],
      _pad_table(pa, plan), _pad_table(pb, plan), _pad_table(h, plan),
      w2[:, None], w2[None, :], b1[None, :], b2.reshape(1, 1),
      _pad_table(g_mi.astype(dt), plan), _pad_table(g_mo.astype(dt), plan))
    dh_tab, dpa_tab, dpb_tab, dw2_row, db1_row, db2_row = outs
    return (dh_tab[: plan.n_node], dpa_tab[: plan.n_node],
            dpb_tab[: plan.n_node], dw2_row[0], db1_row[0], db2_row[0, 0])


@jax.custom_vjp
def iteration_pair(pa: jax.Array, pb: jax.Array, h: jax.Array,
                   em_sorted: jax.Array, w2: jax.Array, b1: jax.Array,
                   b2: jax.Array, plans: AggPlans):
    """Whole-iteration fusion: edge MLP scoring + sigmoid + both weighted
    aggregations in ONE kernel launch (see section comment above).

    ``pa``/``pb``: [V, H] endpoint projections (``h @ W1a`` / ``h @ W1b``
    with any pruning masks already applied); ``em_sorted``: [E] edge
    mask permuted into the recv plan's sorted order
    (:func:`sort_edge_weights`); ``w2``/``b1``/``b2``: second edge-MLP
    layer.  Returns (mi, mo) [V, D] in ``h.dtype``.
    """
    return _iter_pair_call(pa, pb, h, em_sorted, w2, b1, b2, plans.recv)


def _ip_fwd(pa, pb, h, em_sorted, w2, b1, b2, plans):
    out = iteration_pair(pa, pb, h, em_sorted, w2, b1, b2, plans)
    return out, (pa, pb, h, em_sorted, w2, b1, b2, plans)


def _ip_bwd(res, g):
    pa, pb, h, em_sorted, w2, b1, b2, plans = res
    g_mi, g_mo = g
    dh, dpa, dpb, dw2, db1, db2 = _iter_pair_bwd_call(
        pa, pb, h, em_sorted, w2, b1, b2, g_mi, g_mo, plans.recv)
    return (dpa.astype(pa.dtype), dpb.astype(pb.dtype), dh.astype(h.dtype),
            jnp.zeros_like(em_sorted), dw2.astype(w2.dtype),
            db1.astype(b1.dtype),
            jnp.reshape(db2, jnp.shape(b2)).astype(b2.dtype), None)


iteration_pair.defvjp(_ip_fwd, _ip_bwd)


def sort_edge_weights(w: jax.Array, plan: EdgePlan) -> jax.Array:
    """[E] edge weights/mask permuted into plan order (pad slots -> 0)."""
    return _sorted_w(w, plan)


def iteration_pair_reference(pa, pb, h, em, w2, b1, b2, senders,
                             receivers, n_node, activation=jnp.tanh):
    """jnp oracle of :func:`iteration_pair` (EDGE-order mask)."""
    pre = (jnp.take(pa, senders, axis=0)
           + jnp.take(pb, receivers, axis=0)) * em[:, None]
    z = activation(pre + b1)
    e_ = jax.nn.sigmoid(z @ w2.reshape(-1) + jnp.reshape(b2, ())) * em
    return aggregate_pair_reference(h, e_, senders, receivers, n_node)


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

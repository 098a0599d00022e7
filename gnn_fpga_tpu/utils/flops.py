"""Useful-FLOP accounting and MFU (model FLOP utilisation) for the bench.

"Useful" FLOPs are the *sparse-equivalent* work of the model — the edge
MLP, node MLP, input/output nets, and one multiply+add per edge per
aggregation direction — independent of the aggregation layout actually
executed.  The dense one-hot incidence path (`ops/dense_incidence.py`)
executes ~V/2 MXU FLOPs per useful gather/scatter FLOP (structural
zeros); the blocked path ~bn/2; the Pallas windowed kernels ~(W+T)/2.
Reporting edges/s alone hides that amplification: MFU = useful FLOPs /
chip peak is the number that says whether a path is *kernel-efficient*
rather than merely dispatch-amortised (VERDICT r3 missing #4).

Reference model: `/root/reference/gnn/model.py:127-156` — input MLP,
n_iters x (edge net `model.py:36-81` -> node net `model.py:84-125`),
final edge net.
"""

from __future__ import annotations


def segment_classifier_flops(
    n_node: float,
    n_edge: float,
    hidden_dim: int,
    n_iters: int,
    input_dim: int = 2,
) -> float:
    """Useful forward-pass FLOPs of one SegmentClassifier application.

    Counts 2 FLOPs per MAC in every MLP matmul and 4 FLOPs per edge per
    hidden dim for the two weighted aggregations (multiply by the edge
    weight + accumulate, both directions); gathers count as bytes, not
    FLOPs.  ``n_node``/``n_edge`` are REAL (mask-summed) counts.
    """
    v, e, h, d_in = float(n_node), float(n_edge), hidden_dim, input_dim
    d = h + d_in                      # shortcut-concat width [H, X]
    edge_mlp = 2 * e * h * (2 * d + 1)          # [E,2D]@[2D,h] + [E,h]@[h,1]
    node_mlp = 2 * v * h * (3 * d + h)          # [V,3D]@[3D,h] + [V,h]@[h,h]
    agg = 4 * e * d                             # w*msg + accumulate, 2 dirs
    input_mlp = 2 * v * d_in * h
    return input_mlp + n_iters * (edge_mlp + agg + node_mlp) + edge_mlp


def train_step_flops(fwd_flops: float) -> float:
    """Training-step useful FLOPs: fwd + bwd ~= 3x fwd (the standard
    2-backward-matmuls-per-forward-matmul estimate; optimizer update is
    negligible at <30k params)."""
    return 3.0 * fwd_flops


# Peak dense bf16 TFLOP/s per chip by jax device_kind.  Public numbers
# (cloud.google.com/tpu/docs/system-architecture-tpu-vm); used only to
# normalise MFU — unknown kinds report mfu = None rather than guess.
_PEAK_BF16_TFLOPS = {
    "TPU v2": 46,
    "TPU v3": 123,
    "TPU v4": 275,
    "TPU v5 lite": 197,
    "TPU v5e": 197,
    "TPU v5": 459,
    "TPU v5p": 459,
    "TPU v6 lite": 918,
    "TPU v6e": 918,
}


def chip_peak_tflops(device=None) -> float | None:
    """Peak dense bf16 TFLOP/s of ``device`` (default: first jax device)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAK_BF16_TFLOPS.items():
        if kind.startswith(name):
            return float(peak)
    return None


def mfu(useful_flops_per_s: float, device=None) -> float | None:
    """Fraction of chip peak the useful FLOP rate represents."""
    peak = chip_peak_tflops(device)
    if peak is None:
        return None
    return useful_flops_per_s / (peak * 1e12)

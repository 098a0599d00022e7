"""Iterative magnitude pruning for FPGA-sized models.

The reference's compression workflow
(`/root/reference/gnn/MPNN_Seg_ACTS_maskedlinear.ipynb:cell21-24`):
threshold trained weights at magnitude tau -> binary masks -> rebuild the
model with ``MaskedLinear`` layers (`model_maskedlinear.py:16-44`) ->
transplant ``W * mask`` (`estimator_maskedlinear.py:81-101`) -> retrain
with an L1 penalty -> next round.

Here masks are just pytrees mirroring the weight matrices:
``masks[module][layer]`` is a 0/1 array of the same shape as
``params[module][layer]['w']`` (or None for unmasked layers).  Models apply
``w * mask`` inside the matmul, so masked weights receive zero gradient and
stay zero — no layer subclassing, no deepcopy transplant gymnastics.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Any
Masks = Any


def magnitude_masks(
    params: Params,
    threshold: float,
    modules: Iterable[str] = ("edge", "node"),
) -> Masks:
    """Binary masks ``|W| > threshold`` for each weight matrix of the given
    sub-networks (`MPNN_Seg_ACTS_maskedlinear.ipynb:cell21`)."""
    masks: Dict[str, Dict[str, jnp.ndarray]] = {}
    for mod in modules:
        if mod not in params:
            continue
        masks[mod] = {}
        for name, layer in params[mod].items():
            if isinstance(layer, dict) and "w" in layer:
                masks[mod][name] = (jnp.abs(layer["w"]) > threshold).astype(
                    layer["w"].dtype)
    return masks


def apply_masks_to_params(params: Params, masks: Optional[Masks]) -> Params:
    """Zero out masked weights: the ``set_mask`` / ``load_weights``
    transplant step (`model_maskedlinear.py:19-30`,
    `estimator_maskedlinear.py:91`) as one pytree map."""
    if masks is None:
        return params
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    for mod, layer_masks in masks.items():
        for name, m in layer_masks.items():
            if m is not None:
                out[mod][name] = dict(out[mod][name])
                out[mod][name]["w"] = params[mod][name]["w"] * m
    return out


def mask_summary(masks: Masks) -> Dict[str, str]:
    """Per-layer 'nonzero/total' counts — the cardinalities the reference
    records (e.g. Edge-L1 86/112; `MPNN_Seg_ACTS_maskedlinear.ipynb:cell21`
    output)."""
    out = {}
    for mod, layer_masks in masks.items():
        for name, m in layer_masks.items():
            m = np.asarray(m)
            out[f"{mod}.{name}"] = f"{int(m.sum())}/{m.size}"
    return out


def sparsity(masks: Masks) -> float:
    """Fraction of pruned weights across all masked layers."""
    total = nz = 0
    for layer_masks in masks.values():
        for m in layer_masks.values():
            m = np.asarray(m)
            total += m.size
            nz += int(m.sum())
    return 1.0 - nz / max(total, 1)


def prune_round(
    params: Params,
    threshold: float,
    modules: Iterable[str] = ("edge", "node"),
):
    """One pruning round: derive masks at ``threshold`` and return
    (masked_params, masks) ready for masked retraining
    (`MPNN_Seg_ACTS_maskedlinear.ipynb:cell21-24`)."""
    masks = magnitude_masks(params, threshold, modules)
    return apply_masks_to_params(params, masks), masks

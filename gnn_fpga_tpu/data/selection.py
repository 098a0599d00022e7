"""Hit selection & feature engineering for TrackML-format events (L1).

Re-implements `/root/reference/gnn/prepareGraphs.py:53-106` (barrel layer
re-enumeration, pt cut, perfect-track filter, duplicate-hit removal,
phi-sector splitting) with vectorised pandas — no per-group Python
filters on the hot path.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

# Barrel (volume_id, layer_id) pairs -> convenient layer number [0-9]
# (`prepareGraphs.py:55-57`).
BARREL_VLIDS: Tuple[Tuple[int, int], ...] = (
    (8, 2), (8, 4), (8, 6), (8, 8),
    (13, 2), (13, 4), (13, 6), (13, 8),
    (17, 2), (17, 4),
)


def select_hits(
    hits: pd.DataFrame,
    truth: pd.DataFrame,
    particles: pd.DataFrame,
    pt_min: float = 0.0,
    no_missing_hits: bool = False,
    vlids: Sequence[Tuple[int, int]] = BARREL_VLIDS,
) -> pd.DataFrame:
    """Barrel selection + truth matching (`prepareGraphs.py:53-85`).

    - keep hits on the barrel (volume_id, layer_id) pairs, assign layer 0-9;
    - keep particles with pt > pt_min (drops noise hits via inner join);
    - derive cylindrical r, phi;
    - optional perfect-track filter (tracks hitting all layers);
    - per (particle, layer) duplicate removal keeping the min-r hit.

    Returns columns [hit_id, z, layer, r, phi, particle_id].
    """
    n_det_layers = len(vlids)
    vlid_to_layer = {v: i for i, v in enumerate(vlids)}
    key = list(zip(hits["volume_id"].to_numpy(), hits["layer_id"].to_numpy()))
    layer = np.array([vlid_to_layer.get(k, -1) for k in key], dtype=np.int32)
    hits = hits.assign(layer=layer)
    hits = hits[hits.layer >= 0]

    pt = np.sqrt(particles.px ** 2 + particles.py ** 2)
    particles = particles[pt > pt_min]
    truth = truth[["hit_id", "particle_id"]].merge(
        particles[["particle_id"]], on="particle_id")

    r = np.sqrt(hits.x ** 2 + hits.y ** 2)
    phi = np.arctan2(hits.y, hits.x)
    hits = (hits[["hit_id", "z", "layer"]]
            .assign(r=r, phi=phi)
            .merge(truth[["hit_id", "particle_id"]], on="hit_id"))

    if no_missing_hits:
        # Perfect-track filter, vectorised: count unique layers per particle.
        n_layers = hits.groupby("particle_id")["layer"].transform("nunique")
        hits = hits[n_layers == n_det_layers]

    # Duplicate removal: keep min-r hit per (particle, layer)
    # (`prepareGraphs.py:82-84`).
    hits = hits.loc[hits.groupby(["particle_id", "layer"]).r.idxmin().values]
    return hits


def split_phi_sectors(
    hits: pd.DataFrame,
    n_phi_sectors: int = 8,
    select_phi_sector: bool = False,
) -> List[pd.DataFrame]:
    """Split hits into phi sectors, re-centering each sector's phi on 0
    (`prepareGraphs.py:87-106`).  ``select_phi_sector`` keeps only the
    sector [0, width) as the reference's single-sector mode does."""
    width = 2 * np.pi / n_phi_sectors
    if select_phi_sector:
        edges = np.linspace(0, width, 2)
        n_phi_sectors = 1
    else:
        edges = np.linspace(-np.pi, np.pi, n_phi_sectors + 1)
    logging.info("Phi sectors: %s", edges)
    sectors = []
    for i in range(n_phi_sectors):
        lo, hi = edges[i], edges[i + 1]
        sel = hits[(hits.phi > lo) & (hits.phi < hi)]
        sectors.append(sel.assign(phi=sel.phi - lo - width / 2, phi_sector=i))
    return sectors


def hits_summary(hits: pd.DataFrame, event_key: str = "evtid",
                 particle_key: str = "particle_id") -> dict:
    """Summary statistics (`prepareGraphs.py:108-116`)."""
    n_events = hits[event_key].nunique()
    n_hits = len(hits)
    n_particles = hits[[event_key, particle_key]].drop_duplicates().shape[0]
    return {
        "n_events": n_events,
        "n_hits": n_hits,
        "n_particles": n_particles,
        "particles_per_event": n_particles / max(n_events, 1),
        "hits_per_event": n_hits / max(n_events, 1),
    }

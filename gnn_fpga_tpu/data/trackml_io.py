"""TrackML event loading with a CSV fallback.

The reference uses the external ``trackml`` library
(`/root/reference/gnn/prepareGraphs.py:20,140-141`
``dataset.load_event(prefix, parts=['hits','particles','truth'])``).  That
library may be absent; the TrackML on-disk format is three CSVs per event
(``<prefix>-hits.csv``, ``<prefix>-particles.csv``, ``<prefix>-truth.csv``),
which we read directly with pandas when it is.
"""

from __future__ import annotations

import glob
import os
import re
from typing import List, Tuple

import pandas as pd

try:  # pragma: no cover - environment-dependent
    from trackml import dataset as _trackml_dataset
except ImportError:
    _trackml_dataset = None


def load_event(prefix: str) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """(hits, particles, truth) for one event prefix."""
    if _trackml_dataset is not None:
        return _trackml_dataset.load_event(
            prefix, parts=["hits", "particles", "truth"])
    frames = []
    for part in ("hits", "particles", "truth"):
        path = f"{prefix}-{part}.csv"
        if not os.path.exists(path):
            path_gz = path + ".gz"
            if os.path.exists(path_gz):
                path = path_gz
            else:
                raise FileNotFoundError(
                    f"{path} not found and trackml library unavailable")
        frames.append(pd.read_csv(path))
    return tuple(frames)


def find_event_prefixes(input_dir: str, n_files: int | None = None) -> List[str]:
    """Sorted event prefixes in a TrackML directory
    (`prepareGraphs.py:188-192` lists ``event*-hits.csv*``)."""
    paths = sorted(glob.glob(os.path.join(input_dir, "event*-hits.csv*")))
    prefixes = [re.sub(r"-hits\.csv(\.gz)?$", "", p) for p in paths]
    if n_files is not None:
        prefixes = prefixes[:n_files]
    return prefixes


def event_id_from_prefix(prefix: str) -> int:
    """TrackML prefixes end in a 9-digit event id (`prepareGraphs.py:138`)."""
    m = re.search(r"(\d+)$", os.path.basename(prefix))
    return int(m.group(1)) if m else -1

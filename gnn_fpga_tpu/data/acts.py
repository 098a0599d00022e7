"""ACTS event-file ingestion (L0/L1).

Host-side parsing of the ACTS python-literal event format, re-implementing
`/root/reference/gnn/acts.py`: files hold one python-list literal per line,
events separated by blank lines.  Derived quantities and barrel selection
match `acts.py:46-62,115-151`; the per-line ``ast.literal_eval`` parse is
kept (it is the file format), but the column extraction is vectorised.
"""

from __future__ import annotations

import ast
import multiprocessing as mp
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

HITS_COLUMNS = ["hitid", "barcode", "volid", "layid", "lpos",
                "lerr", "gpos", "chans", "dir", "direrr"]
PARTICLES_COLUMNS = ["barcode", "vpos", "kin", "q"]

# Barrel volume ids -> 10 re-enumerated layers (`acts.py:118,125-127`).
BARREL_VOLIDS = (8, 13, 17)


def load_data_events(file_name: str, columns: Sequence[str],
                     start_evtid: int = 0) -> pd.DataFrame:
    """Parse an ACTS event file into one DataFrame with an ``evtid`` column.

    Events are detected by blank-line separators (`acts.py:14-44`); lines
    starting with '#' are comments.  Asserts no trailing partial event.
    """
    dfs = []
    event_lines: List = []
    with open(file_name) as f:
        for line in f:
            if line.strip() and line[0] != "#":
                event_lines.append(ast.literal_eval(line))
            elif event_lines:
                df = pd.DataFrame(event_lines)
                df.columns = list(columns)
                df["evtid"] = len(dfs) + start_evtid
                dfs.append(df)
                event_lines = []
    if event_lines:
        # Final event not followed by a blank line — keep it (the reference
        # asserts instead, acts.py:41; accepting it loses nothing).
        df = pd.DataFrame(event_lines)
        df.columns = list(columns)
        df["evtid"] = len(dfs) + start_evtid
        dfs.append(df)
    return pd.concat(dfs, ignore_index=True)


def process_hits_data(df: pd.DataFrame,
                      copy_keys=("evtid", "barcode", "volid", "layid")) -> pd.DataFrame:
    """Unpack global positions and derive cylindrical r, phi, z
    (`acts.py:46-53`), vectorised via np.stack of the gpos lists."""
    gpos = np.stack(df["gpos"].to_numpy())
    x, y, z = (gpos[:, 0].astype(np.float32), gpos[:, 1].astype(np.float32),
               gpos[:, 2].astype(np.float32))
    r = np.sqrt(x ** 2 + y ** 2)
    phi = np.arctan2(y, x)
    return df[list(copy_keys)].assign(z=z, r=r, phi=phi)


def process_particles_data(df: pd.DataFrame,
                           copy_keys=("evtid", "barcode", "q")) -> pd.DataFrame:
    """Unpack kinematics into pt, eta, phi (`acts.py:55-62`)."""
    kin = np.stack(df["kin"].to_numpy())
    p, theta, phi = (kin[:, 0].astype(np.float32),
                     kin[:, 1].astype(np.float32),
                     kin[:, 2].astype(np.float32))
    pt = p * np.sin(theta)
    eta = -np.log(np.tan(theta / 2.0))
    return df[list(copy_keys)].assign(pt=pt, eta=eta, phi=phi)


def read_hits_worker(hits_file: str) -> pd.DataFrame:
    return process_hits_data(load_data_events(hits_file, HITS_COLUMNS))


def read_particles_worker(particles_file: str) -> pd.DataFrame:
    return process_particles_data(
        load_data_events(particles_file, PARTICLES_COLUMNS))


def _fix_consecutive_evtids(frames: List[pd.DataFrame]) -> List[pd.DataFrame]:
    """Offset evtids so they are globally consecutive (`acts.py:95-99`)."""
    for i in range(1, len(frames)):
        frames[i]["evtid"] += frames[i - 1]["evtid"].iloc[-1] + 1
    return frames


def process_hits_files(hits_files: Sequence[str], pool: mp.Pool) -> List[pd.DataFrame]:
    return _fix_consecutive_evtids(pool.map(read_hits_worker, list(hits_files)))


def process_particles_files(particles_files: Sequence[str], pool: mp.Pool) -> List[pd.DataFrame]:
    return _fix_consecutive_evtids(
        pool.map(read_particles_worker, list(particles_files)))


def process_files(hits_files, particles_files, pool):
    """Parallel host ingestion of paired hits/particles files
    (`acts.py:109-113`)."""
    return (process_hits_files(hits_files, pool),
            process_particles_files(particles_files, pool))


def select_barrel_hits(hits: pd.DataFrame) -> pd.DataFrame:
    """Barrel volumes {8,13,17} re-enumerated to layers 0-9
    (`acts.py:115-128`): layer = layid/2 - 1 + volume*4."""
    hits = hits[hits["volid"].isin(BARREL_VOLIDS)]
    volume = hits["volid"].map({v: i for i, v in enumerate(BARREL_VOLIDS)})
    layer = (hits["layid"] // 2 - 1 + volume * 4).astype(np.int8)
    return (hits[["evtid", "barcode", "r", "phi", "z"]]
            .assign(volume=volume.astype(np.int8), layer=layer))


def select_hits(hits: pd.DataFrame, n_det_layers: int = 10) -> pd.DataFrame:
    """Barrel selection + perfect-track filter + min-r dedup
    (`acts.py:130-151`)."""
    hits = select_barrel_hits(hits)
    n_layers = hits.groupby(["evtid", "barcode"])["layer"].transform("nunique")
    hits = hits[n_layers == n_det_layers]
    return hits.loc[
        hits.groupby(["evtid", "barcode", "layer"]).r.idxmin().values]


def bin_barrel_hits(hits: pd.DataFrame, evtids: Optional[np.ndarray],
                    vols: Sequence[int], bins, ranges) -> List[np.ndarray]:
    """Per-volume (layer, phi, z) occupancy histograms (`acts.py:153-177`)."""
    groups = hits.groupby("evtid")
    if evtids is None:
        evtids = hits["evtid"].drop_duplicates().values
    hists = [np.zeros([len(evtids)] + list(bins[iv]), dtype=np.uint16)
             for iv in range(len(vols))]
    for i, evtid in enumerate(evtids):
        evt_hits = groups.get_group(evtid)
        for iv, vol in enumerate(vols):
            vh = evt_hits[evt_hits["volume"] == vol]
            hists[iv][i] = np.histogramdd(
                (vh["layer"].values, vh["phi"].values, vh["z"].values),
                bins=bins[iv], range=ranges[iv])[0]
    return hists


def data_consistent(hits: pd.DataFrame, particles: pd.DataFrame) -> bool:
    """Every hit's (evtid, barcode) must appear in particles
    (`acts.py:179-186`)."""
    keys = ["evtid", "barcode"]
    matches = particles[keys].merge(hits[keys], on=keys)
    return matches.shape[0] == hits.shape[0]


def check_data_consistency(hits: List[pd.DataFrame],
                           particles: List[pd.DataFrame]):
    """Drop file pairs whose hits/particles don't join cleanly
    (`acts.py:188-195`)."""
    pairs = [(h, p) for h, p in zip(hits, particles) if data_consistent(h, p)]
    return [hp[0] for hp in pairs], [hp[1] for hp in pairs]

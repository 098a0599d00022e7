"""Checkpoint / resume with best-model retention.

Mirrors the reference Estimator's checkpoint subsystem
(`/root/reference/gnn/estimator.py:62-78,124-135`): every epoch saves
``{epoch, params, opt_state, best_valid_loss, train_losses, valid_losses}``
and copies to ``model_best`` when validation improves; loading restores the
optimizer state and loss histories so ``fit`` resumes epoch numbering from
``len(train_losses)`` (`estimator.py:84-85`).

Implemented on Orbax (async-capable, multi-host-safe) with a thin wrapper
so callers never touch Orbax APIs directly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


_LATEST = "checkpoint"
_BEST = "model_best"


def _to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


class CheckpointManager:
    """Save/restore train state under a directory, keeping latest + best."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if _HAVE_ORBAX:
            self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: Dict[str, Any], is_best: bool = False) -> None:
        """``state`` is any pytree dict (params, opt_state, epoch, losses)."""
        state = _to_numpy(state)
        self._save_one(state, _LATEST)
        if is_best:
            self._save_one(state, _BEST)

    def _save_one(self, state, name):
        path = self._path(name)
        if _HAVE_ORBAX:
            tmp = path + ".tmp"
            if os.path.exists(tmp):
                import shutil
                shutil.rmtree(tmp)
            self._ckptr.save(tmp, state, force=True)
            self._ckptr.wait_until_finished()
            if os.path.exists(path):
                import shutil
                shutil.rmtree(path)
            os.replace(tmp, path)
        else:  # flat-npz fallback
            flat, treedef = jax.tree.flatten(state)
            np.savez(path + ".npz", treedef=np.frombuffer(
                repr(treedef).encode(), dtype=np.uint8), *flat)

    def restore(self, template: Dict[str, Any], best: bool = False) -> Optional[Dict[str, Any]]:
        """Restore into the structure of ``template``; None if absent."""
        path = self._path(_BEST if best else _LATEST)
        if not os.path.exists(path):
            return None
        if _HAVE_ORBAX:
            return self._ckptr.restore(path, _to_numpy(template))
        raise RuntimeError("orbax unavailable and no npz fallback reader")

    def exists(self, best: bool = False) -> bool:
        return os.path.exists(self._path(_BEST if best else _LATEST))

"""Tracing / profiling / debug observability.

The reference's only timing is wall-clock prints around epochs
(`/root/reference/gnn/estimator.py:92,105-109`) and ``%%time`` cell magics
(SURVEY.md §5).  Here:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution;
- :class:`StepTimer` — per-step wall times with warmup discard and
  edges/s/chip throughput (the BASELINE metric);
- :func:`nan_check` — debug-mode finite-ness assertion over a pytree (the
  moral equivalent of anomaly detection; JAX's functional purity is the
  race detector).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile device execution into ``log_dir`` (TensorBoard 'JAX' plugin
    or Perfetto).  Usage::

        with profiling.trace("/tmp/trace"):
            step(params, opt_state, batch)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup discard + throughput.

    >>> timer = StepTimer(warmup=2)
    >>> for batch in batches:
    ...     with timer.step(n_edges=batch.n_edge):
    ...         loss = train_step(...)
    >>> timer.summary()
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self.edges: List[int] = []

    @contextlib.contextmanager
    def step(self, n_edges: int = 0):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        self.edges.append(n_edges)

    def summary(self) -> Dict[str, float]:
        times = np.asarray(self.times[self.warmup:] or self.times)
        edges = np.asarray(self.edges[self.warmup:] or self.edges)
        out = {
            "steps": int(len(times)),
            "mean_s": float(times.mean()) if len(times) else 0.0,
            "p50_s": float(np.median(times)) if len(times) else 0.0,
            "p95_s": float(np.percentile(times, 95)) if len(times) else 0.0,
        }
        if edges.sum() > 0 and times.sum() > 0:
            out["edges_per_s"] = float(edges.sum() / times.sum())
        return out


def nan_check(tree, name: str = "tree") -> None:
    """Raise if any leaf contains non-finite values (debug mode; the
    counterpart of torch anomaly detection — SURVEY.md §5 'race detection
    / sanitizers')."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            n_bad = int((~np.isfinite(a)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {n_bad} non-finite "
                f"values (shape {a.shape})")


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax debug_nans (device-side NaN detection)."""
    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

"""Tests for profiling/observability utilities."""

import numpy as np
import pytest

from gnn_fpga_tpu.utils import profiling


def test_step_timer_throughput():
    timer = profiling.StepTimer(warmup=1)
    for _ in range(4):
        with timer.step(n_edges=1000):
            pass
    s = timer.summary()
    assert s["steps"] == 3
    assert s["edges_per_s"] > 0


def test_nan_check_raises():
    good = {"a": np.ones(3), "b": {"c": np.zeros(2)}}
    profiling.nan_check(good)
    bad = {"a": np.array([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        profiling.nan_check(bad, "params")


def test_nan_check_ignores_ints():
    profiling.nan_check({"idx": np.array([1, 2, 3])})

"""Scaling-efficiency harness mechanics on the 8-device CPU mesh
(BASELINE.md:25 anchor; real efficiency numbers need real chips)."""

import bench_scaling


def test_dp_mode_reports_all_device_counts():
    res = bench_scaling.run_mode("dp", [1, 2], n_steps=2, hidden=8,
                                 n_iters=2, n_tracks=4, batch=2)
    assert set(res) == {1, 2}
    for v in res.values():
        assert v["edges_per_s"] > 0


def test_partitioned_mode_reports_all_device_counts():
    res = bench_scaling.run_mode("partitioned", [1, 4], n_steps=2, hidden=8,
                                 n_iters=2, n_tracks=4, batch=2)
    assert set(res) == {1, 4}
    for v in res.values():
        assert v["edges_per_s"] > 0

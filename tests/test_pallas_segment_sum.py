"""Pallas sorted-CSR segment-sum: correctness vs the jnp oracle (interpret
mode on CPU; the same code path compiles for TPU), including gradient
checks through the custom VJP and adversarial degree distributions
(SURVEY.md §7 hard part c)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from gnn_fpga_tpu.ops.pallas import segment_sum as pss


def _run(messages, ids, n_node, tile_e=8):
    seg = pss.build_sorted_segments(ids, n_node)
    sorted_messages = jnp.asarray(messages)[seg.order]
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(pss.sorted_segment_sum(
            sorted_messages, seg, n_node, tile_e))


def _oracle(messages, ids, n_node):
    return np.asarray(pss.segment_sum_reference(
        jnp.asarray(messages), jnp.asarray(ids), n_node))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_ids_match_oracle(seed):
    rng = np.random.default_rng(seed)
    e, d, n = 64, 16, 24
    messages = rng.normal(size=(e, d)).astype(np.float32)
    ids = rng.integers(0, n, e).astype(np.int32)
    np.testing.assert_allclose(_run(messages, ids, n),
                               _oracle(messages, ids, n), rtol=1e-5)


def test_degree_gaps_and_hot_nodes():
    """Sorted tiles spanning huge id gaps and single ids spanning many
    tiles — the cases the rank compaction exists for."""
    rng = np.random.default_rng(3)
    e, d, n = 64, 8, 1000
    # half the edges on node 7, rest on {0, 999}
    ids = np.concatenate([np.full(32, 7), np.full(16, 0), np.full(16, 999)])
    messages = rng.normal(size=(e, d)).astype(np.float32)
    np.testing.assert_allclose(_run(messages, ids.astype(np.int32), n),
                               _oracle(messages, ids, n), rtol=1e-5)


def test_padding_ids_dropped():
    """ids == n_node are padding and contribute nothing."""
    rng = np.random.default_rng(4)
    e, d, n = 32, 8, 10
    ids = np.concatenate([np.arange(10), np.full(22, n)]).astype(np.int32)
    messages = rng.normal(size=(e, d)).astype(np.float32)
    out = _run(messages, ids, n)
    expect = _oracle(messages[:10], ids[:10], n)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_all_one_segment():
    rng = np.random.default_rng(5)
    messages = rng.normal(size=(16, 8)).astype(np.float32)
    ids = np.zeros(16, np.int32)
    out = _run(messages, ids, 4)
    np.testing.assert_allclose(out[0], messages.sum(0), rtol=1e-5)
    np.testing.assert_allclose(out[1:], 0.0)


def test_gradient_matches_oracle():
    rng = np.random.default_rng(6)
    e, d, n = 32, 8, 12
    messages = rng.normal(size=(e, d)).astype(np.float32)
    ids = rng.integers(0, n, e).astype(np.int32)
    seg = pss.build_sorted_segments(ids, n)
    w = rng.normal(size=(n, d)).astype(np.float32)

    def loss_pallas(m):
        with pltpu.force_tpu_interpret_mode():
            out = pss.sorted_segment_sum(m[seg.order], seg, n, 8)
        return jnp.sum(out * w)

    def loss_oracle(m):
        return jnp.sum(pss.segment_sum_reference(m, jnp.asarray(ids), n) * w)

    g1 = np.asarray(jax.grad(loss_pallas)(jnp.asarray(messages)))
    g2 = np.asarray(jax.grad(loss_oracle)(jnp.asarray(messages)))
    np.testing.assert_allclose(g1, g2, rtol=1e-5)


def test_pad_edges_helper():
    assert pss.pad_edges_to_tile(1, 512) == 512
    assert pss.pad_edges_to_tile(512, 512) == 512
    assert pss.pad_edges_to_tile(513, 512) == 1024

"""Graph-partition tests on the 8-device virtual CPU mesh: the partitioned
forward must reproduce the single-device forward exactly (the correctness
bar for SURVEY.md §7 hard part b), and the sharded train step must learn."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gnn_fpga_tpu.core import graph as G
from gnn_fpga_tpu.data import toy2d
from gnn_fpga_tpu.models import mpnn
from gnn_fpga_tpu.parallel import mesh as mesh_lib
from gnn_fpga_tpu.parallel import partition


def _one_big_graph(n_layers=8, n_tracks=6, seed=0):
    cfg = toy2d.Toy2DConfig(n_layers=n_layers, n_tracks=n_tracks, seed=seed)
    batched = toy2d.make_segment_graphs(cfg, 1)
    return jax.tree.map(lambda a: a[0], batched)


def test_partition_graph_preserves_edges():
    g = _one_big_graph()
    pg = partition.partition_graph(g, 4)
    assert pg.n_parts == 4
    # every real edge appears exactly once across shards with matching
    # (sender, global receiver, label)
    orig = set()
    s, r, y = (np.asarray(g.senders), np.asarray(g.receivers),
               np.asarray(g.y))
    for i in range(len(s)):
        orig.add((int(s[i]), int(r[i]), float(y[i])))
    seen = []
    n_local = pg.n_local
    for p in range(4):
        em = np.asarray(pg.edge_mask[p]) > 0
        gs = np.asarray(pg.senders[p])[em]
        gr = np.asarray(pg.receivers[p])[em] + p * n_local
        gy = np.asarray(pg.y[p])[em]
        # receiver ownership
        assert ((np.asarray(pg.receivers[p])[em] >= 0)
                & (np.asarray(pg.receivers[p])[em] < n_local)).all()
        for i in range(len(gs)):
            seen.append((int(gs[i]), int(gr[i]), float(gy[i])))
    assert len(seen) == len(orig)
    assert set(seen) == orig
    # node features reassemble to the original (padded) features
    x_cat = np.concatenate([np.asarray(pg.x[p]) for p in range(4)])
    np.testing.assert_array_equal(x_cat[: g.n_node], np.asarray(g.x))


@pytest.mark.parametrize("n_parts", [2, 8])
def test_sharded_forward_matches_single_device(n_parts):
    g = _one_big_graph()
    mcfg = mpnn.SegmentClassifierConfig(input_dim=2, hidden_dim=8, n_iters=3)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)

    ref_logits = np.asarray(mpnn.segment_classifier_logits(params, g, mcfg))

    mesh = mesh_lib.make_mesh((n_parts,), (mesh_lib.GRAPH_AXIS,),
                              devices=jax.devices()[:n_parts])
    pg = jax.tree.map(jnp.asarray, partition.partition_graph(g, n_parts))
    fwd = partition.make_sharded_forward(mesh, mcfg)
    sharded = np.asarray(fwd(params, pg))   # [P, E_local]

    # compare edge-by-edge via the (sender, global receiver) key
    ref = {}
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    for i in range(len(s)):
        ref[(int(s[i]), int(r[i]))] = ref_logits[i]
    n_local = pg.n_local
    n_checked = 0
    for p in range(n_parts):
        em = np.asarray(pg.edge_mask[p]) > 0
        gs = np.asarray(pg.senders[p])[em]
        gr = np.asarray(pg.receivers[p])[em] + p * n_local
        vals = sharded[p][em]
        for i in range(len(gs)):
            np.testing.assert_allclose(
                vals[i], ref[(int(gs[i]), int(gr[i]))], rtol=1e-4, atol=1e-5)
            n_checked += 1
    assert n_checked == len(s)


def test_sharded_train_step_learns():
    g = _one_big_graph(n_layers=6, n_tracks=3, seed=1)
    mcfg = mpnn.SegmentClassifierConfig(input_dim=2, hidden_dim=8, n_iters=2)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(1), mcfg)
    mesh = mesh_lib.make_mesh((8,), (mesh_lib.GRAPH_AXIS,))
    pg = jax.tree.map(jnp.asarray, partition.partition_graph(g, 8))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = partition.make_sharded_train_step(optimizer, mesh, mcfg)
    losses = []
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state, pg)
        losses.append(float(loss))
    # single graph is memorizable: loss must break below the base-rate
    # plateau (~0.64 at 1/3 positives)
    assert losses[-1] < losses[0] * 0.75, losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()


def test_sharded_loss_matches_single_device():
    """The sharded masked-BCE loss equals the single-device loss."""
    import optax as _optax
    g = _one_big_graph(n_layers=5, n_tracks=4, seed=2)
    mcfg = mpnn.SegmentClassifierConfig(input_dim=2, hidden_dim=8, n_iters=2)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(2), mcfg)
    logits = mpnn.segment_classifier_logits(params, g, mcfg)
    ref_loss = float(_optax.sigmoid_binary_cross_entropy(
        logits, g.y).mean())

    mesh = mesh_lib.make_mesh((4,), (mesh_lib.GRAPH_AXIS,),
                              devices=jax.devices()[:4])
    pg = jax.tree.map(jnp.asarray, partition.partition_graph(g, 4))
    optimizer = optax.adam(1e-3)
    step = partition.make_sharded_train_step(optimizer, mesh, mcfg)
    _, _, loss = step(params, optimizer.init(params), pg)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)


@pytest.mark.parametrize("n_parts", [2, 4])
def test_sharded_forward_with_pallas_plans_matches_single_device(n_parts):
    """Pallas kernels composed with graph partitioning (SURVEY §7 step 7):
    per-shard fused aggregation over the local+halo extended table must
    reproduce the single-device forward exactly (interpret mode on the
    CPU mesh; the same code compiles for TPU)."""
    from jax.experimental.pallas import tpu as pltpu

    g = _one_big_graph()
    mcfg = mpnn.SegmentClassifierConfig(input_dim=2, hidden_dim=8, n_iters=3)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    ref_logits = np.asarray(mpnn.segment_classifier_logits(params, g, mcfg))

    mesh = mesh_lib.make_mesh((n_parts,), (mesh_lib.GRAPH_AXIS,),
                              devices=jax.devices()[:n_parts])
    pg = jax.tree.map(jnp.asarray,
                      partition.partition_graph(g, n_parts, plans=True,
                                                tile_e=32))
    assert pg.plans is not None
    assert pg.edge_mask.shape[1] % 32 == 0
    fwd = partition.make_sharded_forward(mesh, mcfg)
    with pltpu.force_tpu_interpret_mode():
        sharded = np.asarray(fwd(params, pg))

    ref = {}
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    for i in range(len(s)):
        ref[(int(s[i]), int(r[i]))] = ref_logits[i]
    n_local = pg.n_local
    n_checked = 0
    for p in range(n_parts):
        em = np.asarray(pg.edge_mask[p]) > 0
        gs = np.asarray(pg.senders[p])[em]
        gr = np.asarray(pg.receivers[p])[em] + p * n_local
        vals = sharded[p][em]
        for i in range(len(gs)):
            np.testing.assert_allclose(
                vals[i], ref[(int(gs[i]), int(gr[i]))], rtol=1e-4,
                atol=1e-5)
            n_checked += 1
    assert n_checked == len(s)


def test_sharded_train_step_with_plans_learns():
    """Grads flow through the composed pallas+halo path (custom VJPs
    inside shard_map) and the loss decreases."""
    from jax.experimental.pallas import tpu as pltpu

    g = _one_big_graph(n_layers=6, n_tracks=3, seed=1)
    mcfg = mpnn.SegmentClassifierConfig(input_dim=2, hidden_dim=8, n_iters=2)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(1), mcfg)
    mesh = mesh_lib.make_mesh((2,), (mesh_lib.GRAPH_AXIS,),
                              devices=jax.devices()[:2])
    pg = jax.tree.map(jnp.asarray,
                      partition.partition_graph(g, 2, plans=True,
                                                tile_e=32))
    optimizer = optax.adam(1e-2)
    step = partition.make_sharded_train_step(optimizer, mesh, mcfg)
    opt_state = optimizer.init(params)
    losses = []
    with pltpu.force_tpu_interpret_mode():
        for _ in range(150):
            params, opt_state, loss = step(params, opt_state, pg)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.75, losses[:3] + losses[-3:]


def test_sharded_fused_iteration_matches_unfused_grads():
    """Fused vs unfused sharded paths: logits AND parameter gradients
    must agree (the fused path restructures the halo exchange for
    overlap — pb built from local rows only, zero-padded halo — which
    must be gradient-exact, ADVICE r4)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    g = _one_big_graph(n_layers=6, n_tracks=4, seed=3)
    cfg_f = mpnn.SegmentClassifierConfig(input_dim=2, hidden_dim=8,
                                         n_iters=2, fused_iteration=True)
    cfg_u = dataclasses.replace(cfg_f, fused_iteration=False)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(3), cfg_f)
    mesh = mesh_lib.make_mesh((2,), (mesh_lib.GRAPH_AXIS,),
                              devices=jax.devices()[:2])
    pg = jax.tree.map(jnp.asarray,
                      partition.partition_graph(g, 2, plans=True,
                                                tile_e=32))
    outs = {}
    with pltpu.force_tpu_interpret_mode():
        for name, cfg in (("fused", cfg_f), ("unfused", cfg_u)):
            fwd = partition.make_sharded_forward(mesh, cfg)
            logits = np.asarray(fwd(params, pg))
            optimizer = optax.adam(1e-3)
            step = partition.make_sharded_train_step(optimizer, mesh, cfg)

            # one step from identical state: grads agree iff params move
            # identically under the same optimizer
            new_params, _, loss = step(params, optimizer.init(params), pg)
            outs[name] = (logits, float(loss), new_params)

    np.testing.assert_allclose(outs["fused"][0], outs["unfused"][0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(outs["fused"][1], outs["unfused"][1],
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        outs["fused"][2], outs["unfused"][2])

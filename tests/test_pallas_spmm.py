"""Fused SpMM/SDDMM Pallas kernels: correctness vs jnp oracles (interpret
mode on CPU; the same code compiles for TPU), gradient checks through the
custom VJP, window auto-sizing, and adversarial structures (degree gaps,
hot nodes, padded edges — SURVEY.md §7 hard part c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from gnn_fpga_tpu.ops.pallas import spmm as sp


def _random_graph(seed, v, e, d, local=False):
    rng = np.random.default_rng(seed)
    if local:
        # banded graph: |send - recv| small (tracking-graph locality)
        senders = rng.integers(0, v - 8, size=e).astype(np.int32)
        receivers = (senders + rng.integers(1, 8, size=e)).astype(np.int32)
    else:
        senders = rng.integers(0, v, size=e).astype(np.int32)
        receivers = rng.integers(0, v, size=e).astype(np.int32)
    h = rng.normal(size=(v, d)).astype(np.float32)
    w = rng.normal(size=(e,)).astype(np.float32)
    return h, w, senders, receivers


@pytest.mark.parametrize("seed,v,e,d", [(0, 24, 64, 16), (1, 50, 128, 8),
                                        (2, 300, 256, 16)])
def test_aggregate_pair_matches_oracle(seed, v, e, d):
    h, w, s, r = _random_graph(seed, v, e, d)
    plans = sp.build_agg_plans(s, r, v, tile_e=32)
    with pltpu.force_tpu_interpret_mode():
        mi, mo = sp.aggregate_pair(jnp.asarray(h), jnp.asarray(w), plans)
    emi, emo = sp.aggregate_pair_reference(h, w, s, r, v)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(emi),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(emo),
                               rtol=1e-4, atol=1e-5)


def test_local_graph_uses_narrow_window():
    _, _, s, r = _random_graph(3, 4096, 512, 4, local=True)
    plans = sp.build_agg_plans(s, r, 4096, tile_e=64)
    # banded structure => window far below the table size
    assert plans.recv.w_oth <= 1024
    assert plans.recv.table_rows >= 4096


def test_degree_gaps_and_hot_nodes():
    rng = np.random.default_rng(4)
    v, e, d = 1000, 64, 8
    r = np.concatenate([np.full(32, 7), np.full(16, 0), np.full(16, 999)])
    s = rng.integers(0, v, size=e)
    h = rng.normal(size=(v, d)).astype(np.float32)
    w = rng.normal(size=(e,)).astype(np.float32)
    plans = sp.build_agg_plans(s.astype(np.int32), r.astype(np.int32), v,
                               tile_e=32)
    with pltpu.force_tpu_interpret_mode():
        mi, mo = sp.aggregate_pair(jnp.asarray(h), jnp.asarray(w), plans)
    emi, emo = sp.aggregate_pair_reference(h, w, s, r, v)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(emi), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(emo), rtol=1e-4,
                               atol=1e-5)


def test_masked_pad_edges_contribute_zero():
    h, w, s, r = _random_graph(5, 40, 64, 8)
    # last 16 edges are padding: weight zero (the model passes w*edge_mask)
    w[48:] = 0.0
    plans = sp.build_agg_plans(s, r, 40, tile_e=32)
    with pltpu.force_tpu_interpret_mode():
        mi, mo = sp.aggregate_pair(jnp.asarray(h), jnp.asarray(w), plans)
    emi, emo = sp.aggregate_pair_reference(
        h[:, :], w[:48], s[:48], r[:48], 40)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(emi), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(emo), rtol=1e-4,
                               atol=1e-5)


def test_sddmm_matches_oracle():
    rng = np.random.default_rng(6)
    v, e, d = 64, 128, 16
    a = rng.normal(size=(v, d)).astype(np.float32)
    b = rng.normal(size=(v, d)).astype(np.float32)
    s = rng.integers(0, v, size=e).astype(np.int32)
    r = rng.integers(0, v, size=e).astype(np.int32)
    plan = sp.build_edge_plan(r, s, v, tile_e=32)
    with pltpu.force_tpu_interpret_mode():
        out = sp.sddmm(jnp.asarray(a), jnp.asarray(b), plan)
    expect = sp.sddmm_reference(a, b, r, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_aggregate_pair_grads_match_oracle():
    h, w, s, r = _random_graph(7, 30, 64, 8)
    plans = sp.build_agg_plans(s, r, 30, tile_e=32)

    def loss_pallas(h, w):
        mi, mo = sp.aggregate_pair(h, w, plans)
        return jnp.sum(jnp.sin(mi) * 0.5 + mo ** 2)

    def loss_oracle(h, w):
        mi, mo = sp.aggregate_pair_reference(h, w, s, r, 30)
        return jnp.sum(jnp.sin(mi) * 0.5 + mo ** 2)

    with pltpu.force_tpu_interpret_mode():
        gh, gw = jax.grad(loss_pallas, argnums=(0, 1))(
            jnp.asarray(h), jnp.asarray(w))
    egh, egw = jax.grad(loss_oracle, argnums=(0, 1))(
        jnp.asarray(h), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(egh), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(egw), rtol=1e-4,
                               atol=1e-5)


def test_spmm_single_direction_grad():
    h, w, s, r = _random_graph(8, 30, 64, 8)
    plans = sp.build_agg_plans(s, r, 30, tile_e=32)

    def loss(h, w):
        out = sp.spmm(h, w, plans.recv, plans.send)
        return jnp.sum(out ** 2)

    def loss_ref(h, w):
        mi, _ = sp.aggregate_pair_reference(h, w, s, r, 30)
        return jnp.sum(mi ** 2)

    with pltpu.force_tpu_interpret_mode():
        gh, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(h),
                                                jnp.asarray(w))
    egh, egw = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(h),
                                                  jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(egh), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(egw), rtol=1e-4,
                               atol=1e-5)


def test_window_too_narrow_raises():
    _, _, s, r = _random_graph(9, 500, 64, 4)
    with pytest.raises(ValueError, match="window"):
        sp.build_edge_plan(r, s, 500, tile_e=32, window=128)


def test_plan_is_jit_static_compatible():
    """Plans ride through jit as pytrees; static fields key the cache."""
    h, w, s, r = _random_graph(10, 24, 64, 8)
    plans = sp.build_agg_plans(s, r, 24, tile_e=32)

    @jax.jit
    def f(h, w, plans):
        mi, mo = sp.aggregate_pair(h, w, plans)
        return mi.sum() + mo.sum()

    with pltpu.force_tpu_interpret_mode():
        out = f(jnp.asarray(h), jnp.asarray(w), plans)
    emi, emo = sp.aggregate_pair_reference(h, w, s, r, 24)
    np.testing.assert_allclose(float(out),
                               float(emi.sum() + emo.sum()), rtol=1e-4)


# ---------------------------------------------------------------------------
# Model integration: pallas aggregation path matches the sparse path
# ---------------------------------------------------------------------------

def _packed_graph(seed=0, v=60, e=128, f=3):
    from gnn_fpga_tpu.core import graph as G
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(v, f)).astype(np.float32)
    s = rng.integers(0, v, size=e).astype(np.int32)
    r = rng.integers(0, v, size=e).astype(np.int32)
    y = rng.integers(0, 2, size=e).astype(np.float32)
    g = G.from_coo(x, s, r, y)
    # mask the tail as padding
    em = np.ones(e, np.float32); em[-16:] = 0
    g = g.replace(edge_mask=em)
    return G.attach_plans(g, tile_e=32)


def test_segment_classifier_pallas_matches_sparse():
    from gnn_fpga_tpu.models import mpnn
    g = _packed_graph()
    cfg_s = mpnn.SegmentClassifierConfig(input_dim=3, hidden_dim=8,
                                         n_iters=2, aggregation="sparse")
    cfg_p = dataclasses_replace(cfg_s, aggregation="pallas")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), cfg_s)
    ls = mpnn.segment_classifier_logits(params, g, cfg_s)
    with pltpu.force_tpu_interpret_mode():
        lp = mpnn.segment_classifier_logits(params, g, cfg_p)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=1e-4, atol=1e-5)


def test_segment_classifier_pallas_grads_match_sparse():
    from gnn_fpga_tpu.models import mpnn
    g = _packed_graph(seed=1)
    cfg_s = mpnn.SegmentClassifierConfig(input_dim=3, hidden_dim=8,
                                         n_iters=2, aggregation="sparse")
    cfg_p = dataclasses_replace(cfg_s, aggregation="pallas")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(1), cfg_s)

    def loss(params, cfg):
        logits = mpnn.segment_classifier_logits(params, g, cfg)
        per = jnp.maximum(logits, 0) - logits * g.y + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return (per * g.edge_mask).sum() / g.edge_mask.sum()

    gs = jax.grad(loss)(params, cfg_s)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss)(params, cfg_p)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_node_classifier_pallas_matches_sparse():
    from gnn_fpga_tpu.models import mpnn
    g = _packed_graph(seed=2, f=4)
    cfg_s = mpnn.NodeClassifierConfig(input_dim=4, hidden_dim=8, n_iters=2,
                                      aggregation="sparse")
    cfg_p = dataclasses_replace(cfg_s, aggregation="pallas")
    params = mpnn.init_node_classifier(jax.random.PRNGKey(2), cfg_s)
    ls = mpnn.node_classifier_logits(params, g, cfg_s)
    with pltpu.force_tpu_interpret_mode():
        lp = mpnn.node_classifier_logits(params, g, cfg_p)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=1e-4, atol=1e-5)


def test_unshared_pallas_matches_sparse():
    from gnn_fpga_tpu.models import mpnn
    g = _packed_graph(seed=3)
    cfg_s = mpnn.SegmentClassifierConfig(input_dim=3, hidden_dim=8,
                                         n_iters=2, aggregation="sparse")
    cfg_p = dataclasses_replace(cfg_s, aggregation="pallas")
    params = mpnn.init_segment_classifier_unshared(jax.random.PRNGKey(3),
                                                   cfg_s)
    ls = mpnn.segment_classifier_unshared_logits(params, g, cfg_s)
    with pltpu.force_tpu_interpret_mode():
        lp = mpnn.segment_classifier_unshared_logits(params, g, cfg_p)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=1e-4, atol=1e-5)


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_sddmm_dual_matches_oracle():
    """Fused dual SDDMM == sum of two single SDDMMs (the dw of
    aggregate_pair in one kernel)."""
    rng = np.random.default_rng(17)
    v, e, d = 64, 128, 16
    p = rng.normal(size=(v, d)).astype(np.float32)
    q = rng.normal(size=(v, d)).astype(np.float32)
    u = rng.normal(size=(v, d)).astype(np.float32)
    w = rng.normal(size=(v, d)).astype(np.float32)
    s = rng.integers(0, v, size=e).astype(np.int32)
    r = rng.integers(0, v, size=e).astype(np.int32)
    plan = sp.build_edge_plan(r, s, v, tile_e=32)  # seg=recv, oth=send
    with pltpu.force_tpu_interpret_mode():
        out = sp.sddmm_dual(*map(jnp.asarray, (p, q, u, w)), plan)
    expect = (sp.sddmm_reference(p, q, r, s)
              + sp.sddmm_reference(u, w, s, r))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_gather_pair_matches_oracle_with_grads():
    """Fused edge-logit gather pair: XLA-take forward + ONE Pallas
    scatter kernel VJP (the round-4 kernel suite)."""
    rng = np.random.default_rng(21)
    v, e, d = 200, 256, 16
    s = rng.integers(0, v, size=e).astype(np.int32)
    r = rng.integers(0, v, size=e).astype(np.int32)
    pa = rng.normal(size=(v, d)).astype(np.float32)
    pb = rng.normal(size=(v, d)).astype(np.float32)
    plans = sp.build_agg_plans(s, r, v, tile_e=64)
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def loss(pa, pb):
        out = sp.gather_pair(pa, pb, sj, rj, plans)
        return jnp.sum(out ** 2) + jnp.sum(out[::2])

    def loss_ref(pa, pb):
        out = sp.gather_pair_reference(pa, pb, sj, rj)
        return jnp.sum(out ** 2) + jnp.sum(out[::2])

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(
            jnp.asarray(pa), jnp.asarray(pb))
    eval_, egrads = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(pa), jnp.asarray(pb))
    np.testing.assert_allclose(float(val), float(eval_), rtol=1e-5)
    for g, eg in zip(grads, egrads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(eg),
                                   rtol=1e-4, atol=1e-5)


def test_boundary_padded_plans_match_oracle():
    """Per-segment (layer) plan padding: no tile spans two layers, pad
    slots carry zero weight, fwd/bwd parity holds and windows shrink."""
    rng = np.random.default_rng(22)
    nl, nt, k = 6, 64, 4
    v = nl * nt
    senders, receivers = [], []
    for layer in range(nl - 1):
        for t in range(nt):
            for j in range(k):
                senders.append(layer * nt + (t + j) % nt)
                receivers.append((layer + 1) * nt + t)
    s = np.array(senders, np.int32)
    r = np.array(receivers, np.int32)
    e = len(s)
    offs = np.arange(nl + 1) * nt
    plans = sp.build_agg_plans(s, r, v, tile_e=64, boundaries=offs)
    # each layer-pair bucket (nt*k=256 edges) padded to a tile multiple
    assert plans.recv.n_edge % 64 == 0 and plans.recv.n_edge >= e
    assert plans.recv.w_oth == 128  # tight windows, not ~v
    h = rng.normal(size=(v, 8)).astype(np.float32)
    w = rng.normal(size=(e,)).astype(np.float32)

    def loss(h, w):
        mi, mo = sp.aggregate_pair(h, w, plans)
        return jnp.sum(mi ** 2) + jnp.sum((mo * 1.3) ** 2)

    def loss_ref(h, w):
        mi, mo = sp.aggregate_pair_reference(h, w, s, r, v)
        return jnp.sum(mi ** 2) + jnp.sum((mo * 1.3) ** 2)

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(
            jnp.asarray(h), jnp.asarray(w))
    evl, egrads = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(h), jnp.asarray(w))
    np.testing.assert_allclose(float(val), float(evl), rtol=1e-4)
    for g, eg in zip(grads, egrads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(eg),
                                   rtol=1e-3, atol=1e-4)


def test_boundary_plans_in_model_path():
    """attach_plans(boundaries=...) end to end through the model fwd."""
    from gnn_fpga_tpu.core import graph as graph_lib
    from gnn_fpga_tpu.data import toy2d
    from gnn_fpga_tpu.models import mpnn
    cfg = toy2d.Toy2DConfig(n_layers=6, n_tracks=8, seed=5)
    g = jax.tree.map(lambda a: a[0],
                     toy2d.make_knn_segment_graphs(cfg, 1, k=4))
    g = graph_lib.pad_graph(g, g.n_node + 8, g.n_edge + 32)
    bounds = np.append(toy2d.layer_offsets(cfg), g.n_node)
    gp = graph_lib.attach_plans(g, tile_e=32, boundaries=bounds)
    mcfg = mpnn.SegmentClassifierConfig(input_dim=2, hidden_dim=8,
                                        n_iters=2, aggregation="sparse")
    import dataclasses
    pcfg = dataclasses.replace(mcfg, aggregation="pallas")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(0), mcfg)
    ls = mpnn.segment_classifier_logits(params, g, mcfg)
    with pltpu.force_tpu_interpret_mode():
        lp = mpnn.segment_classifier_logits(params, gp, pcfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pre", ["int8", "bf16"])
def test_prebuilt_onehots_match_oracle_with_grads(pre):
    """Blocked-ELL prebuilt one-hot operands (streamed from HBM instead of
    VPU iota-compare builds) must be bit-equivalent to the build path:
    same 0/1 values feed the same MXU contractions."""
    h, w, s, r = _random_graph(7, 80, 192, 16)
    plans = sp.build_agg_plans(s, r, 80, tile_e=32, precompute=pre)
    assert plans.recv.prebuilt and not plans.send.prebuilt
    assert plans.recv.oh_oth.shape == (plans.recv.n_edge, plans.recv.w_oth)
    hj, wj = jnp.asarray(h), jnp.asarray(w)
    with pltpu.force_tpu_interpret_mode():
        mi, mo = sp.aggregate_pair(hj, wj, plans)
    emi, emo = sp.aggregate_pair_reference(h, w, s, r, 80)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(emi),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(emo),
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda hh, ww: jnp.sum(
            jnp.stack(fn(hh, ww)).astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gh, gw = jax.grad(loss(lambda a, b: sp.aggregate_pair(a, b, plans)),
                          argnums=(0, 1))(hj, wj)
    egh, egw = jax.grad(
        loss(lambda a, b: sp.aggregate_pair_reference(a, b, s, r, 80)),
        argnums=(0, 1))(hj, wj)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(egh),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(egw),
                               rtol=1e-3, atol=1e-4)


def test_prebuilt_gather_pair_grads_match():
    h, _, s, r = _random_graph(8, 80, 192, 16)
    rng = np.random.default_rng(9)
    pa = jnp.asarray(rng.normal(size=(80, 16)).astype(np.float32))
    pb = jnp.asarray(rng.normal(size=(80, 16)).astype(np.float32))
    plans = sp.build_agg_plans(s, r, 80, tile_e=32, precompute="int8")
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def loss(fn):
        return lambda a, b: jnp.sum(fn(a, b) ** 2)

    with pltpu.force_tpu_interpret_mode():
        da, db = jax.grad(
            loss(lambda a, b: sp.gather_pair(a, b, sj, rj, plans)),
            argnums=(0, 1))(pa, pb)
    eda, edb = jax.grad(
        loss(lambda a, b: sp.gather_pair_reference(a, b, sj, rj)),
        argnums=(0, 1))(pa, pb)
    np.testing.assert_allclose(np.asarray(da), np.asarray(eda),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(edb),
                               rtol=1e-3, atol=1e-4)


def test_prebuilt_plans_in_model_path():
    """segment_classifier with aggregation='pallas' over prebuilt plans
    (core.graph.attach_plans(precompute=...)) matches the sparse path,
    forward and grads."""
    from gnn_fpga_tpu.core import graph as G
    from gnn_fpga_tpu.models import mpnn

    g = _packed_graph(seed=3)
    g = G.attach_plans(g.replace(plans=None), tile_e=32, precompute="int8")
    cfg_s = mpnn.SegmentClassifierConfig(input_dim=3, hidden_dim=8,
                                         n_iters=2, aggregation="sparse")
    cfg_p = dataclasses_replace(cfg_s, aggregation="pallas")
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(2), cfg_s)

    def loss(params, cfg):
        logits = mpnn.segment_classifier_logits(params, g, cfg)
        per = jnp.maximum(logits, 0) - logits * g.y + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return (per * g.edge_mask).sum() / g.edge_mask.sum()

    ls = mpnn.segment_classifier_logits(params, g, cfg_s)
    gs = jax.grad(loss)(params, cfg_s)
    with pltpu.force_tpu_interpret_mode():
        lp = mpnn.segment_classifier_logits(params, g, cfg_p)
        gp = jax.grad(loss)(params, cfg_p)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("pre", [None, "int8"])
def test_iteration_pair_matches_oracle_with_grads(pre):
    """Whole-iteration fusion (edge MLP -> sigmoid -> both weighted
    aggregations in one kernel): parity + grads for every input incl.
    the edge-MLP parameters, with masked (pad) edges."""
    rng = np.random.default_rng(11)
    v, e, d, hdim = 80, 192, 10, 12
    s = rng.integers(0, v, e).astype(np.int32)
    r = rng.integers(0, v, e).astype(np.int32)
    h = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    pa = jnp.asarray(rng.standard_normal((v, hdim)).astype(np.float32))
    pb = jnp.asarray(rng.standard_normal((v, hdim)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal(hdim).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(hdim).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(1).astype(np.float32))
    em = np.ones(e, np.float32)
    em[-20:] = 0
    em = jnp.asarray(em)
    sj, rj = jnp.asarray(s), jnp.asarray(r)
    plans = sp.build_agg_plans(s, r, v, tile_e=32, precompute=pre)
    ems = sp.sort_edge_weights(em, plans.recv)
    with pltpu.force_tpu_interpret_mode():
        mi, mo = sp.iteration_pair(pa, pb, h, ems, w2, b1, b2, plans)
    emi, emo = sp.iteration_pair_reference(pa, pb, h, em, w2, b1, b2,
                                           sj, rj, v)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(emi),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(emo),
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.stack(fn(*a)).astype(jnp.float32)
                                  ** 2)

    f = loss(lambda *a: sp.iteration_pair(a[0], a[1], a[2], ems, a[3],
                                          a[4], a[5], plans))
    fr = loss(lambda *a: sp.iteration_pair_reference(
        a[0], a[1], a[2], em, a[3], a[4], a[5], sj, rj, v))
    with pltpu.force_tpu_interpret_mode():
        gs = jax.grad(f, argnums=tuple(range(6)))(pa, pb, h, w2, b1, b2)
    gr = jax.grad(fr, argnums=tuple(range(6)))(pa, pb, h, w2, b1, b2)
    for i, (a, b) in enumerate(zip(gs, gr)):
        assert np.asarray(a).shape == np.asarray(b).shape, i
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4, err_msg=f"arg {i}")


def test_fused_iteration_model_path_matches_unfused():
    """segment_classifier fused_iteration=True must reproduce the unfused
    pallas path (and hence the sparse oracle), forward and grads."""
    from gnn_fpga_tpu.models import mpnn

    g = _packed_graph(seed=5)
    cfg_f = mpnn.SegmentClassifierConfig(input_dim=3, hidden_dim=8,
                                         n_iters=2, aggregation="pallas",
                                         fused_iteration=True)
    cfg_u = dataclasses_replace(cfg_f, fused_iteration=False)
    params = mpnn.init_segment_classifier(jax.random.PRNGKey(3), cfg_f)

    def loss(params, cfg):
        logits = mpnn.segment_classifier_logits(params, g, cfg)
        per = jnp.maximum(logits, 0) - logits * g.y + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return (per * g.edge_mask).sum() / g.edge_mask.sum()

    with pltpu.force_tpu_interpret_mode():
        lf = mpnn.segment_classifier_logits(params, g, cfg_f)
        lu = mpnn.segment_classifier_logits(params, g, cfg_u)
        gf = jax.grad(loss)(params, cfg_f)
        gu = jax.grad(loss)(params, cfg_u)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_fused_iteration_unshared_matches_unfused():
    """The unshared-weights variant's fused_iteration path must reproduce
    its unfused pallas path, forward and grads (per-iteration params are
    scanned through the fused kernel)."""
    from gnn_fpga_tpu.models import mpnn

    g = _packed_graph(seed=7)
    cfg_f = mpnn.SegmentClassifierConfig(input_dim=3, hidden_dim=8,
                                         n_iters=2, aggregation="pallas",
                                         fused_iteration=True)
    cfg_u = dataclasses_replace(cfg_f, fused_iteration=False)
    params = mpnn.init_segment_classifier_unshared(jax.random.PRNGKey(9),
                                                   cfg_f)

    def loss(params, cfg):
        logits = mpnn.segment_classifier_unshared_logits(params, g, cfg)
        per = jnp.maximum(logits, 0) - logits * g.y + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return (per * g.edge_mask).sum() / g.edge_mask.sum()

    with pltpu.force_tpu_interpret_mode():
        lf = mpnn.segment_classifier_unshared_logits(params, g, cfg_f)
        lu = mpnn.segment_classifier_unshared_logits(params, g, cfg_u)
        gf = jax.grad(loss)(params, cfg_f)
        gu = jax.grad(loss)(params, cfg_u)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_fused_iteration_node_classifier_matches_unfused():
    """NodeClassifier's fused_iteration path must reproduce its unfused
    pallas path (node-target head), forward and grads."""
    from gnn_fpga_tpu.models import mpnn

    g = _packed_graph(seed=13)
    ny = (np.arange(g.x.shape[0]) % 2).astype(np.float32)
    g = g.replace(node_y=jnp.asarray(ny))
    cfg_f = mpnn.NodeClassifierConfig(input_dim=3, hidden_dim=8,
                                      n_iters=2, aggregation="pallas",
                                      fused_iteration=True)
    cfg_u = dataclasses_replace(cfg_f, fused_iteration=False)
    params = mpnn.init_node_classifier(jax.random.PRNGKey(21), cfg_f)

    def loss(params, cfg):
        logits = mpnn.node_classifier_logits(params, g, cfg)
        per = jnp.maximum(logits, 0) - logits * g.node_y + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return (per * g.node_mask).sum() / g.node_mask.sum()

    with pltpu.force_tpu_interpret_mode():
        lf = mpnn.node_classifier_logits(params, g, cfg_f)
        lu = mpnn.node_classifier_logits(params, g, cfg_u)
        gf = jax.grad(loss)(params, cfg_f)
        gu = jax.grad(loss)(params, cfg_u)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)

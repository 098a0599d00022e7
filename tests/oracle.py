"""NumPy dense-incidence-matrix oracle of the reference forward pass.

Independent re-implementation (in numpy, from the math) of the reference
models' forward semantics (`/root/reference/gnn/model.py:36-156`,
`MPNN_HitClassifier.ipynb:cell21`, `GCN_Toy2D.ipynb:cell11-14`), used as
the activation-parity test oracle: the dense ``bmm`` formulation over
incidence matrices Ri/Ro must match the COO gather/segment-sum model
per-iteration to float tolerance.
"""

import numpy as np


def _linear(p, x, mask=None):
    w = p["w"] if mask is None else p["w"] * np.asarray(mask)
    return x @ np.asarray(w) + np.asarray(p["b"])


def _np_params(params):
    import jax
    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), params)


def sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def edge_network_dense(p, x, ri, ro, masks=None):
    """e = sigmoid(MLP([Ro^T X, Ri^T X])) — dense form of model.py:69-81."""
    bo = ro.T @ x
    bi = ri.T @ x
    b = np.concatenate([bo, bi], axis=-1)
    m1 = None if masks is None else masks.get("l1")
    m2 = None if masks is None else masks.get("l2")
    z = np.tanh(_linear(p["l1"], b, m1))
    return sigmoid(_linear(p["l2"], z, m2))[..., 0]


def node_network_dense(p, x, e, ri, ro, masks=None):
    """M = [Ri·e·(Ro^T X), Ro·e·(Ri^T X), X] -> tanh MLP — model.py:113-125."""
    bo = ro.T @ x
    bi = ri.T @ x
    rwi = ri * e[None, :]
    rwo = ro * e[None, :]
    mi = rwi @ bo
    mo = rwo @ bi
    m = np.concatenate([mi, mo, x], axis=-1)
    m1 = None if masks is None else masks.get("l1")
    m2 = None if masks is None else masks.get("l2")
    z = np.tanh(_linear(p["l1"], m, m1))
    return np.tanh(_linear(p["l2"], z, m2))


def segment_classifier_dense(params, x, ri, ro, n_iters, masks=None,
                             return_intermediates=False):
    """Dense forward of SegmentClassifier (model.py:140-156)."""
    params = _np_params(params)
    x = np.asarray(x, np.float64)
    masks_e = None if masks is None else masks.get("edge")
    masks_n = None if masks is None else masks.get("node")
    h = np.tanh(_linear(params["input"], x))
    h = np.concatenate([h, x], axis=-1)
    es, hs = [], [h]
    for _ in range(n_iters):
        e = edge_network_dense(params["edge"], h, ri, ro, masks_e)
        h = node_network_dense(params["node"], h, e, ri, ro, masks_n)
        h = np.concatenate([h, x], axis=-1)
        es.append(e)
        hs.append(h)
    out = edge_network_dense(params["edge"], h, ri, ro, masks_e)
    if return_intermediates:
        return out, es, hs
    return out


def node_classifier_dense(params, x, ri, ro, n_iters):
    """Dense forward of NodeClassifier (MPNN_HitClassifier.ipynb:cell21)."""
    params = _np_params(params)
    x = np.asarray(x, np.float64)
    h = np.tanh(_linear(params["input"], x))
    h = np.concatenate([h, x], axis=-1)
    for _ in range(n_iters):
        e = edge_network_dense(params["edge"], h, ri, ro)
        h = node_network_dense(params["node"], h, e, ri, ro)
        h = np.concatenate([h, x], axis=-1)
    return sigmoid(_linear(params["output"], h))[..., 0]


def segment_classifier_unshared_dense(params, x, ri, ro, n_iters):
    """Dense forward of the per-iteration-weights variant
    (MPNN_Seg_Toy2D.ipynb:cell14)."""
    import jax
    params = _np_params(params)
    x = np.asarray(x, np.float64)
    h = np.tanh(_linear(params["input"], x))
    h = np.concatenate([h, x], axis=-1)
    for i in range(n_iters):
        ep = jax.tree.map(lambda a: a[i], params["edge_stack"])
        npp = jax.tree.map(lambda a: a[i], params["node_stack"])
        e = edge_network_dense(ep, h, ri, ro)
        h = node_network_dense(npp, h, e, ri, ro)
        h = np.concatenate([h, x], axis=-1)
    return edge_network_dense(params["output"], h, ri, ro)

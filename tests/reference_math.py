"""NumPy oracle: independent transliteration of the reference layer math
(dropout disabled), used as the golden implementation for parity tests.

This is written from the documented equations in SURVEY.md §2.1-§2.5, not
copied from the torch source; it exists so parity tests need neither torch
nor the reference tree at test time.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -9e15


def leaky_relu(x, alpha):
    return np.where(x >= 0, x, alpha * x)


def elu(x):
    return np.where(x > 0, x, np.expm1(x))


def softmax_rows(x):
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def v1_dense_head(W, a, h, adj, alpha, concat, skip=None):
    """Reference GraphAttentionLayer.forward, eval mode (layers.py:32-64)."""
    Wh = h @ W
    f = W.shape[1]
    e = leaky_relu(Wh @ a[:f, None] + (Wh @ a[f:, None]).T, alpha)
    att = np.where(adj > 0, e, NEG_INF)
    att = softmax_rows(att)
    out = att @ Wh
    if skip is not None:
        out = out + h @ skip
    return elu(out) if concat else out


def v1_sparse_head(W, a, h, adj, alpha, concat, skip=None):
    """Reference SpGraphAttentionLayer.forward, eval mode (layers.py:125-173)."""
    n = h.shape[0]
    Wh = h @ W
    f = W.shape[1]
    dst, src = np.nonzero(adj)  # edge[0]=dst, edge[1]=src
    logits = leaky_relu(Wh[dst] @ a[:f] + Wh[src] @ a[f:], alpha)
    # scatter_max-stabilized segment softmax over dst
    seg_max = np.full(n, -np.inf)
    np.maximum.at(seg_max, dst, logits)
    seg_max[~np.isfinite(seg_max)] = 0.0
    num = np.exp(logits - seg_max[dst])
    denom = np.zeros(n)
    np.add.at(denom, dst, num)
    out = np.zeros((n, f))
    np.add.at(out, dst, num[:, None] * Wh[src])
    out = out / np.where(denom > 0, denom, 1.0)[:, None]
    if skip is not None:
        out = out + h @ skip
    return elu(out) if concat else out


def v2_dense_head(W, a, h, adj, alpha, concat, skip=None):
    """Reference GraphAttentionLayerV2.forward with its [N,1] broadcast quirk
    (layers.py:203-229)."""
    f_in = h.shape[1]
    Wh1 = h @ W[:f_in]
    Wh2 = h @ W[f_in:]
    e = leaky_relu(Wh1 + Wh2, alpha) @ a  # [N]
    att = np.where(adj > 0, e[:, None], NEG_INF)
    att = softmax_rows(att)
    out = att @ Wh2
    if skip is not None:
        out = out + h @ skip
    return elu(out) if concat else out


def v2_sparse_head(W, a, h, adj, alpha, concat, skip=None):
    """Reference SpGraphAttentionLayerV2.forward (layers.py:261-313)."""
    n, f_in = h.shape
    Whi = h @ W[:f_in]
    Whj = h @ W[f_in:]
    f = Whi.shape[1]
    dst, src = np.nonzero(adj)
    logits = leaky_relu(Whi[dst] + Whj[src], alpha) @ a
    seg_max = np.full(n, -np.inf)
    np.maximum.at(seg_max, dst, logits)
    seg_max[~np.isfinite(seg_max)] = 0.0
    num = np.exp(logits - seg_max[dst])
    denom = np.zeros(n)
    np.add.at(denom, dst, num)
    out = np.zeros((n, f))
    np.add.at(out, dst, num[:, None] * Whi[src])
    out = out / np.where(denom > 0, denom, 1.0)[:, None]
    if skip is not None:
        out = out + h @ skip
    return elu(out) if concat else out


def gat_forward(layer_fn, layers_params, h, adj, alpha, skip_list=None):
    """Reference GAT container forward, eval mode (models.py:29-35).

    ``layers_params`` is a list over layers of lists over heads of (W, a).
    """
    x = h
    for i, heads in enumerate(layers_params):
        concat = i < len(layers_params) - 1
        outs = []
        for j, (W, a) in enumerate(heads):
            skip = None if skip_list is None else skip_list[i][j]
            outs.append(layer_fn(W, a, x, adj, alpha, concat, skip))
        if concat:
            x = np.concatenate(outs, axis=1)
        else:
            x = np.mean(np.stack(outs, axis=1), axis=1)
    return x

"""Generate golden activation tensors from a torch transliteration of the
reference layer math (reference /root/reference/layers.py, models.py,
train.py:151-152), eval mode (dropout = identity).

Run wherever torch is importable (it is baked into this image):

    python tests/golden/gen_golden_torch.py

writes ``tests/golden/golden_layers.npz`` which ``tests/test_golden_torch.py``
consumes WITHOUT needing torch or /root/reference at test time. The torch
code below is an independent functional transliteration of the reference
equations (the same role as tests/reference_math.py, but executed by torch's
own kernels — closing the "oracle wrote itself" loophole: torch's softmax /
matmul / scatter semantics are the ground truth here, not our NumPy).

All tensors are float64 for tight downstream tolerances.
"""

from __future__ import annotations

import os

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
ALPHA = 0.2
NEG = -9e15


def leaky(x):
    return torch.nn.functional.leaky_relu(x, ALPHA)


def finish(h_prime, h, skip, concat):
    """Shared tail: skip projection from the (identity-dropped) input, then
    ELU iff non-final layer (reference layers.py:46-53)."""
    if skip is not None:
        h_prime = h_prime + h @ skip
    return torch.nn.functional.elu(h_prime) if concat else h_prime


def v1_dense(h, adj, W, a, skip, concat):
    """Reference GraphAttentionLayer.forward, eval mode (layers.py:32-64)."""
    f_out = W.shape[1]
    Wh = h @ W
    e = leaky(Wh @ a[:f_out] + (Wh @ a[f_out:]).T)  # [N, 1] + [1, N]
    att = torch.where(adj > 0, e, torch.full_like(e, NEG))
    att = torch.softmax(att, dim=1)
    return finish(att @ Wh, h, skip, concat)


def v2_dense(h, adj, W, a, skip, concat):
    """Reference GraphAttentionLayerV2.forward incl. its [N, 1] logit quirk
    (layers.py:204-229: e = leaky(Wh1 + Wh2) @ a is per-node)."""
    f_in = h.shape[1]
    Wh1 = h @ W[:f_in]
    Wh2 = h @ W[f_in:]
    e = leaky(Wh1 + Wh2) @ a  # [N, 1]
    att = torch.where(adj > 0, e, torch.full_like(adj, NEG))  # broadcast
    att = torch.softmax(att, dim=1)
    return finish(att @ Wh2, h, skip, concat)


def _coo(adj):
    """edge = adj.nonzero().t(): edge[0] = receiver i, edge[1] = sender j
    (reference convention, layers.py:279: (i, j) = 1 means edge j -> i)."""
    return adj.nonzero().t()


def _seg_softmax_spmm(edge, e, values, n):
    """scatter-max-stabilized segment softmax + two sparse matmuls + divide
    (reference layers.py:145-160): numerator aggregation of ``values`` rows
    gathered at the SENDER, normalized per receiver."""
    recv, send = edge[0], edge[1]
    e_max = torch.full((n,), -torch.inf, dtype=e.dtype).scatter_reduce(
        0, recv, e, reduce="amax", include_self=False
    )
    num = torch.exp(e - e_max[recv])
    sp = torch.sparse_coo_tensor(edge, num, (n, n))
    rowsum = sp @ torch.ones((n, 1), dtype=e.dtype)
    h_prime = sp @ values
    return h_prime / rowsum


def v1_sparse(h, adj, W, a, skip, concat):
    """Reference SpGraphAttentionLayer.forward, eval mode (layers.py:125-173)."""
    n = h.shape[0]
    edge = _coo(adj)
    f_out = W.shape[1]
    Wh = h @ W
    # a^T [Wh_i || Wh_j]: first half pairs the receiver, second the sender
    e = leaky(Wh[edge[0]] @ a[:f_out] + Wh[edge[1]] @ a[f_out:]).squeeze(-1)
    return finish(_seg_softmax_spmm(edge, e, Wh, n), h, skip, concat)


def v2_sparse(h, adj, W, a, skip, concat):
    """Reference SpGraphAttentionLayerV2.forward (layers.py:261-313):
    LeakyReLU BEFORE the a-projection; aggregates Whi gathered at senders."""
    n = h.shape[0]
    edge = _coo(adj)
    f_in = h.shape[1]
    Whi = h @ W[:f_in]
    Whj = h @ W[f_in:]
    e = (leaky(Whi[edge[0]] + Whj[edge[1]]) @ a).squeeze(-1)  # [E]
    return finish(_seg_softmax_spmm(edge, e, Whi, n), h, skip, concat)


LAYER_FNS = {
    "GAT": v1_dense,
    "GAT_sparse": v1_sparse,
    "GATv2": v2_dense,
    "GATv2_sparse": v2_sparse,
}


def model_forward(layer_type, h, adj, params, concat_flags):
    """Reference GAT container wiring (models.py:29-35): concat heads on
    non-final layers, mean-stack on the final one."""
    fn = LAYER_FNS[layer_type]
    for heads, concat in zip(params, concat_flags):
        outs = [fn(h, adj, W, a, skip, concat) for (W, a, skip) in heads]
        h = torch.cat(outs, dim=1) if concat else torch.stack(outs, 1).mean(1)
    return h


def log_logits(out):
    """Transductive loss head: log_softmax(ELU(out)) (train.py:151-152)."""
    return torch.log_softmax(torch.nn.functional.elu(out), dim=1)


# ---------------------------------------------------------------------------
# Train-mode variants with FIXED keep masks (VERDICT r2 item 7): the same
# dropout placement as the reference in train mode — input AND
# post-projection AND attention numerator, with the softmax denominator
# computed from PRE-dropout numerators (reference layers.py:132-160; dense
# variants drop the post-softmax attention matrix, layers.py:34-43) — but
# with dropout realized as multiplication by pre-drawn boolean masks
# scaled by 1/(1-p), so the JAX build can consume the identical masks
# through DropoutMasks and be compared exactly.
# ---------------------------------------------------------------------------


def dropped(x, mask, p):
    return x * mask / (1.0 - p)


def v1_dense_train(h, adj, W, a, skip, concat, M, p):
    f_out = W.shape[1]
    h = dropped(h, M["m_in"], p)
    Wh = dropped(h @ W, M["m_proj"], p)
    e = leaky(Wh @ a[:f_out] + (Wh @ a[f_out:]).T)
    att = torch.where(adj > 0, e, torch.full_like(e, NEG))
    att = torch.softmax(att, dim=1)
    att = dropped(att, M["m_att"], p)  # post-softmax (layers.py:43)
    return finish(att @ Wh, h, skip, concat)


def v2_dense_train(h, adj, W, a, skip, concat, M, p):
    f_in = h.shape[1]
    h = dropped(h, M["m_in"], p)
    Wh1 = dropped(h @ W[:f_in], M["m_proj"], p)
    Wh2 = dropped(h @ W[f_in:], M["m_proj2"], p)
    e = leaky(Wh1 + Wh2) @ a  # [N, 1] quirk preserved
    att = torch.where(adj > 0, e, torch.full_like(adj, NEG))
    att = torch.softmax(att, dim=1)
    att = dropped(att, M["m_att"], p)
    return finish(att @ Wh2, h, skip, concat)


def _seg_softmax_spmm_train(edge, e, values, n, m_att_e, p):
    """Reference layers.py:145-160 order: scatter-max, exp, ROWSUM FROM
    PRE-DROPOUT numerators, then dropout on the aggregation numerator."""
    recv = edge[0]
    e_max = torch.full((n,), -torch.inf, dtype=e.dtype).scatter_reduce(
        0, recv, e, reduce="amax", include_self=False
    )
    num = torch.exp(e - e_max[recv])
    sp_pre = torch.sparse_coo_tensor(edge, num, (n, n))
    rowsum = sp_pre @ torch.ones((n, 1), dtype=e.dtype)  # pre-dropout denom
    num = dropped(num, m_att_e, p)
    h_prime = torch.sparse_coo_tensor(edge, num, (n, n)) @ values
    return h_prime / rowsum


def v1_sparse_train(h, adj, W, a, skip, concat, M, p):
    n = h.shape[0]
    edge = _coo(adj)
    f_out = W.shape[1]
    h = dropped(h, M["m_in"], p)
    Wh = dropped(h @ W, M["m_proj"], p)
    e = leaky(Wh[edge[0]] @ a[:f_out] + Wh[edge[1]] @ a[f_out:]).squeeze(-1)
    m_att_e = M["m_att"][edge[0], edge[1]]
    return finish(_seg_softmax_spmm_train(edge, e, Wh, n, m_att_e, p),
                  h, skip, concat)


def v2_sparse_train(h, adj, W, a, skip, concat, M, p):
    n = h.shape[0]
    edge = _coo(adj)
    f_in = h.shape[1]
    h = dropped(h, M["m_in"], p)
    Whi = dropped(h @ W[:f_in], M["m_proj"], p)
    Whj = dropped(h @ W[f_in:], M["m_proj2"], p)
    e = (leaky(Whi[edge[0]] + Whj[edge[1]]) @ a).squeeze(-1)
    m_att_e = M["m_att"][edge[0], edge[1]]
    return finish(_seg_softmax_spmm_train(edge, e, Whi, n, m_att_e, p),
                  h, skip, concat)


TRAIN_FNS = {
    "GAT": v1_dense_train,
    "GAT_sparse": v1_sparse_train,
    "GATv2": v2_dense_train,
    "GATv2_sparse": v2_sparse_train,
}


def make_graph(rng, n, avg_deg):
    """Random digraph + self loops, symmetrized + D^-1/2 (A+I) D^-1/2
    normalized like the citation pipeline (reference utils.py:49-52)."""
    a = (rng.random((n, n)) < avg_deg / n).astype(np.float64)
    np.fill_diagonal(a, 0.0)
    a = np.maximum(a, a.T)  # symmetrize (binary case of utils.py:49)
    a = a + np.eye(n)
    d = a.sum(1)
    dinv = 1.0 / np.sqrt(d)
    return dinv[:, None] * a * dinv[None, :]


def main():
    rng = np.random.default_rng(2026)
    n, f_in, f_out, alpha = 20, 12, 6, ALPHA
    adj_np = make_graph(rng, n, avg_deg=4)
    h_np = rng.standard_normal((n, f_in))
    adj = torch.tensor(adj_np)
    h = torch.tensor(h_np)

    out = {"adj": adj_np, "h": h_np, "alpha": np.float64(alpha)}

    def rand(*shape):
        return rng.standard_normal(shape)

    # single-layer cases: every variant x {concat, final} x {skip, no-skip}
    for lt in LAYER_FNS:
        two = lt.startswith("GATv2")
        w_shape = (2 * f_in, f_out) if two else (f_in, f_out)
        a_shape = (f_out, 1) if two else (2 * f_out, 1)
        W = rand(*w_shape)
        a_vec = rand(*a_shape)
        skip = rand(f_in, f_out)
        out[f"{lt}/W"] = W
        out[f"{lt}/a"] = a_vec
        out[f"{lt}/skip"] = skip
        for concat in (True, False):
            for use_skip in (True, False):
                y = LAYER_FNS[lt](
                    h, adj, torch.tensor(W), torch.tensor(a_vec),
                    torch.tensor(skip) if use_skip else None, concat,
                )
                tag = f"{lt}/out_c{int(concat)}_s{int(use_skip)}"
                out[tag] = y.numpy()

    # train-mode fixed-mask cases (reuses each variant's eval W/a/skip):
    # masks drawn at the reference dropout rate, saved as booleans so the
    # JAX side can inject the identical masks through DropoutMasks
    p_drop = 0.6
    out["p_drop"] = np.float64(p_drop)
    for lt in LAYER_FNS:
        two = lt.startswith("GATv2")
        W = out[f"{lt}/W"]
        a_vec = out[f"{lt}/a"]
        skip = out[f"{lt}/skip"]
        f_out = W.shape[1]
        M_np = {
            "m_in": rng.random((n, f_in)) < (1 - p_drop),
            "m_proj": rng.random((n, f_out)) < (1 - p_drop),
            "m_att": rng.random((n, n)) < (1 - p_drop),
        }
        if two:
            M_np["m_proj2"] = rng.random((n, f_out)) < (1 - p_drop)
        for k, v in M_np.items():
            out[f"train/{lt}/{k}"] = v
        M = {k: torch.tensor(v, dtype=torch.float64) for k, v in M_np.items()}
        for concat in (True, False):
            y = TRAIN_FNS[lt](
                h, adj, torch.tensor(W), torch.tensor(a_vec),
                torch.tensor(skip), concat, M, p_drop,
            )
            out[f"train/{lt}/out_c{int(concat)}"] = y.numpy()

    # 2-layer 3+1-head model per variant + the ELU/log_softmax loss head
    n_classes = 4
    for lt in LAYER_FNS:
        two = lt.startswith("GATv2")
        heads = (3, 1)
        nfeats = (f_in, f_out, n_classes)
        params = []
        for i, h_count in enumerate(heads):
            lin = nfeats[i] * (1 if i == 0 else heads[i - 1])
            lout = nfeats[i + 1]
            w_shape = (2 * lin, lout) if two else (lin, lout)
            a_shape = (lout, 1) if two else (2 * lout, 1)
            layer = []
            for j in range(h_count):
                layer.append((rand(*w_shape), rand(*a_shape), rand(lin, lout)))
            params.append(layer)
        tparams = [
            [(torch.tensor(W), torch.tensor(a_), torch.tensor(s)) for W, a_, s in layer]
            for layer in params
        ]
        y = model_forward(lt, h, adj, tparams, concat_flags=(True, False))
        out[f"model/{lt}/out"] = y.numpy()
        out[f"model/{lt}/log_logits"] = log_logits(y).numpy()
        for i, layer in enumerate(params):
            for j, (W, a_, s) in enumerate(layer):
                out[f"model/{lt}/W{i}_{j}"] = W
                out[f"model/{lt}/a{i}_{j}"] = a_
                out[f"model/{lt}/skip{i}_{j}"] = s

    path = os.path.join(HERE, "golden_layers.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1024:.0f} KiB, "
          f"{len(out)} tensors), torch {torch.__version__}")


if __name__ == "__main__":
    main()

"""Offline prep + real-data readiness: the env-gated PPI download
(reference load_data_ppi.py:92-106 semantics) and the DGL re-export
(reference get_citeseer/get_pubmed.ipynb cells 1-2) — with mocked
network/DGL, since this container has neither."""

import io
import json
import os
import zipfile

import numpy as np
import pytest
import scipy.sparse as sp

from pygat_tpu.data.ppi import ensure_ppi_download
from pygat_tpu.data.prepare import export_dgl


def _fake_ppi_zip() -> bytes:
    """A miniature ppi.zip: the real archive's file names, tiny payloads."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for split, n in (("train", 12), ("valid", 6), ("test", 6)):
            feat = io.BytesIO()
            np.save(feat, np.ones((n, 50), np.float32))
            zf.writestr(f"{split}_feats.npy", feat.getvalue())
            lab = io.BytesIO()
            np.save(lab, np.zeros((n, 121), np.float32))
            zf.writestr(f"{split}_labels.npy", lab.getvalue())
            gid = io.BytesIO()
            np.save(gid, np.zeros(n, np.int64))
            zf.writestr(f"{split}_graph_id.npy", gid.getvalue())
            topo = {"directed": False, "multigraph": False, "graph": {},
                    "nodes": [{"id": i} for i in range(n)],
                    "links": [{"source": i, "target": (i + 1) % n}
                              for i in range(n)]}
            zf.writestr(f"{split}_graph.json", json.dumps(topo))
    return buf.getvalue()


def test_ppi_download_mocked(tmp_path, monkeypatch):
    monkeypatch.setenv("PYGAT_ALLOW_DOWNLOAD", "1")
    payload = _fake_ppi_zip()
    calls = []

    def fetch(url, path):
        calls.append(url)
        with open(path, "wb") as f:
            f.write(payload)

    ok = ensure_ppi_download(str(tmp_path), _fetch=fetch)
    assert ok and calls == ["https://data.dgl.ai/dataset/ppi.zip"]
    d = tmp_path / "data" / "ppi"
    for split in ("train", "valid", "test"):
        assert (d / f"{split}_feats.npy").exists()
        assert (d / f"{split}_graph.json").exists()
    assert not (d / "ppi.zip").exists()  # tmp archive removed
    # idempotent: second call is a no-op (no new fetch)
    assert ensure_ppi_download(str(tmp_path), _fetch=fetch)
    assert len(calls) == 1


def test_ppi_download_sha_mismatch(tmp_path, monkeypatch):
    monkeypatch.setenv("PYGAT_ALLOW_DOWNLOAD", "1")
    payload = _fake_ppi_zip()

    def fetch(url, path):
        with open(path, "wb") as f:
            f.write(payload)

    ok = ensure_ppi_download(str(tmp_path), sha256="0" * 64, _fetch=fetch)
    assert not ok
    assert not (tmp_path / "data" / "ppi" / "train_feats.npy").exists()
    # correct digest passes
    import hashlib

    good = hashlib.sha256(payload).hexdigest()
    assert ensure_ppi_download(str(tmp_path), sha256=good, _fetch=fetch)


def test_ppi_download_gated_off(tmp_path, monkeypatch):
    monkeypatch.delenv("PYGAT_ALLOW_DOWNLOAD", raising=False)

    def fetch(url, path):  # pragma: no cover - must never run
        raise AssertionError("network touched while downloads disabled")

    assert not ensure_ppi_download(str(tmp_path), _fetch=fetch)


class _FakeDGL:
    """dgl stand-in exposing exactly what export_dgl touches."""

    class _Graph:
        def __init__(self, n, feat_dim, n_cls):
            import torch

            rng = np.random.default_rng(0)
            src = np.arange(n, dtype=np.int64)
            dst = (src + 1) % n
            self._edges = (torch.as_tensor(src), torch.as_tensor(dst))
            self._n = n
            tm = np.zeros(n, bool)
            tm[: n // 2] = True
            vm = np.zeros(n, bool)
            vm[n // 2: 3 * n // 4] = True
            sm = ~(tm | vm)
            self.ndata = {
                "feat": torch.as_tensor(
                    rng.standard_normal((n, feat_dim)).astype(np.float32)),
                "label": torch.as_tensor(
                    rng.integers(0, n_cls, n).astype(np.int64)),
                "train_mask": torch.as_tensor(tm),
                "val_mask": torch.as_tensor(vm),
                "test_mask": torch.as_tensor(sm),
            }

        def edges(self):
            return self._edges

        def num_nodes(self):
            return self._n

    class _Dataset:
        def __init__(self, transform=None):
            assert transform is not None  # AddSelfLoop must be requested

        def __getitem__(self, i):
            return _FakeDGL._Graph(40, 16, 6)

    def __init__(self):
        import types

        self.data = types.SimpleNamespace(
            CiteseerGraphDataset=self._Dataset,
            PubmedGraphDataset=self._Dataset,
            CoraGraphDataset=self._Dataset,
        )

    @staticmethod
    def AddSelfLoop():
        return object()


def test_export_dgl_mocked(tmp_path):
    import torch

    out = tmp_path / "citeseer_dgl"
    info = export_dgl("citeseer", str(out), _dgl=_FakeDGL(), _torch=torch)
    assert info["nodes"] == 40 and info["edges"] == 40
    for f in ("features.pt", "labels.pt", "idx_train.pt", "idx_val.pt",
              "idx_test.pt", "adj_sparse.npz"):
        assert (out / f).exists()
    feats = torch.load(out / "features.pt", weights_only=False)
    assert tuple(feats.shape) == (40, 16)
    adj = sp.load_npz(out / "adj_sparse.npz")
    assert adj.shape == (40, 40) and adj.nnz == 40


def test_export_dgl_without_dgl_raises(tmp_path):
    with pytest.raises((RuntimeError, ValueError)):
        export_dgl("citeseer", str(tmp_path / "x"))

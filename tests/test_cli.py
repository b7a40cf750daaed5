"""CLI smoke tests: the reference's public interface is the shell command
line (SURVEY §1 L5); these drive the real entry points end-to-end on the
CPU mesh with tiny epoch budgets."""

import io
import json
import os
from contextlib import redirect_stdout

import numpy as np


def test_train_cli_smoke(tmp_path):
    from pygat_tpu.cli.train import main

    out = io.StringIO()
    with redirect_stdout(out):
        rc = main([
            "--dataset", "cora", "--model", "GAT_sparse", "--epochs", "3",
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--jsonl", str(tmp_path / "m.jsonl"),
        ])
    assert rc == 0
    text = out.getvalue()
    # reference-format lines (train.py:172-177, 187-189)
    assert "Epoch: 0001 loss_train:" in text
    assert "Test set results: loss=" in text
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert sum(r["kind"] == "epoch" for r in recs) == 3
    assert any(r["kind"] == "test" for r in recs)


def test_train_cli_distributed_flag_is_single_host_noop(tmp_path):
    """--distributed on a single-process run: initialize_distributed sees no
    coordinator (ValueError narrowed to the documented case), reports
    single-host, and training proceeds unchanged (VERDICT r3 item 7)."""
    from pygat_tpu.cli.train import main

    out = io.StringIO()
    with redirect_stdout(out):
        rc = main([
            "--dataset", "cora", "--model", "GAT_sparse", "--epochs", "1",
            "--distributed", "--no-checkpoint",
        ])
    assert rc == 0
    text = out.getvalue()
    assert "distributed init: single-host" in text
    assert "Test set results" in text


def test_train_cli_epoch_chunk_and_reorder(tmp_path):
    from pygat_tpu.cli.train import main

    out = io.StringIO()
    with redirect_stdout(out):
        rc = main([
            "--dataset", "cora", "--model", "GATv2_sparse", "--epochs", "4",
            "--epoch-chunk", "2", "--reorder", "--no-checkpoint",
        ])
    assert rc == 0
    assert "Test set results" in out.getvalue()


# NOTE: no real-data PPI CLI test here — compiling the scan-over-batches
# program at real PPI sizes takes >8 min on the CPU mesh. The scanned
# inductive loop is pinned by tests/test_ppi.py::test_inductive_fast_matches_classic
# on tiny graphs and was validated end-to-end on the TPU
# (`python -m pygat_tpu.cli.train_ppi --epoch-scan`, see RESULTS.md).


def test_debug_cli_dumps_graph(tmp_path):
    from pygat_tpu.utils.debug import main

    prefix = str(tmp_path / "g")
    out = io.StringIO()
    with redirect_stdout(out):
        rc = main(["--dataset", "cora", "--model", "GAT_sparse",
                   "--out", prefix])
    assert rc == 0
    jaxpr = open(prefix + ".jaxpr.txt").read()
    hlo = open(prefix + ".hlo.txt").read()
    assert "lambda" in jaxpr or "let" in jaxpr
    # unoptimized lowering is StableHLO text; optimized is classic HLO
    assert "HloModule" in hlo or "module @jit" in hlo
    assert "primitive histogram" in out.getvalue()


def test_train_cli_mesh_matches_unsharded(tmp_path):
    """--mesh D,M trains SPMD over the CPU mesh and reproduces the
    unsharded run's losses (VERDICT r1 item 4)."""
    from pygat_tpu.cli.train import main

    losses = {}
    for tag, extra in (("plain", []), ("mesh", ["--mesh", "4,2"])):
        jsonl = tmp_path / f"{tag}.jsonl"
        out = io.StringIO()
        with redirect_stdout(out):
            rc = main([
                "--dataset", "cora", "--model", "GAT_sparse", "--epochs", "3",
                "--no-checkpoint", "--jsonl", str(jsonl), *extra,
            ])
        assert rc == 0
        recs = [json.loads(l) for l in open(jsonl) if json.loads(l)["kind"] == "epoch"]
        losses[tag] = [(r["loss_train"], r["loss_val"]) for r in recs]
    np.testing.assert_allclose(losses["mesh"], losses["plain"],
                               rtol=1e-4, atol=1e-5)


def test_train_ppi_cli_mesh_flag_guard():
    from pygat_tpu.cli.train_ppi import main

    try:
        main(["--mesh", "2,1", "--epochs", "1"])
        raise AssertionError("expected SystemExit")
    except SystemExit as e:
        assert "--epoch-scan" in str(e)

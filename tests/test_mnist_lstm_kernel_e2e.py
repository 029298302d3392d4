"""End-to-end tests of the fused-kernel LSTM experiment path.

The round-4 flagship artifact (the 1M-step kernel-path LSTM PMP cell,
``mnist --lstm-kernel true``) runs through ``pmpx.experiments.mnist.run``
with chunked resume and a protocol sidecar carrying ``lstm_kernel``.
The kernel itself is oracle-tested in ``test_lstm_kernel.py``; these
tests pin the *driver* contract: the kernel path runs end to end,
resumes from its own prefix rungs, and is never spliced onto an
XLA-path prefix (different density rounding — reference protocol
anchor: ``complex_nets/Mnist/LSTM/PMP_LSTM.py``'s single continuous
chain).
"""

import json
import os

import numpy as np

from pmpx.experiments import mnist

KW = dict(
    model="LSTM", algo="pmp", n_train=64, n_test=32,
    pretrain_steps=2, chunk_steps=4, resume=True,
)


def _sidecar(out_dir):
    paths = [p for p in os.listdir(out_dir) if p.endswith(".protocol.json")]
    out = {}
    for p in paths:
        with open(os.path.join(out_dir, p)) as f:
            out[p] = json.load(f)
    return out


def test_kernel_path_runs_and_resumes_own_prefix(tmp_path, capsys):
    out_dir = str(tmp_path)
    r8 = mnist.run(num_steps=8, lstm_kernel=True, out_dir=out_dir, **KW)
    assert np.isfinite(r8["loss_last"])
    # the sidecar pins the kernel path as a protocol field
    sides = _sidecar(out_dir)
    stem8 = [s for s in sides if "_8LSTM" in s][0]
    assert sides[stem8]["lstm_kernel"] is True

    capsys.readouterr()
    r12 = mnist.run(num_steps=12, lstm_kernel=True, out_dir=out_dir, **KW)
    assert "adopted 8-step prefix run" in capsys.readouterr().out
    assert np.isfinite(r12["loss_last"])
    loss12 = np.load(os.path.join(
        out_dir, [f for f in os.listdir(out_dir)
                  if f.endswith(".loss.npy") and "_12LSTM" in f][0]))
    assert len(loss12) == 12


def test_kernel_path_mh_and_mp_cells_run(tmp_path):
    """The r5 ladder's MH/MP kernel-path cells (``--lstm-kernel true
    --algo {mh,mp}``): the fused density must serve every sampler the
    reference's LSTM grid uses (``complex_nets/Mnist/LSTM/{MH,MP}_LSTM.py``),
    not just PMP — MH evaluates it at P=2, MP at the flat N+1 set."""
    out_dir = str(tmp_path)
    for algo in ("mh", "mp"):
        kw = dict(KW, algo=algo)
        r = mnist.run(num_steps=8, lstm_kernel=True, out_dir=out_dir, **kw)
        assert np.isfinite(r["loss_last"])
    sides = _sidecar(out_dir)
    stems = sorted(sides)
    assert any(s.startswith("MH_") for s in stems)
    assert any(s.startswith("MP_") for s in stems)
    assert all(sides[s]["lstm_kernel"] is True for s in stems)


def test_kernel_run_never_splices_onto_xla_prefix(tmp_path, capsys):
    out_dir = str(tmp_path)
    mnist.run(num_steps=8, out_dir=out_dir, **KW)  # XLA-path prefix
    capsys.readouterr()
    r = mnist.run(num_steps=12, lstm_kernel=True, out_dir=out_dir, **KW)
    # the XLA sidecar (no lstm_kernel key) must be a hard skip
    assert "adopted" not in capsys.readouterr().out
    assert np.isfinite(r["loss_last"])
    loss12 = np.load(os.path.join(
        out_dir, [f for f in os.listdir(out_dir)
                  if f.endswith(".loss.npy") and "_12LSTM" in f][0]))
    assert len(loss12) == 12

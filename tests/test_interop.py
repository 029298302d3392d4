"""Torch checkpoint import (the reference's warm-start .pkl files) and
trace-conversion CLI."""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pmpx.data import load_mnist
from pmpx.interop import theta_from_torch_state
from pmpx.models import MnistMLP
from pmpx.targets.nn import NNPosterior


def test_torch_mlp_state_roundtrip():
    """A torch MLP's weights land in the right flax slots: outputs match."""
    tnet = torch.nn.Sequential(
        torch.nn.Flatten(),
        torch.nn.Linear(784, 32),
        torch.nn.ReLU(),
        torch.nn.Linear(32, 10),
    )
    x_tr, y_tr, _, _ = load_mnist(n_train=32, n_test=8)
    post = NNPosterior(
        MnistMLP(widths=(32,)), x_tr, y_tr, init_key=jax.random.key(0)
    )
    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    theta = theta_from_torch_state(post, state)
    # flax forward with imported weights == torch forward
    got = np.asarray(post._logits(theta, x_tr))
    with torch.no_grad():
        want = tnet(torch.tensor(np.asarray(x_tr))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cli_convert_trace(tmp_path):
    from pmpx import runtime

    p = str(tmp_path / "t.pmpx")
    w = runtime.TraceWriter(p, width=2)
    for i in range(4):
        w.append(np.array([i, -i], np.float32))
    w.close()
    r = subprocess.run(
        [
            sys.executable, "-c",
            "import os; os.environ['JAX_PLATFORMS']='cpu';"
            "import sys; from pmpx.cli import main;"
            "sys.exit(main(sys.argv[1:]))",
            "convert", p,
        ],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout[r.stdout.index("{"):])
    arr = np.load(out["out"])
    assert arr.shape == (4, 2)

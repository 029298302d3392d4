"""Chain-level bf16 fidelity study (VERDICT r4 #4).

``nn_perf.bf16_chain`` pairs two paper-protocol MNIST-CNN chains — f32
vs bf16 compute, same pretrained start, same key stream — and reports
chain statistics (move rate, tail-loss ESS, final accuracy).  The tiny
CPU run here exercises the machinery; the committed TPU artifact under
``artifacts/bf16_fidelity`` carries the measured bound the README's
bf16 rows cite, and its numbers are asserted below whenever present.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "bf16_fidelity",
)


@pytest.mark.parametrize("algo", ["mh", "pmp"])
def test_bf16_chain_machinery(tmp_path, algo):
    from pmpx.experiments.nn_perf import bf16_chain

    res = bf16_chain(
        algo=algo, num_steps=20, chunk=10, n_train=96, n_test=32,
        pretrain_steps=5, out_dir=str(tmp_path),
    )
    for d in ("f32", "bf16"):
        assert 0.0 <= res[d]["move_rate"] <= 1.0
        assert np.isfinite(res[d]["loss_mean_tail"])
        assert res[d]["ess_loss_tail"] > 0
    fd = res["first_divergence_step"]
    assert fd is None or (isinstance(fd, int) and 0 <= fd < 20)
    out = json.load(open(tmp_path / f"bf16_chain_{algo}.json"))
    assert out["gaps"].keys() == {
        "move_rate", "loss_mean_tail", "train_acc", "test_acc"
    }
    npz = np.load(tmp_path / f"bf16_chain_{algo}.npz")
    assert npz["loss_f32"].shape == npz["loss_bf16"].shape == (20,)


def test_bf16_fidelity_artifact_bound():
    """The production bf16 rows claim chain-statistic parity with f32;
    the committed paper-scale artifact must actually bound the gaps."""
    path = os.path.join(ART, "bf16_chain_mh.json")
    if not os.path.exists(path):
        pytest.skip("paper-scale bf16 fidelity artifact not yet recorded")
    res = json.load(open(path))
    assert res["protocol"]["num_steps"] >= 10000, "must be paper-scale"
    assert abs(res["gaps"]["move_rate"]) < 0.05
    assert abs(res["gaps"]["test_acc"]) < 0.03
    # tail loss levels agree to a few percent of the f32 level
    rel = abs(res["gaps"]["loss_mean_tail"]) / (
        abs(res["f32"]["loss_mean_tail"]) + 1e-12
    )
    assert rel < 0.10

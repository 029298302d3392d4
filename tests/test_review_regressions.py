"""Regression tests for the code-review findings (round 1 review pass)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx import PMPConfig, Tempered
from pmpx.checkpoint import load_checkpoint, save_checkpoint
from pmpx.samplers import pmp
from pmpx.samplers.stabilize import stabilize_logits
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg
from pmpx.tree import binary_depth


def test_nan_guard_keeps_minus_inf():
    """-inf = probability zero; the guard must not resurrect such nodes."""
    logA = jnp.array([-0.1, -jnp.inf, -3.0])
    out = np.asarray(stabilize_logits(logA, "none", nan_guard=True))
    assert out[1] == -np.inf
    # NaN and +inf still sanitized to logit 0
    logA2 = jnp.array([jnp.nan, jnp.inf, -1.0])
    out2 = np.asarray(stabilize_logits(logA2, "none", nan_guard=True))
    assert out2[0] == 0.0 and out2[1] == 0.0 and out2[2] == -1.0


@pytest.mark.parametrize("N,depth", [(2, 4), (5, 3), (6, 3)])
def test_linreg_sweep_accepts_non_pow2_trees(N, depth):
    """P = 81 / 216 / 343 speculative states must evaluate (padding fix)."""
    x, y = make_synthetic_linreg(jax.random.key(0), 1024)
    t = BayesLinReg(x, y, method="xla")
    cfg = PMPConfig(N=N, depth=depth, step_size=0.05)
    superstep = pmp.make_superstep(t, cfg)
    th, out = jax.jit(superstep)(
        jax.random.key(1), jnp.array([0.0, 0.0, 1.0], jnp.float32)
    )
    assert np.isfinite(np.asarray(out["log_accept"])).all()
    # padded values agree with suffstats
    ts = BayesLinReg(x, y, method="suffstats")
    Theta = jax.random.normal(jax.random.key(2), (cfg.P, 3)) * 0.2 + jnp.array(
        [0.0, 0.0, 1.0]
    )
    np.testing.assert_allclose(
        np.asarray(t.log_prob_batch(Theta)),
        np.asarray(ts.log_prob_batch(Theta)),
        rtol=2e-3,
    )


def test_tempered_forwards_rng():
    from pmpx.data import load_mnist
    from pmpx.models import BayesMLP
    from pmpx.targets.nn import NNPosterior

    x_tr, y_tr, _, _ = load_mnist(n_train=64, n_test=16)
    inner = NNPosterior(
        BayesMLP(hidden=8), x_tr, y_tr,
        init_key=jax.random.key(0), stochastic=True,
    )
    t = Tempered(inner, beta=0.5)
    assert t.needs_rng
    th = inner.init_theta()
    a = float(t.log_prob(th, key=jax.random.key(1)))
    b = float(inner.log_prob(th, key=jax.random.key(1)))
    assert np.isclose(a, 0.5 * b)
    from pmpx.samplers.base import batch_log_prob

    vals = batch_log_prob(t, th[None, :], key=jax.random.key(2))
    assert np.isfinite(np.asarray(vals)).all()
    v, g = t.value_and_grad_batch(th[None, :], key=jax.random.key(3))
    assert np.isfinite(np.asarray(g)).all()


def test_checkpoint_path_no_suffix_surprise(tmp_path):
    p = str(tmp_path / "ck")  # no .npz extension
    ret = save_checkpoint(
        p, jnp.zeros((2,)), jax.random.key(0), 5
    )
    assert ret == p
    theta, key, step, _ = load_checkpoint(ret)
    assert step == 5


def test_binary_depth_validation():
    assert binary_depth(8) == 3
    with pytest.raises(ValueError):
        binary_depth(7)
    from pmpx.experiments import mnist

    with pytest.raises(ValueError):
        mnist.run(model="FC", algo="pmp", N=6, num_steps=1,
                  n_train=32, n_test=8, pretrain_steps=0)


def test_interop_natural_sort():
    import re
    from pmpx.interop import theta_from_torch_state  # noqa: F401

    # the sort key used internally: Dense_2 before Dense_10
    names = ["Dense_0", "Dense_10", "Dense_2", "Dense_1"]

    def natural(name):
        m = re.match(r"(.*?)_(\d+)$", name)
        return (m.group(1), int(m.group(2))) if m else (name, -1)

    assert sorted(names, key=natural) == [
        "Dense_0", "Dense_1", "Dense_2", "Dense_10",
    ]


def test_read_floats_fallback_handles_commas(tmp_path, monkeypatch):
    from pmpx import runtime

    p = tmp_path / "c.csv"
    p.write_text("1.0,2.5, 3.25\n4.0")
    monkeypatch.setattr(runtime, "_load", lambda: None)
    got = runtime.read_floats(str(p))
    np.testing.assert_allclose(got, [1.0, 2.5, 3.25, 4.0])

"""Bayesian linreg target: kernel strategies agree and the posterior samples
recover the generative parameters (the reference validates this only by
eyeballing trace plots, SURVEY.md §4 "parameter recovery")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx import PMPConfig, Tempered, run_chain
from pmpx.kernels.linreg import batched_rss, batched_rss_xla
from pmpx.samplers import pmp
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg, pad_to_grid


def test_rss_strategies_agree():
    key = jax.random.key(0)
    x, y = make_synthetic_linreg(key, 5000)
    t_xla = BayesLinReg(x, y, method="xla")
    t_ss = BayesLinReg(x, y, method="suffstats")
    t_fu = BayesLinReg(x, y, method="fused")
    Theta = jax.random.normal(jax.random.key(1), (32, 3)) * 0.5 + jnp.array(
        [0.0, 0.0, 1.0]
    )
    a = np.asarray(t_xla.log_prob_batch(Theta))
    b = np.asarray(t_ss.log_prob_batch(Theta))
    c = np.asarray(t_fu.log_prob_batch(Theta))
    np.testing.assert_allclose(a, b, rtol=2e-4)
    np.testing.assert_allclose(c, b, rtol=2e-4)


def test_rss_pallas_interpret_matches_xla():
    """Pallas kernel in interpreter mode == XLA sweep (CPU CI check; the
    compiled-TPU path is exercised by bench.py on hardware)."""
    key = jax.random.key(2)
    x, y = make_synthetic_linreg(key, 3000)
    x2d, y2d = pad_to_grid(x), pad_to_grid(y)
    b0 = jax.random.normal(jax.random.key(3), (32,))
    b1 = jax.random.normal(jax.random.key(4), (32,))
    a = np.asarray(batched_rss(b0, b1, x2d, y2d, interpret=True))
    b = np.asarray(batched_rss_xla(b0, b1, x2d, y2d))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_rss_oracle_small():
    """Tiny case vs. a literal numpy loop."""
    x = jnp.asarray(np.linspace(-1, 1, 7), jnp.float32)
    y = jnp.asarray(np.linspace(2, -1, 7), jnp.float32)
    x2d, y2d = pad_to_grid(x), pad_to_grid(y)
    b0 = jnp.asarray([0.5, -0.25] * 8)
    b1 = jnp.asarray([1.0, 2.0] * 8)
    got = np.asarray(batched_rss_xla(b0, b1, x2d, y2d))
    xn, yn = np.asarray(x), np.asarray(y)
    pad = x2d.size - 7  # each padded zero point contributes b0^2
    for p in range(16):
        want = np.sum((yn - float(b0[p]) - float(b1[p]) * xn) ** 2)
        want += pad * float(b0[p]) ** 2
        np.testing.assert_allclose(got[p], want, rtol=1e-4)


def test_nonmultiple_of_16_batch():
    key = jax.random.key(5)
    x, y = make_synthetic_linreg(key, 1000)
    t = BayesLinReg(x, y, method="xla")
    Theta = jax.random.normal(jax.random.key(6), (5, 3))
    out = t.log_prob_batch(Theta)
    assert out.shape == (5,)
    t2 = BayesLinReg(x, y, method="suffstats")
    # f32 sweep vs. suffstats cancellation: ~4e-4 relative is expected
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(t2.log_prob_batch(Theta)), rtol=2e-3
    )


@pytest.mark.parametrize("method", ["xla", "suffstats"])
def test_pmp_recovers_generative_parameters(method):
    """Posterior concentrates near (beta0, beta1, |sigma|) = (-1, 2, 0.5)
    (lb.py:12-14 ground truth; reference checks this visually via lb.pdf)."""
    key = jax.random.key(7)
    x, y = make_synthetic_linreg(key, 2000)
    target = BayesLinReg(x, y, temper=1.0, method=method)
    cfg = PMPConfig(N=3, depth=2, step_size=0.02, selection="all_uniform")
    superstep = pmp.make_superstep(target, cfg)
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    _, recs = jax.jit(
        lambda k, t: run_chain(superstep, k, t, 1500)
    )(jax.random.key(8), theta0)
    s = np.asarray(recs["samples"]).reshape(-1, 3)
    tail = s[len(s) // 2 :]
    assert abs(tail[:, 0].mean() + 1.0) < 0.1
    assert abs(tail[:, 1].mean() - 2.0) < 0.1
    assert abs(np.abs(tail[:, 2]).mean() - 0.5) < 0.1

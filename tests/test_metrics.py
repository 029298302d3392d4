"""Metrics: analytic oracles for ESS/MSJD/skewness/R-hat."""

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.metrics import (
    autocov,
    ess,
    ess_per_dim,
    move_rate,
    msjd,
    skewness,
    split_rhat,
)


def test_autocov_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=500).astype(np.float32)
    got = np.asarray(autocov(jnp.asarray(x)))
    xc = x - x.mean()
    want = np.array(
        [np.sum(xc[: 500 - k] * xc[k:]) / 500 for k in range(500)]
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ess_iid_near_n():
    x = jax.random.normal(jax.random.key(0), (20000,))
    e = float(ess(x))
    assert 0.75 * 20000 < e <= 20000


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient a has tau = (1+a)/(1-a)."""
    a = 0.9
    n = 100000
    eps = np.random.default_rng(1).normal(size=n)
    x = np.empty(n)
    x[0] = eps[0]
    for i in range(1, n):
        x[i] = a * x[i - 1] + eps[i]
    e = float(ess(jnp.asarray(x, jnp.float32)))
    want = n * (1 - a) / (1 + a)
    assert 0.6 * want < e < 1.6 * want


def test_ess_per_dim_shapes():
    X = jax.random.normal(jax.random.key(2), (5000, 3))
    e = ess_per_dim(X)
    assert e.shape == (3,)
    assert float(e.min()) > 2000


def test_msjd_iid_gaussian():
    """iid N(0, I_d): E||x' - x||^2 = 2d."""
    X = jax.random.normal(jax.random.key(3), (50000, 4))
    got = float(msjd(X))
    assert abs(got - 8.0) < 0.3


def test_skewness_symmetric_and_skewed():
    x = jax.random.normal(jax.random.key(4), (100000,))
    assert abs(float(skewness(x))) < 0.05
    y = jnp.exp(x)  # lognormal: strongly right-skewed
    assert float(skewness(y)) > 1.0


def test_move_rate():
    r = jnp.array([[0.0], [0.0], [1.0], [1.0], [2.0]])
    assert abs(float(move_rate(r)) - 0.5) < 1e-6


def test_split_rhat_mixed_vs_stuck():
    k = jax.random.key(5)
    good = jax.random.normal(k, (4, 4000))
    assert abs(float(split_rhat(good)) - 1.0) < 0.02
    # chains at different levels -> large R-hat
    bad = good + jnp.arange(4.0)[:, None] * 3.0
    assert float(split_rhat(bad)) > 1.5


def test_autocov_chunked_matches_full():
    """Overlap-save chunked autocov == full-FFT autocov exactly (same
    biased estimator), across block boundaries and short max_lag."""
    from pmpx.metrics import autocov, autocov_chunked

    x = np.asarray(jax.random.normal(jax.random.key(6), (5000,)))
    x = np.cumsum(x) * 0.1 + x  # correlated series
    full = np.asarray(autocov(jnp.asarray(x, jnp.float64)))
    for block in (256, 1024, 1 << 16):
        got = autocov_chunked(x, max_lag=300, block=block)
        # the jax path computes in f32 (x64 off) — compare at f32 level;
        # chunked-vs-chunked across block sizes must agree to f64
        np.testing.assert_allclose(got, full[:301], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        autocov_chunked(x, max_lag=300, block=256),
        autocov_chunked(x, max_lag=300, block=1 << 16),
        rtol=1e-12, atol=1e-14,
    )


def test_ess_chunked_matches_ess():
    """Chunked Geyer ESS == device full-FFT ESS, including when the
    initial window is too small and must adaptively double."""
    from pmpx.metrics import ess, ess_chunked

    k = jax.random.key(7)
    # AR(1) with strong correlation: truncation lag >> 8, forcing growth
    e = np.asarray(jax.random.normal(k, (20000,)), np.float64)
    x = np.empty_like(e)
    x[0] = e[0]
    for i in range(1, len(e)):
        x[i] = 0.95 * x[i - 1] + e[i]
    want = float(ess(jnp.asarray(x, jnp.float64)))
    got = ess_chunked(x, max_lag=8, block=512)
    assert abs(got - want) / want < 1e-6
    # iid series: truncates immediately inside the first window
    want2 = float(ess(jnp.asarray(e, jnp.float64)))
    got2 = ess_chunked(e)
    assert abs(got2 - want2) / want2 < 1e-6

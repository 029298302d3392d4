"""Statistical exactness tests: the samplers must leave their targets invariant.

The reference validates correctness only by eyeballing committed plots
(SURVEY.md §4); here exactness is asserted with moment tolerances and KS
tests against the known targets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from pmpx import MHConfig, MPConfig, PMPConfig, run_chain
from pmpx.samplers import mh, mp, pmp
from pmpx.targets import Banana, Gaussian1D


def _chain_samples(make, target, cfg, steps, seed, theta0=None, burn=0.3):
    superstep = make(target, cfg)
    key = jax.random.key(seed)
    if theta0 is None:
        theta0 = jnp.zeros((target.d,), jnp.float32)
    _, recs = jax.jit(
        lambda k, t: run_chain(superstep, k, t, steps)
    )(key, theta0)
    x = np.asarray(recs["samples"])  # (steps, P, d)
    x = x.reshape(-1, target.d)
    return x[int(burn * len(x)):]


@pytest.mark.parametrize("rule", ["metropolis", "barker"])
def test_mh_gaussian_moments(rule):
    target = Gaussian1D(mu=0.0, sigma=1.0)
    s = _chain_samples(
        mh.make_superstep, target, MHConfig(step_size=1.0, rule=rule),
        20000, 0,
    )
    assert abs(s.mean()) < 0.08
    assert abs(s.std() - 1.0) < 0.08


def test_mp_gaussian_moments_and_ks():
    target = Gaussian1D()
    s = _chain_samples(
        mp.make_superstep, target, MPConfig(N=7, step_size=1.0),
        4000, 1,
    )
    assert abs(s.mean()) < 0.12
    assert abs(s.std() - 1.0) < 0.1
    # thin to de-correlate, then KS against N(0,1)
    ks = stats.kstest(s[:: 40, 0], "norm")
    assert ks.pvalue > 0.01, ks


@pytest.mark.parametrize(
    "N,depth", [(1, 3), (3, 2), (7, 2)],
)
def test_pmp_gaussian_moments(N, depth):
    target = Gaussian1D()
    s = _chain_samples(
        pmp.make_superstep, target,
        PMPConfig(N=N, depth=depth, step_size=1.0),
        3000, 2,
    )
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.1


def test_pmp_single_selection_gaussian():
    target = Gaussian1D()
    s = _chain_samples(
        pmp.make_superstep, target,
        PMPConfig(N=1, depth=3, step_size=0.8, selection="single"),
        20000, 3,
    )
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.1


def test_pmp_banana_moments():
    # E[x1]=0; E[x2] = b*(E[x1^2]-a) = 2*(1-5) = -8
    target = Banana()
    s = _chain_samples(
        pmp.make_superstep, target,
        PMPConfig(N=3, depth=2, step_size=0.7),
        20000, 4,
        theta0=jnp.array([0.0, -8.0], jnp.float32),
    )
    # banana mixing is slow for isotropic RW; tolerances are wide and the
    # sharp exactness guarantees come from the Gaussian + oracle tests
    assert abs(s[:, 0].mean()) < 0.3
    assert abs(s[:, 1].mean() + 8.0) < 1.6
    assert abs(s[:, 0].std() - 1.0) < 0.25
    # std of x2: var = 1 + b^2 * var(x1^2) = 1 + 4*2 = 9
    assert abs(s[:, 1].std() - 3.0) < 1.3


@pytest.mark.parametrize(
    "cfg",
    [
        PMPConfig(N=7, depth=1, step_size=1.0, selection="single"),
        PMPConfig(N=1, depth=3, step_size=1.0, selection="single"),
        PMPConfig(N=3, depth=2, step_size=1.0, selection="single"),
    ],
    ids=["mp", "binary-pmp", "general-pmp"],
)
def test_one_superstep_invariance(cfg):
    """Stationarity: chains started AT the target stay AT the target after
    one superstep (KS test over many parallel chains) — the sharp exactness
    property behind the reference's error-boxplot validation."""
    target = Gaussian1D()
    superstep = pmp.make_superstep(target, cfg)
    C = 50000
    x0 = jax.random.normal(jax.random.key(0), (C, 1))
    keys = jax.random.split(jax.random.key(1), C)
    x1 = jax.jit(jax.vmap(lambda k, x: superstep(k, x)[0]))(keys, x0)
    ks = stats.kstest(np.asarray(x1).ravel(), "norm")
    assert ks.pvalue > 0.01, ks


def test_resampling_follows_weights():
    """Categorical draws match the stabilized weights (chi-square)."""
    key = jax.random.key(0)
    logits = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    draws = jax.random.categorical(key, logits, shape=(20000,))
    counts = np.bincount(np.asarray(draws), minlength=4)
    chi = stats.chisquare(counts, f_exp=20000 * np.array([0.1, 0.2, 0.3, 0.4]))
    assert chi.pvalue > 0.01


def test_bitwise_reproducible():
    target = Gaussian1D()
    cfg = PMPConfig(N=3, depth=2, step_size=0.5)
    superstep = pmp.make_superstep(target, cfg)
    key = jax.random.key(7)
    t0 = jnp.zeros((1,), jnp.float32)
    f = jax.jit(lambda k, t: run_chain(superstep, k, t, 50))
    a = f(key, t0)
    b = f(key, t0)
    np.testing.assert_array_equal(
        np.asarray(a[1]["samples"]), np.asarray(b[1]["samples"])
    )

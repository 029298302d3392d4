"""HMC sampler family: leapfrog correctness and statistical behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx import run_chain
from pmpx.samplers import hmc
from pmpx.samplers.hmc import HMCConfig, MPHMCConfig, PMPHMCConfig
from pmpx.targets import Gaussian1D, StandardMVN


def _samples(target, cfg, steps, seed, burn=0.3):
    superstep = hmc.make_superstep(target, cfg)
    key = jax.random.key(seed)
    theta0 = jnp.zeros((target.d,), jnp.float32)
    _, recs = jax.jit(lambda k, t: run_chain(superstep, k, t, steps))(
        key, theta0
    )
    s = np.asarray(recs["samples"]).reshape(-1, target.d)
    return s[int(burn * len(s)) :]


def test_leapfrog_energy_conservation():
    """Small-step leapfrog on an isotropic Gaussian conserves H to O(eps^2)."""
    target = StandardMVN(d=4)
    vg = hmc._value_and_grad_batch(target)
    theta = jnp.array([[1.0, -0.5, 0.3, 2.0]])
    p = jnp.array([[0.4, 0.1, -0.7, 0.2]])
    lp0, _ = vg(theta, None)
    h0 = lp0[0] - 0.5 * jnp.sum(p * p)
    th, pp = theta, p
    for _ in range(100):
        th, pp, lp, _ = hmc._leapfrog(vg, th, pp, 0.01, jax.random.key(0))
    h1 = lp[0] - 0.5 * jnp.sum(pp * pp)
    assert abs(float(h1 - h0)) < 1e-3


def test_leapfrog_reversibility():
    target = StandardMVN(d=3)
    vg = hmc._value_and_grad_batch(target)
    theta = jnp.array([[0.5, -1.0, 0.2]])
    p = jnp.array([[0.3, 0.6, -0.1]])
    th, pp, _, _ = hmc._leapfrog(vg, theta, p, 0.1, jax.random.key(1))
    back, pb, _, _ = hmc._leapfrog(vg, th, -pp, 0.1, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(back), np.asarray(theta), atol=1e-5)
    np.testing.assert_allclose(np.asarray(-pb), np.asarray(p), atol=1e-5)


def test_sp_hmc_gaussian_moments():
    target = Gaussian1D()
    s = _samples(
        target,
        HMCConfig(step_size=0.5, mom_scale=1.0, num_leapfrog=5),
        8000,
        0,
    )
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.1


def test_pmp_hmc_depth1_barker_exact():
    """Depth-1 PMP-HMC with Barker rule is plain Barker-accept HMC: exact."""
    target = Gaussian1D()
    s = _samples(
        target,
        PMPHMCConfig(depth=1, step_size=0.5, mom_scale=1.0, rule="barker"),
        12000,
        1,
    )
    assert abs(s.mean()) < 0.08
    assert abs(s.std() - 1.0) < 0.08


@pytest.mark.parametrize("rule", ["barker", "mh_clamp", "barker_clamp"])
def test_pmp_hmc_tree_runs_all_rules(rule):
    target = StandardMVN(d=2)
    s = _samples(
        target,
        PMPHMCConfig(depth=3, step_size=0.4, mom_scale=1.0, rule=rule),
        4000,
        2,
    )
    assert np.isfinite(s).all()
    # clamped reference rules are heuristics; loose sanity bounds only
    assert abs(s.mean()) < 0.35
    assert 0.5 < s.std() < 1.5


def test_mp_hmc_trajectory_moments():
    target = Gaussian1D()
    s = _samples(
        target,
        MPHMCConfig(N=7, step_size=0.3, mom_scale=1.0),
        6000,
        3,
    )
    assert np.isfinite(s).all()
    assert abs(s.mean()) < 0.25
    assert 0.7 < s.std() < 1.3


def test_pmp_hmc_all_selection_emits_P():
    target = Gaussian1D()
    cfg = PMPHMCConfig(
        depth=2, step_size=0.3, selection="all_uniform"
    )
    superstep = hmc.make_superstep(target, cfg)
    _, recs = jax.jit(lambda k, t: run_chain(superstep, k, t, 10))(
        jax.random.key(4), jnp.zeros((1,), jnp.float32)
    )
    assert recs["samples"].shape == (10, 4, 1)

"""General-(N, depth) PMP-HMC speculation trees — oracle + exactness.

The reference's PMP-HMC is binary-only (``cifar_PMPhmc.py:114-171``);
pmpx generalizes it to N leapfrog children per node per level with a
per-sibling-group mixture-of-kernels acceptance.  Three layers of proof:

1. a NumPy *loop* oracle (dict-of-nodes, per-node per-level walk) must
   agree with the vectorized gather-free jax implementation on logA;
2. at N=1 the walk must reproduce the reference's ``judg``-decode pairwise
   factors (transcribed below from ``cifar_PMPhmc.py:83-102`` semantics);
3. one-superstep stationarity: chains started AT the target stay AT the
   target (the sharp exactness property) for N=3 trees under both rules.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from pmpx.samplers import hmc
from pmpx.samplers.hmc import PMPHMCConfig
from pmpx.targets import Gaussian1D, StandardMVN


def _sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


def oracle_pmp_hmc_logA(key, theta, N, depth, eps, mom_scale, rule):
    """Loop transcription of the general tree semantics: build the tree
    node-by-node with the same RNG stream, then walk every (node, level)
    pair computing the group decision masses with scalar math."""
    d = theta.shape[0]
    base = N + 1
    P = base**depth

    def logpdf(x):
        return float(-0.5 * np.dot(x, x))

    def grad(x):
        return -x

    k_mom, k_draw, k_root, k_t = jax.random.split(key, 4)
    mom_keys = jax.random.split(k_mom, depth)

    Y = {0: np.asarray(theta, np.float32)}
    lp = {0: logpdf(Y[0])}
    ke_i, ke_f = {}, {}
    for i in range(depth):
        temp = base**i
        p0 = mom_scale * np.asarray(
            jax.random.normal(mom_keys[i], (N * temp, d), jnp.float32)
        )
        for j in range(N):
            for k in range(temp):
                row = j * temp + k
                idx = (j + 1) * temp + k
                p_half = p0[row] + 0.5 * eps * grad(Y[k])
                y = Y[k] + eps * p_half
                p_fin = p_half + 0.5 * eps * grad(y)
                Y[idx] = y
                lp[idx] = logpdf(y)
                ke_i[idx] = 0.5 * float(np.dot(p0[row], p0[row]))
                ke_f[idx] = 0.5 * float(np.dot(p_fin, p_fin))

    logA = np.zeros(P)
    for x in range(P):
        for c in range(depth):
            temp = base**c
            h = x % temp
            m = (x // temp) % base
            a = []
            for j in range(1, base):
                ch = j * temp + h
                dh = (lp[ch] - ke_f[ch]) - (lp[h] - ke_i[ch])
                if rule == "barker":
                    a.append(_sigmoid(dh))
                else:  # mh_clamp / barker_clamp
                    a.append(min(1.0, math.exp(min(dh, 0.0))))
            if m == 0:
                logA[x] += math.log(max(1.0 - sum(a) / N, 1e-30))
            else:
                logA[x] += math.log(max(a[m - 1], 1e-30)) - math.log(N)
    return Y, logA


@pytest.mark.parametrize(
    "N,depth,rule",
    [
        (3, 2, "barker"),
        (3, 2, "mh_clamp"),
        (1, 3, "barker"),
        (2, 3, "mh_clamp"),
        (7, 1, "barker"),
    ],
)
def test_general_tree_matches_loop_oracle(N, depth, rule):
    d = 4
    target = StandardMVN(d=d)
    cfg = PMPHMCConfig(
        depth=depth, N=N, step_size=0.3, mom_scale=1.0, rule=rule,
        selection="single",
    )
    superstep = hmc.make_superstep(target, cfg)
    key = jax.random.key(42)
    theta = jnp.asarray(
        np.random.default_rng(1).normal(size=d), jnp.float32
    )
    _, out = superstep(key, theta)
    _, logA_oracle = oracle_pmp_hmc_logA(
        key, np.asarray(theta), N, depth, 0.3, 1.0, rule
    )
    np.testing.assert_allclose(
        np.asarray(out["log_accept"]), logA_oracle, rtol=2e-4, atol=2e-4
    )


def test_binary_matches_reference_judg_semantics():
    """At N=1 the general walk must equal the reference's judg-decode
    pairwise Barker factors (cifar_PMPhmc.py:83-102 semantics): for node x
    at level c, member = x & (2^(c+1)-1), partner = member ^ 2^c; the
    parent side of the edge carries the initial kinetic energy, the child
    side the evolved one."""
    d, D = 3, 3
    target = StandardMVN(d=d)
    cfg = PMPHMCConfig(
        depth=D, N=1, step_size=0.25, mom_scale=1.0, rule="barker",
        selection="single",
    )
    superstep = hmc.make_superstep(target, cfg)
    key = jax.random.key(5)
    theta = jnp.asarray([0.4, -0.2, 1.1], jnp.float32)
    _, out = superstep(key, theta)

    Y, _ = oracle_pmp_hmc_logA(key, np.asarray(theta), 1, D, 0.25, 1.0,
                               "barker")
    lp = {k: float(-0.5 * np.dot(v, v)) for k, v in Y.items()}
    P = 2**D
    logA_judg = np.zeros(P)
    # judg-decode walk over the oracle tree's Hamiltonian weights
    ke_i, ke_f = {}, {}
    k_mom, *_ = jax.random.split(key, 4)
    mom_keys = jax.random.split(k_mom, D)
    for i in range(D):
        temp = 2**i
        p0 = np.asarray(
            jax.random.normal(mom_keys[i], (temp, d), jnp.float32)
        )
        for k in range(temp):
            idx = temp + k
            p_half = p0[k] + 0.5 * 0.25 * (-Y[k])
            y = Y[k] + 0.25 * p_half
            p_fin = p_half + 0.5 * 0.25 * (-y)
            ke_i[idx] = 0.5 * float(np.dot(p0[k], p0[k]))
            ke_f[idx] = 0.5 * float(np.dot(p_fin, p_fin))
    for x in range(P):
        for c in range(D):
            member = x & (2 ** (c + 1) - 1)
            partner = member ^ (2**c)
            child = max(member, partner)
            lw_self = lp[member] - (
                ke_i[child] if member < partner else ke_f[child]
            )
            lw_other = lp[partner] - (
                ke_f[child] if member < partner else ke_i[child]
            )
            logA_judg[x] += lw_self - np.logaddexp(lw_self, lw_other)
    np.testing.assert_allclose(
        np.asarray(out["log_accept"]), logA_judg, rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("rule", ["barker", "mh_clamp"])
def test_general_n_one_superstep_invariance(rule):
    target = Gaussian1D()
    cfg = PMPHMCConfig(
        depth=2, N=3, step_size=0.5, mom_scale=1.0, rule=rule,
        selection="single",
    )
    superstep = hmc.make_superstep(target, cfg)
    C = 40000
    x0 = jax.random.normal(jax.random.key(0), (C, 1))
    keys = jax.random.split(jax.random.key(1), C)
    x1 = jax.jit(jax.vmap(lambda k, x: superstep(k, x)[0]))(keys, x0)
    ks = stats.kstest(np.asarray(x1).ravel(), "norm")
    assert ks.pvalue > 0.01, ks


def test_general_n_moves_the_chain():
    """Sanity: a general-N tree actually proposes and accepts moves."""
    from pmpx import run_chain

    target = StandardMVN(d=2)
    cfg = PMPHMCConfig(depth=2, N=3, step_size=0.4, selection="single")
    superstep = hmc.make_superstep(target, cfg)
    _, recs = jax.jit(
        lambda k, t: run_chain(superstep, k, t, 500)
    )(jax.random.key(2), jnp.zeros((2,), jnp.float32))
    s = np.asarray(recs["samples"]).reshape(-1, 2)
    assert np.unique(s[:, 0]).size > 100
    assert abs(s[250:, 0].mean()) < 0.3

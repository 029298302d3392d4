"""Tree topology vs. oracle re-implementations of the reference semantics.

The oracles below are independent NumPy transcriptions of the *algorithms*
documented in SURVEY.md §0 (the ``judg`` while-loop partner decoding of
``error.py:103-121`` and the per-level MTM walk of ``error.py:160-173``),
used to verify that the static index algebra in ``pmpx.tree`` reproduces the
reference behavior bit-exactly.
"""

import math

import numpy as np
import pytest

from pmpx import tree


def judg_oracle(node: int, c: int) -> int:
    """The reference's while-loop decode of a node's level-c group member.

    Transcribed semantics of ``error.py:103-113``: repeatedly strip the
    highest set bit of ``node`` until the value fits below 2**(c+1).
    """
    judg = node
    j = 2 ** (c + 1)
    deep = 0
    if judg > 0:
        deep = int(math.log2(judg))
    while judg > j - 1:
        if judg >= 2**deep:
            judg -= 2**deep
        deep -= 1
    return judg


@pytest.mark.parametrize("depth", [1, 2, 3, 5, 7, 10])
def test_binary_judg_decode(depth):
    topo = tree.topology(1, depth)
    for x in range(topo.P):
        for c in range(depth):
            judg = judg_oracle(x, c)
            # our decode: member = residue + digit * 2**c == x & (2**(c+1)-1)
            member = topo.residue[c, x] + topo.digits[c, x] * (2**c)
            assert member == judg == (x & (2 ** (c + 1) - 1))
            # partner in the Barker pair is the XOR sibling
            half = 2**c
            partner = judg + half if judg < half else judg - half
            assert partner == (member ^ half)


@pytest.mark.parametrize("N,depth", [(1, 3), (2, 2), (3, 2), (7, 2), (3, 3)])
def test_parents_match_generation_loop(N, depth):
    """Parent array vs. the reference generation loop (error.py:144-149)."""
    topo = tree.topology(N, depth)
    parent = np.zeros(topo.P, dtype=int)
    for dee in range(depth):
        temp = (N + 1) ** dee
        for j in range(N):
            for k in range(temp):
                parent[k + temp * (j + 1)] = k
    assert np.array_equal(parent, topo.parent)
    # creation level
    level = np.zeros(topo.P, dtype=int)
    for dee in range(depth):
        temp = (N + 1) ** dee
        for j in range(N):
            for k in range(temp):
                level[k + temp * (j + 1)] = dee
    assert np.array_equal(level, topo.level_of)


@pytest.mark.parametrize("N,depth", [(1, 4), (3, 2), (7, 2), (2, 3)])
def test_path_matrix_matches_sequential_generation(N, depth):
    """theta + path_matrix @ eps == the sequential per-level build."""
    rng = np.random.default_rng(0)
    topo = tree.topology(N, depth)
    d = 3
    theta = rng.normal(size=d)
    eps = rng.normal(size=(topo.P, d))
    eps[0] = 0.0
    # sequential reference-style build: child = parent + its own innovation
    Y = np.zeros((topo.P, d))
    Y[0] = theta
    for dee in range(depth):
        temp = (N + 1) ** dee
        for j in range(N):
            for k in range(temp):
                c = k + temp * (j + 1)
                Y[c] = Y[k] + eps[c]
    Y2 = theta[None, :] + topo.path_matrix @ eps
    np.testing.assert_allclose(Y2, Y, rtol=1e-6, atol=1e-6)


def norm_pdf(a, b, sigma=1.0):
    return np.exp(-0.5 * ((a - b) / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))


def oracle_general_logA(Y, pi, N, depth):
    """Per-level MTM walk oracle (error.py:160-173, intended semantics).

    Note: the reference's deeper-level broadcast (``error.py:171-173``) uses
    the modulus ``(N+1)*(i+1)`` where the tree arithmetic requires
    ``(N+1)**(i+1)``; the two agree for every configuration the reference
    actually runs (deep=2), and the intended power form is used here and in
    the framework.
    """
    P = (N + 1) ** depth
    A = np.ones(P)
    for i in range(depth):
        temp = (N + 1) ** i
        L = np.zeros((temp, N + 1))
        for h in range(temp):
            w_t = np.zeros(N + 1)
            for j in range(N + 1):
                w_t[j] = pi[h + j * temp]
                for k in range(N + 1):
                    if k != j:
                        w_t[j] *= norm_pdf(
                            Y[h + j * temp, 0], Y[h + k * temp, 0]
                        )
            for j in range(N + 1):
                L[h, j] = w_t[j] / w_t.sum()
        # every node x picks up the factor of its level-i ancestor group
        for x in range(P):
            h = x % temp
            c = (x // temp) % (N + 1)
            A[x] *= L[h, c]
    return np.log(A)


def oracle_binary_logA(Y, pi, depth):
    """Barker tree-walk oracle (error.py:102-121)."""
    P = 2**depth
    A = np.ones(P)
    for x in range(P):
        for c in range(depth):
            judg = judg_oracle(x, c)
            half = 2**c
            if judg < half:
                w_new = pi[judg] * norm_pdf(Y[judg, 0], Y[judg + half, 0])
                w_old = pi[judg + half] * norm_pdf(
                    Y[judg + half, 0], Y[judg, 0]
                )
            else:
                w_new = pi[judg] * norm_pdf(Y[judg, 0], Y[judg - half, 0])
                w_old = pi[judg - half] * norm_pdf(
                    Y[judg - half, 0], Y[judg, 0]
                )
            A[x] *= w_new / (w_new + w_old)
    return np.log(A)


@pytest.mark.parametrize("N,depth", [(1, 1), (1, 3), (2, 2), (3, 2), (7, 1)])
def test_log_accept_matches_general_oracle(N, depth):
    import jax.numpy as jnp
    from pmpx.samplers.pmp import log_accept_tree
    from pmpx.transition import GaussianRW

    rng = np.random.default_rng(1)
    topo = tree.topology(N, depth)
    Y = rng.normal(size=(topo.P, 1))
    pi = np.exp(rng.normal(size=topo.P))
    got = log_accept_tree(
        jnp.asarray(Y, jnp.float32),
        jnp.log(jnp.asarray(pi, jnp.float32)),
        topo,
        GaussianRW(sigma=1.0),
    )
    want = oracle_general_logA(Y, pi, N, depth)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_log_accept_matches_binary_barker_oracle(depth):
    import jax.numpy as jnp
    from pmpx.samplers.pmp import log_accept_tree
    from pmpx.transition import GaussianRW

    rng = np.random.default_rng(2)
    topo = tree.topology(1, depth)
    Y = rng.normal(size=(topo.P, 1))
    pi = np.exp(rng.normal(size=topo.P))
    got = log_accept_tree(
        jnp.asarray(Y, jnp.float32),
        jnp.log(jnp.asarray(pi, jnp.float32)),
        topo,
        GaussianRW(sigma=1.0),
    )
    want = oracle_binary_logA(Y, pi, depth)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_mp_is_depth_one_pmp():
    """Flat MTM weights: A_j = pi_j * prod_{k!=j} K(y_j, y_k)."""
    import jax.numpy as jnp
    from pmpx.samplers.pmp import log_accept_tree
    from pmpx.transition import GaussianRW

    rng = np.random.default_rng(3)
    N = 7
    topo = tree.topology(N, 1)
    Y = rng.normal(size=(N + 1, 2))
    pi = np.exp(rng.normal(size=N + 1))
    got = log_accept_tree(
        jnp.asarray(Y, jnp.float32),
        jnp.log(jnp.asarray(pi, jnp.float32)),
        topo,
        GaussianRW(sigma=1.0),
    )
    # raw MTM weights (conv_mp.cu:22-31 semantics), then normalize
    logw = np.zeros(N + 1)
    for j in range(N + 1):
        s = np.log(pi[j])
        for k in range(N + 1):
            if k != j:
                diff = Y[j] - Y[k]
                s += np.sum(-0.5 * np.log(2 * np.pi) - 0.5 * diff**2)
        logw[j] = s
    want = logw - np.log(np.exp(logw - logw.max()).sum()) - logw.max()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

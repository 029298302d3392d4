"""Proposal-axis chunking: identical values, bounded memory."""

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.data import load_mnist
from pmpx.models import BayesMLP, MnistMLP
from pmpx.targets.nn import NNPosterior


def test_chunked_matches_full_vmap():
    x_tr, y_tr, _, _ = load_mnist(n_train=64, n_test=16)
    full = NNPosterior(
        MnistMLP(widths=(16,)), x_tr, y_tr, init_key=jax.random.key(0)
    )
    chunked = NNPosterior(
        MnistMLP(widths=(16,)), x_tr, y_tr, init_key=jax.random.key(0),
        proposal_chunk=2,
    )
    Theta = full.init_theta()[None, :] + 0.01 * jax.random.normal(
        jax.random.key(1), (8, full.d)
    )
    np.testing.assert_allclose(
        np.asarray(full.log_prob_batch(Theta)),
        np.asarray(chunked.log_prob_batch(Theta)),
        rtol=1e-5,
    )
    v1, g1 = full.value_and_grad_batch(Theta)
    v2, g2 = chunked.value_and_grad_batch(Theta)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6
    )


def test_chunked_stochastic_matches():
    x_tr, y_tr, _, _ = load_mnist(n_train=64, n_test=16)
    kw = dict(init_key=jax.random.key(2), stochastic=True)
    full = NNPosterior(BayesMLP(hidden=8), x_tr, y_tr, **kw)
    chunked = NNPosterior(
        BayesMLP(hidden=8), x_tr, y_tr, proposal_chunk=2, **kw
    )
    Theta = full.init_theta()[None, :] + 0.01 * jax.random.normal(
        jax.random.key(3), (4, full.d)
    )
    k = jax.random.key(4)
    np.testing.assert_allclose(
        np.asarray(full.log_prob_batch(Theta, key=k)),
        np.asarray(chunked.log_prob_batch(Theta, key=k)),
        rtol=1e-5,
    )


def test_chunk_must_divide():
    import pytest

    x_tr, y_tr, _, _ = load_mnist(n_train=32, n_test=8)
    t = NNPosterior(
        MnistMLP(widths=(8,)), x_tr, y_tr, init_key=jax.random.key(5),
        proposal_chunk=3,
    )
    Theta = jnp.zeros((8, t.d))
    with pytest.raises(ValueError):
        t.log_prob_batch(Theta)

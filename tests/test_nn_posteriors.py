"""NN posterior targets: model zoo shapes, vmapped evaluation, sampling
actually improves the loss (the reference's validation is loss/acc traces,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx import PMPConfig, run_chain
from pmpx.data import load_cifar10, load_mnist
from pmpx.models import BayesMLP, LeNet, MnistCNN, MnistLSTM, MnistMLP
from pmpx.samplers import hmc, pmp
from pmpx.samplers.hmc import PMPHMCConfig
from pmpx.targets.nn import NNPosterior


@pytest.fixture(scope="module")
def mnist_small():
    x_tr, y_tr, x_te, y_te = load_mnist(n_train=256, n_test=64)
    return x_tr, y_tr, x_te, y_te


@pytest.mark.parametrize(
    "model",
    [
        MnistMLP(widths=(32, 16)),
        MnistCNN(),
        MnistLSTM(hidden=16),
    ],
    ids=["mlp", "cnn", "lstm"],
)
def test_mnist_models_forward_and_posterior(model, mnist_small):
    x_tr, y_tr, _, _ = mnist_small
    t = NNPosterior(model, x_tr, y_tr, init_key=jax.random.key(0))
    theta = t.init_theta()
    assert theta.shape == (t.d,)
    lp = float(t.log_prob(theta))
    assert np.isfinite(lp)
    # batched eval over 4 proposals == per-proposal eval
    Theta = theta[None, :] + 0.01 * jax.random.normal(
        jax.random.key(1), (4, t.d)
    )
    batch = np.asarray(t.log_prob_batch(Theta))
    single = np.asarray([float(t.log_prob(Theta[i])) for i in range(4)])
    np.testing.assert_allclose(batch, single, rtol=1e-4, atol=1e-4)


def test_lenet_batchnorm_posterior():
    x_tr, y_tr, _, _ = load_cifar10(n_train=64, n_test=16)
    t = NNPosterior(LeNet(), x_tr, y_tr, init_key=jax.random.key(2))
    theta = t.init_theta()
    assert np.isfinite(float(t.log_prob(theta)))
    vals, grads = t.value_and_grad_batch(theta[None, :])
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(grads)).all()


def test_lenet_remat_same_params_and_grads():
    """LeNet(remat=True) rematerializes conv blocks in the backward pass
    (the memory lever for full-batch proposal parallelism) but must be
    the *same function*: identical param tree, forward, and gradients —
    so thetas and warm-start checkpoints interop with the plain model."""
    x_tr, y_tr, _, _ = load_cifar10(n_train=32, n_test=8)
    t_plain = NNPosterior(LeNet(), x_tr, y_tr,
                          init_key=jax.random.key(2))
    t_remat = NNPosterior(LeNet(remat=True), x_tr, y_tr,
                          init_key=jax.random.key(2))
    assert t_plain.d == t_remat.d
    theta = t_plain.init_theta()
    np.testing.assert_array_equal(
        np.asarray(theta), np.asarray(t_remat.init_theta())
    )
    Theta = theta[None, :] + 0.01 * jax.random.normal(
        jax.random.key(1), (2, t_plain.d)
    )
    v1, g1 = t_plain.value_and_grad_batch(Theta)
    v2, g2 = t_remat.value_and_grad_batch(Theta)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_bnn_stochastic_posterior(mnist_small):
    x_tr, y_tr, _, _ = mnist_small
    t = NNPosterior(
        BayesMLP(hidden=16),
        x_tr,
        y_tr,
        init_key=jax.random.key(3),
        stochastic=True,
    )
    assert t.needs_rng
    theta = t.init_theta()
    a = float(t.log_prob(theta, key=jax.random.key(4)))
    b = float(t.log_prob(theta, key=jax.random.key(5)))
    assert np.isfinite(a) and np.isfinite(b)
    assert a != b  # stochastic forward


def test_pmp_improves_mlp_loss(mnist_small):
    """Random-walk PMP from random init must decrease CE loss on the
    (easy, learnable) synthetic classes — the reference's loss-trace check."""
    x_tr, y_tr, _, _ = mnist_small
    # strong tempering = the reference's lambda-style greedy selection
    # (MH_FC.py lambda=10000); step sized so 8 tree nodes explore usefully
    t = NNPosterior(
        MnistMLP(widths=(32,)), x_tr, y_tr, temper=200.0,
        init_key=jax.random.key(6),
    )
    cfg = PMPConfig(
        N=1, depth=3, step_size=0.002, selection="single",
        stabilizer="none",
    )
    superstep = pmp.make_superstep(t, cfg)
    theta0 = t.init_theta()
    loss0 = -float(t.log_prob(theta0)) / t.temper

    _, recs = jax.jit(
        lambda k, th: run_chain(
            superstep, k, th, 150,
            collect=lambda th2, out: out["samples"][0],
        )
    )(jax.random.key(7), theta0)
    thetaF = recs[-1]
    lossF = -float(t.log_prob(thetaF)) / t.temper
    assert lossF < loss0 - 0.5, (loss0, lossF)


def test_pmp_hmc_improves_bnn_loss(mnist_small):
    """PMP-HMC over the stochastic BNN posterior (the reference's flagship
    'Bayesian Network Training' experiment, main.py)."""
    x_tr, y_tr, _, _ = mnist_small
    t = NNPosterior(
        BayesMLP(hidden=16), x_tr, y_tr, temper=1.0,
        init_key=jax.random.key(8), stochastic=True,
    )
    cfg = PMPHMCConfig(
        depth=2, step_size=0.05, mom_scale=0.0005, rule="barker_clamp"
    )
    superstep = hmc.make_superstep(t, cfg)
    theta0 = t.init_theta()
    loss0 = -float(t.log_prob(theta0, key=jax.random.key(9)))
    _, recs = jax.jit(
        lambda k, th: run_chain(
            superstep, k, th, 60,
            collect=lambda th2, out: out["samples"][0],
        )
    )(jax.random.key(10), theta0)
    thetaF = recs[-1]
    lossF = -float(t.log_prob(thetaF, key=jax.random.key(11)))
    assert np.isfinite(lossF)
    assert lossF < loss0 + 0.5  # moves, does not blow up


def test_accuracy_helper(mnist_small):
    x_tr, y_tr, x_te, y_te = mnist_small
    t = NNPosterior(
        MnistMLP(widths=(32,)), x_tr, y_tr, init_key=jax.random.key(12)
    )
    acc = float(t.accuracy(t.init_theta(), x_te, y_te))
    assert 0.0 <= acc <= 1.0

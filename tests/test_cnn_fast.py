"""Oracle tests for the MXU-shaped CNN forward (pmpx.kernels.cnn_fast).

The fast path must compute the SAME densities as the flax/XLA
``NNPosterior`` route up to float reassociation — it feeds acceptance
weights, so equivalence is the whole contract (reference semantics:
``complex_nets/Mnist/CNN/PMP_CNN.py:20-42`` forward + CE loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx.kernels import cnn_fast
from pmpx.models import MnistCNN, MnistLSTM
from pmpx.targets.nn import NNPosterior


def _posterior(B=48, temper=10.0, seed=0, **kw):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    X = jax.random.normal(k1, (B, 28, 28))
    Y = jax.random.randint(k2, (B,), 0, 10)
    post = NNPosterior(
        MnistCNN(), X, Y, temper=temper, init_key=k3, **kw
    )
    return post


def _theta_batch(post, P, seed=1, scale=0.3):
    k = jax.random.key(seed)
    return post._theta0[None, :] + scale * jax.random.normal(
        k, (P, post.d)
    )


def test_matches_flax_f32():
    post = _posterior()
    Theta = _theta_batch(post, 3)
    ref = post.log_prob_batch(Theta)
    fast = cnn_fast.make_fast_log_prob_batch(post)(Theta)
    np.testing.assert_allclose(fast, ref, rtol=2e-5, atol=2e-5)


def test_matches_flax_bf16():
    post = _posterior(compute_dtype=jnp.bfloat16)
    Theta = _theta_batch(post, 3)
    ref = post.log_prob_batch(Theta)
    fast = cnn_fast.make_fast_log_prob_batch(post)(Theta)
    # bf16 activations round differently per evaluation order; the CE
    # reduction is f32 in both paths
    np.testing.assert_allclose(fast, ref, rtol=2e-2, atol=2e-2)


def test_proposal_chunk_equals_full():
    post = _posterior(proposal_chunk=2)
    Theta = _theta_batch(post, 4)
    chunked = cnn_fast.make_fast_log_prob_batch(post)(Theta)
    post.proposal_chunk = None
    full = cnn_fast.make_fast_log_prob_batch(post)(Theta)
    np.testing.assert_allclose(chunked, full, rtol=1e-6, atol=1e-6)


def test_attach_routes_log_prob_and_singles():
    post = _posterior()
    Theta = _theta_batch(post, 2)
    cnn_fast.attach(post)
    batch = post.log_prob_batch(Theta)
    # singles go through the same kernel: one FP evaluation order
    single = post.log_prob(Theta[0])
    np.testing.assert_allclose(single, batch[0], rtol=1e-6, atol=1e-6)


def test_attach_rejects_non_cnn():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    X = jax.random.normal(k1, (8, 28, 28))
    Y = jax.random.randint(k2, (8,), 0, 10)
    post = NNPosterior(MnistLSTM(), X, Y, init_key=k3)
    with pytest.raises(ValueError, match="MnistCNN"):
        cnn_fast.attach(post)


def test_superstep_parity_with_xla_path():
    """A full MTM superstep built over the fast path accepts/selects from
    densities equal to the XLA path's — chain-level equivalence on f32."""
    from pmpx.experiments.mnist import sampler_spec

    post_a = _posterior()
    post_b = _posterior()
    cnn_fast.attach(post_b)
    spec = sampler_spec("mp", 1e-4, 3)
    step_a = jax.jit(spec.build(post_a))
    step_b = jax.jit(spec.build(post_b))
    theta0 = post_a.init_theta()
    key = jax.random.key(42)
    ta, oa = step_a(key, theta0)
    tb, ob = step_b(key, theta0)
    np.testing.assert_allclose(ob["root_logp"], oa["root_logp"],
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(tb, ta, rtol=5e-4, atol=5e-4)

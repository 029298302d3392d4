"""Oracle tests for the fused LSTM posterior kernel.

The kernel (``pmpx/kernels/lstm_fused.py``) must be a drop-in density for
the XLA path: same math as ``flax.linen.OptimizedLSTMCell`` + Dense head +
mean CE, differing only by float reassociation.  Runs in Pallas interpret
mode on the CPU mesh (conftest forces cpu), where f32 matmuls are exact —
so f32 agreement is tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx.kernels import lstm_fused
from pmpx.models import MnistLSTM
from pmpx.targets.nn import NNPosterior


def _make_posterior(B=96, compute_dtype=None, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    X = jax.random.normal(k1, (B, 28, 28), jnp.float32)
    Y = jax.random.randint(k2, (B,), 0, 10)
    return NNPosterior(
        MnistLSTM(), X, Y, temper=10.0, compute_dtype=compute_dtype
    )


def _thetas(post, P, seed=1):
    keys = jax.random.split(jax.random.key(seed), P)
    return jnp.stack([
        post._theta0 + 0.05 * jax.random.normal(k, (post.d,)) for k in keys
    ])


@pytest.mark.parametrize("B,block_b", [(96, 64), (100, 64), (64, 128)])
def test_fast_log_prob_batch_matches_xla(B, block_b):
    post = _make_posterior(B=B)
    Theta = _thetas(post, P=3)
    ref = np.asarray(post.log_prob_batch(Theta))
    lstm_fused.attach(post, block_b=block_b, interpret=True)
    got = np.asarray(post.log_prob_batch(Theta))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_log_prob_single_routes_through_kernel():
    post = _make_posterior(B=64)
    theta = _thetas(post, P=1)[0]
    lstm_fused.attach(post, block_b=64, interpret=True)
    single = float(post.log_prob(theta))
    batch = float(post.log_prob_batch(theta[None])[0])
    assert single == batch  # bit-identical: one evaluation order


def test_kernel_final_hidden_matches_flax_rnn():
    """Direct kernel-vs-flax check of the recurrence itself."""
    import flax.linen as nn

    B, P = 80, 2
    post = _make_posterior(B=B)
    Theta = _thetas(post, P=P, seed=3)
    params = jax.vmap(post._unravel)(Theta)
    cell = params["OptimizedLSTMCell_0"]
    Wx = lstm_fused._gate_stack(cell, "i")
    Wh = lstm_fused._gate_stack(cell, "h")
    b = jnp.concatenate(
        [cell[f"h{g}"]["bias"] for g in lstm_fused._GATES], axis=-1
    )
    x_tm = post.X.transpose(1, 0, 2)
    got = lstm_fused.lstm_final_hidden(
        x_tm, Wx, Wh, b, block_b=80, interpret=True
    )
    rnn = nn.RNN(nn.OptimizedLSTMCell(64))
    for p in range(P):
        tree = jax.tree.map(lambda a, i=p: a[i], cell)
        ref = rnn.apply({"params": {"cell": tree}}, post.X)[:, -1, :]
        np.testing.assert_allclose(
            np.asarray(got[p]), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_bf16_compute_dtype_close():
    post = _make_posterior(B=64, compute_dtype=jnp.bfloat16)
    Theta = _thetas(post, P=2)
    ref = np.asarray(post.log_prob_batch(Theta))
    lstm_fused.attach(post, block_b=64, interpret=True)
    got = np.asarray(post.log_prob_batch(Theta))
    # bf16 paths differ by rounding points; densities are O(10)
    np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.05)


def test_attach_rejects_non_lstm_posteriors():
    from pmpx.models import MnistMLP

    k = jax.random.key(0)
    post = NNPosterior(
        MnistMLP(), jax.random.normal(k, (8, 784)),
        jnp.zeros((8,), jnp.int32),
    )
    with pytest.raises(ValueError):
        lstm_fused.attach(post)


def test_mtm_chain_statistically_equivalent():
    """A short MP chain through the kernel vs the XLA path: identical
    sampler semantics (not bitwise — float reassociation changes
    trajectories), so acceptance statistics must agree loosely."""
    from pmpx.samplers import mp as mp_mod

    def run(use_kernel):
        post = _make_posterior(B=64, seed=7)
        if use_kernel:
            lstm_fused.attach(post, block_b=64, interpret=True)
        from pmpx import run_chain
        cfg = mp_mod.MPConfig(N=3, step_size=0.02)
        sup = mp_mod.make_superstep(post, cfg)
        state, recs = jax.jit(
            lambda k, t: run_chain(sup, k, t, 50)
        )(jax.random.key(2), post._theta0)
        final = state[0] if isinstance(state, tuple) else state
        return post, np.asarray(recs["samples"])

    post_k, s_k = run(True)
    post_x, s_x = run(False)
    assert np.isfinite(s_k).all() and np.isfinite(s_x).all()
    # same start, same target, same sampler: the chains move (not stuck)
    # and end at comparable density levels under ONE common evaluator
    lp_k = float(post_x.log_prob(jnp.asarray(s_k.reshape(-1, post_x.d)[-1])))
    lp_x = float(post_x.log_prob(jnp.asarray(s_x.reshape(-1, post_x.d)[-1])))
    assert abs(lp_k - lp_x) < 0.5 * abs(lp_x) + 5.0

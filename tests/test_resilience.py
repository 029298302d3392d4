"""Crash/kill resilience + data-as-argument threading.

End-to-end: a subprocess running a checkpointed chain is SIGKILLed
mid-chunk, resumed, and the assembled native-TraceWriter trace must be
bitwise identical to an uninterrupted run (VERDICT round-1 item 8 — the
unit-level exact-resume tests in test_samplers_statistical cover the
math; this covers the crash story through real processes and files).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.experiments import resilience
from pmpx.targets.nn import NNPosterior
from pmpx.models import MnistMLP


def test_sigkill_resume_bitwise_identical(tmp_path):
    s = resilience.run(
        num_steps=900,
        checkpoint_every=150,
        kills=1,
        n_data=4096,
        depth=4,
        throttle_ms=500,
        out_dir=str(tmp_path),
    )
    assert s["bitwise_identical"]
    assert s["rows"] == 900
    # at least one genuine mid-run interruption must have happened
    assert s["kills"] >= 1
    assert s["launches"] >= 2


def test_bound_data_equals_closure_data():
    """Tracing under bound_data(X2) computes the same density as a target
    constructed with X2 — and X really is a program argument."""
    k1, k2 = jax.random.split(jax.random.key(0))
    X1 = jax.random.normal(k1, (32, 28, 28))
    X2 = jax.random.normal(k2, (32, 28, 28))
    y = jnp.arange(32) % 10
    t1 = NNPosterior(MnistMLP(), X1, y, init_key=jax.random.key(1))
    t2 = NNPosterior(MnistMLP(), X2, y, init_key=jax.random.key(1))
    theta = t1.init_theta()[None, :]

    @jax.jit
    def f(X, Theta):
        with t1.bound_data(X):
            return t1.log_prob_batch(Theta)

    np.testing.assert_allclose(
        f(X2, theta), jax.jit(t2.log_prob_batch)(theta), rtol=1e-6
    )
    # rebinding is trace-scoped: t1 still evaluates on X1 afterwards
    np.testing.assert_allclose(
        f(X1, theta), jax.jit(t1.log_prob_batch)(theta), rtol=1e-6
    )

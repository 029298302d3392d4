"""RNG hygiene of the HMC family for stochastic (needs_rng) targets.

VERDICT r1 weak #4: ``k_t`` was consumed by the H0 evaluation and then
re-split for the leapfrog keys, correlating density evaluations across
levels for sampling-forward targets like BayesMLP.  These tests intercept
every ``vg(Theta, key)`` call inside one superstep (run eagerly, so keys
are concrete) and assert all consumed keys are pairwise distinct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx.samplers import hmc


class _StochasticQuadratic:
    """Tiny needs_rng target: density is deterministic but the key is
    threaded exactly like BayesMLP's sampling forward."""

    d = 2
    needs_rng = True

    def log_prob(self, theta, key=None):
        jitter = 0.0 * jax.lax.stop_gradient(jax.random.uniform(key))
        return -0.5 * jnp.sum(theta * theta) + jitter


def _record_keys(monkeypatch):
    seen = []
    orig = hmc._value_and_grad_batch

    def factory(target):
        real = orig(target)

        def vg(Theta, key):
            # debug.callback survives scan tracing (MP-HMC's trajectory)
            jax.debug.callback(
                lambda kd: seen.append(np.asarray(kd).tobytes()),
                jax.random.key_data(key),
                ordered=True,
            )
            return real(Theta, key)

        return vg

    monkeypatch.setattr(hmc, "_value_and_grad_batch", factory)
    return seen


@pytest.mark.parametrize(
    "cfg",
    [
        hmc.HMCConfig(step_size=0.1, num_leapfrog=3),
        hmc.MPHMCConfig(N=4, step_size=0.1),
        hmc.PMPHMCConfig(depth=3, step_size=0.1),
    ],
    ids=["sp", "mp", "pmp"],
)
def test_distinct_keys_per_density_eval(monkeypatch, cfg):
    seen = _record_keys(monkeypatch)
    superstep = hmc.make_superstep(_StochasticQuadratic(), cfg)
    superstep(jax.random.key(7), jnp.array([0.3, -0.4], jnp.float32))
    # H0 eval + every leapfrog half-pair must each get a fresh key
    assert len(seen) >= 3
    assert len(set(seen)) == len(seen), (
        f"{len(seen) - len(set(seen))} duplicated keys of {len(seen)}"
    )


def test_leapfrog_requires_key():
    target = _StochasticQuadratic()
    vg = hmc._value_and_grad_batch(target)
    with pytest.raises(TypeError):
        hmc._leapfrog(vg, jnp.zeros((1, 2)), jnp.zeros((1, 2)), 0.1)
